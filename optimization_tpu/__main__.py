"""``python -m optimization_tpu`` — see :mod:`optimization_tpu.cli`."""

import sys

from .cli import main

sys.exit(main())
