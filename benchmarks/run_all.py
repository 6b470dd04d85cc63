"""Run every benchmark config; one JSON line each (BASELINE.md configs 1-5).

Usage:  python benchmarks/run_all.py [--quick]

--quick runs the sub-minute configs only (1, 2, 3, 11) — the smoke tier
for checking a chip/runtime before committing to the full ~15-minute
sweep (configs 6 and 8 each solve a large pose problem).
"""

import runpy
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))

CONFIGS = [
    "config1_gd_rosenbrock",
    "config2_tnt_rayleigh",
    "config3_lobpcg",
    "config4_lasso",
    "config5_rotation_sync",
    "config6_pose_graph_10k",
    "config7_bf16_tier",
    "config8_robust_se",
    "config9_matrix_completion",
    "config10_lobpcg_fleet",
    "config11_hv_roofline",
    "config12_escalation",
    "config13_streamed_prec",
]

QUICK = ["config1_gd_rosenbrock", "config2_tnt_rayleigh",
         "config3_lobpcg", "config11_hv_roofline"]


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    names = QUICK if "--quick" in argv else CONFIGS
    for name in names:
        print(f"# {name}", file=sys.stderr, flush=True)
        try:
            runpy.run_module(name, run_name="__main__")
        except Exception as e:  # keep going; a failed config prints an error line
            print(f"# {name} FAILED: {e}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
