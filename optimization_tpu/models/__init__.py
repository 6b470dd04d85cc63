from . import rotation_sync
