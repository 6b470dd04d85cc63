from . import pose_sync, rotation_sync
