from . import matrix_completion, pose_sync, range_sync, rotation_sync
