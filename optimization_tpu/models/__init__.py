from . import matrix_completion, pose_sync, rotation_sync
