from roman_tpu.data.pose_data import PoseData  # noqa: F401
from roman_tpu.data.camera import CameraParams  # noqa: F401
