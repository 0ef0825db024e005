"""Alias for reference roman/object/pointcloud_object.py."""
from roman_tpu.map.objects import PointCloudObject  # noqa: F401
