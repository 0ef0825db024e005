from roman_tpu.ops import se3, arun, geometry, voxel, pointcloud, hungarian, metrics  # noqa: F401
