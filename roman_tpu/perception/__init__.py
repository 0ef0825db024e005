from roman_tpu.perception import vit, dinov2, clip, fastsam, wrapper  # noqa: F401
