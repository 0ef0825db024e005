from roman_tpu.align import invariants, clipper, registration  # noqa: F401
