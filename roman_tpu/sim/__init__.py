from roman_tpu.sim import world  # noqa: F401
