from roman_tpu.rpgo import g2o_io, extract_odom, fusion, solver, evaluate  # noqa: F401
