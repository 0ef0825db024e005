"""Alias for reference roman/offline_rpgo/extract_odom_g2o.py."""
from roman_tpu.rpgo.extract_odom import *  # noqa: F401,F403
