"""Alias package mirroring the reference's ``roman.offline_rpgo``
layout (reference roman/offline_rpgo/*). Implementations live in
roman_tpu.rpgo (in-process PCM+GNC+GN solver replacing the RpgoReadG2o
subprocess, plus the same g2o toolchain)."""

from roman_tpu.rpgo.combine_loop_closures import (LoopClosure,  # noqa: F401
                                                  combine_loop_closures)
from roman_tpu.rpgo.evaluate import evaluate  # noqa: F401
from roman_tpu.rpgo.extract_odom import (extract_odom_g2o,  # noqa: F401
                                         roman_map_pkl_to_g2o)
from roman_tpu.rpgo.fusion import create_config, g2o_file_fusion  # noqa: F401
from roman_tpu.rpgo.g2o_io import (edit_g2o_edge_information,  # noqa: F401
                                   g2o_and_time_to_pose_data)
from roman_tpu.rpgo.plot_g2o import plot_g2o  # noqa: F401
