from roman_tpu.params.submap_align_params import (  # noqa: F401
    SubmapAlignParams,
    SubmapAlignInputOutput,
)
from roman_tpu.params.mapper_params import MapperParams, SegmentParams  # noqa: F401
from roman_tpu.params.offline_rpgo_params import OfflineRPGOParams  # noqa: F401
from roman_tpu.params.fastsam_params import FastSAMParams  # noqa: F401
from roman_tpu.params.data_params import DataParams  # noqa: F401
