from roman_tpu.map.roman_map import (  # noqa: F401
    SegmentData,
    RomanMap,
    Submap,
    SubmapParams,
    submaps_from_roman_map,
    load_roman_map,
)
