"""Alias module mirroring reference roman/align/submap.py (which re-homes
the Submap type under roman.align). The TPU build keeps submap machinery
in roman_tpu.map.roman_map; this module re-exports the same names."""

from roman_tpu.map.roman_map import (Submap, SubmapParams,  # noqa: F401
                                     submaps_from_roman_map,
                                     submaps_to_features)
