"""Alias for reference roman/object/segment.py."""
from roman_tpu.map.roman_map import SegmentData
from roman_tpu.map.roman_map import SegmentData as SegmentMinimalData
from roman_tpu.map.segment import Segment  # noqa: F401
