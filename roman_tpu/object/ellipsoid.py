"""Alias for reference roman/object/ellipsoid.py."""
from roman_tpu.map.objects import Ellipsoid  # noqa: F401
