"""Alias for reference roman/object/polytope.py."""
from roman_tpu.map.objects import Polytope  # noqa: F401
