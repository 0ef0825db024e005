"""Alias for reference roman/object/mesh_object.py."""
from roman_tpu.map.objects import MeshObject  # noqa: F401
