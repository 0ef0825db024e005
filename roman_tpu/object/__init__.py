"""Alias package mirroring the reference's ``roman.object`` layout
(reference roman/object/*): migrating code can replace ``roman`` with
``roman_tpu`` and keep its imports. Implementations live in
roman_tpu.map / roman_tpu.ops."""

from roman_tpu.map.objects import (Ellipsoid, MeshObject, ObjectBase,
                                   PointCloudObject, Polytope)
from roman_tpu.map.objects import ObjectBase as Object
from roman_tpu.map.roman_map import SegmentData
from roman_tpu.map.roman_map import SegmentData as SegmentMinimalData
from roman_tpu.map.segment import Segment

__all__ = ["Object", "ObjectBase", "Segment", "SegmentMinimalData",
           "Ellipsoid", "Polytope", "MeshObject", "PointCloudObject"]
