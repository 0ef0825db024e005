"""Reference-artifact interop: load mit-acl/roman `ROMANMap` pickles
without the reference package installed.

Reference maps are pickled `roman.map.map.ROMANMap` dataclasses holding
`roman.object.segment.Segment` / `SegmentMinimalData` objects
(reference map.py:18-59, segment.py:19-59) plus robotdatapy helpers.
`_RefUnpickler` resolves those class paths to empty stub classes (pickle
restores attribute dicts without running constructors), and the converters
below map the attribute layout onto `RomanMap`/`SegmentData`.

Full `Segment` objects carry raw world-frame points with geometry
memoized lazily by open3d; their shape attributes are recomputed here with
roman_tpu.ops (OBB volume/extent, Weinmann covariance attributes —
reference segment.py:244-274, :433-472). `SegmentMinimalData` carries the
precomputed values and converts field-for-field.
"""

from __future__ import annotations

import pickle
from typing import Optional

import numpy as np

from roman_tpu.map.roman_map import RomanMap, SegmentData

_REFERENCE_ROOTS = ("roman", "robotdatapy", "fastsam", "clipperpy", "open3d")
_STUBS = {}


def _stub_class(module: str, name: str):
    key = (module, name)
    if key not in _STUBS:
        _STUBS[key] = type(name, (), {"__module__": module})
    return _STUBS[key]


class _RefUnpickler(pickle.Unpickler):
    """Resolves reference-package class paths to attribute-only stubs."""

    def find_class(self, module, name):
        if module.split(".")[0] in _REFERENCE_ROOTS:
            return _stub_class(module, name)
        return super().find_class(module, name)


def load_reference_map(path: str) -> RomanMap:
    """Load a reference ROMANMap pickle and convert it to RomanMap."""
    with open(path, "rb") as f:
        obj = _RefUnpickler(f).load()
    return convert_reference_map(obj)


def is_reference_map(obj) -> bool:
    return type(obj).__module__.startswith("roman") and type(
        obj).__name__ == "ROMANMap"


def convert_reference_map(obj) -> RomanMap:
    """Map reference ROMANMap attributes (map.py:18-41) to RomanMap."""
    d = obj.__dict__
    segments = []
    for s in d.get("segments", []):
        conv = convert_reference_segment(s)
        if conv is not None:
            segments.append(conv)
    trajectory = np.stack([np.asarray(T) for T in d.get("trajectory", [])]) \
        if len(d.get("trajectory", [])) else np.zeros((0, 4, 4))
    times = np.asarray(d.get("times", np.zeros(0)))
    descriptors = d.get("descriptors")
    if descriptors is not None and len(descriptors):
        descriptors = np.stack([np.asarray(x) for x in descriptors])
    else:
        descriptors = None
    return RomanMap(
        segments=segments,
        trajectory=trajectory,
        times=times,
        descriptors=descriptors,
        poses_are_flu=bool(d.get("poses_are_flu", True)),
    )


def convert_reference_segment(s) -> Optional[SegmentData]:
    """Convert a reference Segment or SegmentMinimalData stub."""
    d = s.__dict__
    if "points" in d:  # full Segment (segment.py:61-175)
        pts = d.get("points")
        if pts is None or len(np.atleast_2d(pts)) < 3:
            return None
        pts = np.asarray(pts, np.float64).reshape(-1, 3)
        center = (
            _bottom_middle(pts)
            if d.get("_center_ref") == "bottom_middle" else pts.mean(axis=0)
        )
        vol, extent, attrs = _geometry_from_points(pts)
        desc = d.get("semantic_descriptor")
        return SegmentData(
            id=int(d.get("id", 0)),
            center=center,
            volume=float(vol),
            linearity=float(attrs[0]),
            planarity=float(attrs[1]),
            scattering=float(attrs[2]),
            extent=extent,
            semantic_descriptor=(np.asarray(desc).reshape(-1)
                                 if desc is not None else None),
            first_seen=float(d.get("first_seen", 0.0)),
            last_seen=float(d.get("last_seen", 0.0)),
        )
    # SegmentMinimalData (segment.py:19-59; Object base sets centroid
    # (3, 1), _volume, _descriptor — object.py:6-16)
    centroid = np.asarray(d.get("centroid")).reshape(-1)[:3]
    desc = d.get("semantic_descriptor", d.get("_descriptor"))
    return SegmentData(
        id=int(d.get("id", 0)),
        center=centroid,
        volume=float(d.get("_volume") or 0.0),
        linearity=float(d.get("_linearity") or 0.0),
        planarity=float(d.get("_planarity") or 0.0),
        scattering=float(d.get("_scattering") or 0.0),
        extent=(np.asarray(d["extent"]).reshape(-1)
                if d.get("extent") is not None else None),
        semantic_descriptor=(np.asarray(desc).reshape(-1)
                             if desc is not None else None),
        first_seen=float(d.get("first_seen", 0.0)),
        last_seen=float(d.get("last_seen", 0.0)),
    )


def _bottom_middle(pts: np.ndarray) -> np.ndarray:
    """Reference center_ref='bottom_middle' (segment.py:266-274): median
    x/y, min z."""
    return np.array([np.median(pts[:, 0]), np.median(pts[:, 1]),
                     np.min(pts[:, 2])])


def _geometry_from_points(pts: np.ndarray, min_points: int = 5):
    """Host numpy twin of ops.geometry obb_volume_extent +
    shape_attributes for one point set — this converter runs per
    segment on the host, and a per-segment jax call would pay ~3
    tunnel transfers (~1 s each) per segment on large reference maps."""
    pts = np.asarray(pts, np.float64)
    mu = pts.mean(axis=0)
    c = pts - mu
    cov = c.T @ c / len(pts)
    evals, vecs = np.linalg.eigh(cov)  # ascending
    e = np.clip(evals[::-1], 0.0, None)
    e = e / max(e.sum(), 1e-12)
    e1 = max(e[0], 1e-12)
    attrs = np.array([(e[0] - e[1]) / e1, (e[1] - e[2]) / e1, e[2] / e1])
    if len(pts) >= min_points:
        proj = c @ vecs[:, ::-1]  # principal-axis frame (descending)
        extent = proj.max(axis=0) - proj.min(axis=0)
    else:
        extent = np.zeros(3)
    return float(np.prod(extent)), extent, attrs
