"""Reference-pickle interop: load_roman_map must accept pickles produced
by the reference package (roman.map.map.ROMANMap holding Segment /
SegmentMinimalData), via the stub unpickler in roman_tpu.interop."""

import pickle
import sys
import types

import numpy as np

from roman_tpu.map.roman_map import load_roman_map


def _fake_reference_modules():
    """Install modules that mimic the reference package layout so pickles
    carry the reference's module paths."""
    mods = {}
    for name in ("roman", "roman.map", "roman.map.map", "roman.object",
                 "roman.object.segment", "roman.object.object"):
        mods[name] = sys.modules.setdefault(name, types.ModuleType(name))

    class ROMANMap:
        def __init__(self, segments, trajectory, times, descriptors=None,
                     poses_are_flu=True):
            self.segments = segments
            self.trajectory = trajectory
            self.times = times
            self.descriptors = descriptors
            self.poses_are_flu = poses_are_flu

    class SegmentMinimalData:
        def __init__(self, id, center, volume, linearity, planarity,
                     scattering, extent, semantic_descriptor, first_seen,
                     last_seen):
            self.id = id
            self.centroid = np.asarray(center).reshape(3, 1)
            self.dim = 3
            self._volume = volume
            self._descriptor = None
            self._linearity = linearity
            self._planarity = planarity
            self._scattering = scattering
            self.extent = extent
            self.semantic_descriptor = semantic_descriptor
            self.first_seen = first_seen
            self.last_seen = last_seen

    class Segment:
        def __init__(self, id, points, desc, t0, t1):
            self.id = id
            self.points = points
            self.semantic_descriptor = desc
            self.first_seen = t0
            self.last_seen = t1
            self.num_sightings = 3
            self._center_ref = "mean"
            self.voxel_grid = dict()
            self.camera_params = None

    ROMANMap.__module__ = "roman.map.map"
    ROMANMap.__qualname__ = "ROMANMap"
    SegmentMinimalData.__module__ = "roman.object.segment"
    SegmentMinimalData.__qualname__ = "SegmentMinimalData"
    Segment.__module__ = "roman.object.segment"
    Segment.__qualname__ = "Segment"
    mods["roman.map.map"].ROMANMap = ROMANMap
    mods["roman.object.segment"].SegmentMinimalData = SegmentMinimalData
    mods["roman.object.segment"].Segment = Segment
    return ROMANMap, SegmentMinimalData, Segment


def test_load_reference_minimal_data_pickle(tmp_path, rng):
    ROMANMap, SegmentMinimalData, _ = _fake_reference_modules()
    segs = [
        SegmentMinimalData(
            id=i, center=np.array([i, 0.0, 1.0]), volume=2.0 + i,
            linearity=0.1, planarity=0.5, scattering=0.4,
            extent=np.array([1.0, 2.0, 3.0]),
            semantic_descriptor=np.ones(16) / 4.0,
            first_seen=0.0, last_seen=5.0,
        )
        for i in range(3)
    ]
    traj = [np.eye(4) for _ in range(4)]
    m = ROMANMap(segments=segs, trajectory=traj,
                 times=np.arange(4.0), descriptors=[np.ones(8)] * 4)
    p = tmp_path / "ref_map.pkl"
    with open(p, "wb") as f:
        pickle.dump(m, f)

    loaded = load_roman_map(str(p))
    assert len(loaded.segments) == 3
    s0 = loaded.segments[0]
    np.testing.assert_allclose(s0.center, [0.0, 0.0, 1.0])
    assert s0.volume == 2.0
    assert s0.planarity == 0.5
    np.testing.assert_allclose(s0.extent, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(s0.semantic_descriptor, np.ones(16) / 4.0)
    assert loaded.trajectory.shape == (4, 4, 4)
    assert loaded.descriptors.shape == (4, 8)


def test_load_reference_full_segment_pickle(tmp_path, rng):
    ROMANMap, _, Segment = _fake_reference_modules()
    pts = rng.normal(size=(50, 3)) * np.array([2.0, 1.0, 0.5]) + np.array(
        [5.0, 0.0, 1.0])
    segs = [Segment(id=7, points=pts, desc=np.ones(8), t0=1.0, t1=9.0)]
    m = ROMANMap(segments=segs, trajectory=[np.eye(4)], times=np.zeros(1))
    p = tmp_path / "ref_map_full.pkl"
    with open(p, "wb") as f:
        pickle.dump(m, f)

    loaded = load_roman_map(str(p))
    assert len(loaded.segments) == 1
    s = loaded.segments[0]
    assert s.id == 7
    np.testing.assert_allclose(s.center, pts.mean(axis=0), atol=1e-5)
    assert s.volume > 0
    assert 0 <= s.linearity <= 1 and 0 <= s.planarity <= 1
    assert s.extent is not None and (np.asarray(s.extent) > 0).all()
    assert s.first_seen == 1.0 and s.last_seen == 9.0
