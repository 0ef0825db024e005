"""Visualization layer: offscreen 3D map frames, video writing, and
association geometry construction (reference viz.py:86-276,
align_viz.py)."""

import numpy as np

from roman_tpu.align.align_viz import (
    create_association_geometries,
    render_association_geometries,
    submap_viz,
)
from roman_tpu.map.roman_map import RomanMap, SegmentData, Submap
from roman_tpu.viz import compose_frames, render_map_frame, render_map_video, write_video


def _segments(rng, n=6):
    return [
        SegmentData(
            id=i, center=rng.uniform(-10, 10, 3), volume=1.0,
            linearity=0.2, planarity=0.4, scattering=0.4,
            extent=np.array([1.0, 1.0, 2.0]), semantic_descriptor=None,
            first_seen=float(i), last_seen=float(i + 5),
        )
        for i in range(n)
    ]


def _map(rng, n_seg=6, T=10):
    traj = np.broadcast_to(np.eye(4), (T, 4, 4)).copy()
    traj[:, 0, 3] = np.linspace(0, 9, T)
    return RomanMap(segments=_segments(rng, n_seg), trajectory=traj,
                    times=np.arange(T, dtype=float))


def test_render_map_frame(rng):
    m = _map(rng)
    img = render_map_frame(m.segments, m.trajectory[:5], m.trajectory[4],
                           t=4.0)
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    assert img.std() > 0  # something was drawn


def test_compose_and_write_video(tmp_path, rng):
    m = _map(rng)
    cam = (rng.uniform(0, 1, (60, 80, 3)) * 255).astype(np.uint8)
    f1 = render_map_frame(m.segments, m.trajectory[:3], m.trajectory[2], t=2.0)
    comp = compose_frames(cam, f1)
    assert comp.shape[0] == f1.shape[0]
    assert comp.shape[1] > f1.shape[1]
    out = render_map_video(m, str(tmp_path / "map.mp4"), stride=3)
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_association_geometries(rng):
    sm1 = Submap(id=0, time=0.0, segments=_segments(rng, 5),
                 pose_flu=np.eye(4))
    sm2 = Submap(id=1, time=0.0, segments=_segments(rng, 4),
                 pose_flu=np.eye(4))
    assoc = np.array([[0, 1], [2, 3]])
    T = np.eye(4)
    T[:3, 3] = [1.0, 2.0, 0.0]
    g = create_association_geometries(sm1, sm2, assoc, T_align=T)
    assert g["centers1"].shape == (5, 3)
    assert g["centers2"].shape == (4, 3)
    assert g["lines"].shape == (2, 2, 3)
    # T applied to submap2 centers
    c2_raw = np.stack([np.asarray(s.center) for s in sm2.segments])
    np.testing.assert_allclose(g["centers2"], c2_raw + [1.0, 2.0, 0.0],
                               atol=1e-6)
    ax = render_association_geometries(g, title="t")
    assert ax is not None


def test_submap_viz(tmp_path, rng):
    sms = [Submap(id=k, time=0.0, segments=_segments(rng, 3),
                  pose_flu=np.eye(4)) for k in range(3)]
    out = submap_viz(sms, str(tmp_path / "submaps.png"))
    import os

    assert os.path.getsize(out) > 0
