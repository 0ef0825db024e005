import numpy as np

from roman_tpu.data.camera import CameraParams
from roman_tpu.map.mapper import Mapper
from roman_tpu.map.observation import Observation
from roman_tpu.map.segment import Segment
from roman_tpu.params.mapper_params import MapperParams
from roman_tpu.sim.world import yaw_T


def make_obs(rng, center_w, pose, n=80, desc=None, scale=0.3):
    """Observation of a blob at world position center_w, from camera pose."""
    pts_w = center_w + rng.normal(size=(n, 3)) * scale
    Tinv = np.linalg.inv(pose)
    pts_c = pts_w @ Tinv[:3, :3].T + Tinv[:3, 3]
    return Observation(time=0.0, pose=pose, point_cloud=pts_c,
                       semantic_descriptor=desc)


def test_segment_accumulation_and_attrs(rng):
    pose = np.eye(4)
    c = np.array([2.0, 0.0, 1.0])
    obs1 = make_obs(rng, c, pose)
    seg = Segment(obs1, CameraParams.simple(), id=0)
    n1 = seg.num_points
    assert n1 > 0
    obs2 = make_obs(rng, c, pose)
    obs2.time = 0.1
    seg.update(obs2)
    assert seg.num_sightings == 2
    assert seg.last_seen == 0.1
    assert np.linalg.norm(seg.center - c) < 0.3
    assert seg.volume > 0
    assert 0 <= seg.scattering <= 1

    md = seg.minimal_data()
    assert md.first_seen == 0.0 and md.last_seen == 0.1


def test_mapper_lifecycle(rng):
    params = MapperParams(min_2d_iou=None, min_sightings=2,
                          max_t_no_sightings=0.5,
                          geometric_score_range=(0.15, 1.0),
                          min_max_extent=0.05)
    mapper = Mapper(params, CameraParams.simple())
    centers = np.array([[3.0, 1.0, 1.0], [3.0, -2.0, 0.5], [6.0, 0.0, 1.5]])
    descs = np.eye(3)
    t = 0.0
    for step in range(6):
        pose = yaw_T(0.0, np.array([0.1 * step, 0.0, 0.0]))
        obs = [make_obs(rng, c, pose, desc=d) for c, d in zip(centers, descs)]
        for o in obs:
            o.time = t
        mapper.update(t, pose, obs)
        t += 0.1
    # all three upgraded out of nursery and tracked as the same segments
    assert len(mapper.segments) == 3, (len(mapper.segments), len(mapper.segment_nursery))
    for seg in mapper.segments:
        assert seg.num_sightings >= 5

    # stop seeing them -> they retire to inactive
    for step in range(8):
        pose = yaw_T(0.0, np.array([100.0, 0.0, 0.0]))
        far_obs = [make_obs(rng, np.array([103.0, 0.0, 1.0]), pose)]
        for o in far_obs:
            o.time = t
        mapper.update(t, pose, far_obs)
        t += 0.2
    assert len(mapper.segments) <= 1
    assert len(mapper.inactive_segments) + len(mapper.segment_graveyard) >= 3

    rmap = mapper.get_roman_map()
    assert len(rmap.segments) >= 3
    assert len(rmap.times) == len(rmap.trajectory)
    # recovered centers close to ground truth
    got = np.stack([np.asarray(s.center).reshape(3) for s in rmap.segments])
    for c in centers:
        assert np.min(np.linalg.norm(got - c, axis=1)) < 0.5


def test_mapper_merges_duplicates(rng):
    params = MapperParams(min_2d_iou=None, min_sightings=2,
                          geometric_score_range=(0.2, 1.0), min_max_extent=0.05)
    mapper = Mapper(params, CameraParams.simple())
    pose = np.eye(4)
    c = np.array([4.0, 0.0, 1.0])
    # two segments created from nearly identical observations at same time
    o1 = make_obs(rng, c, pose)
    o2 = make_obs(rng, c + 0.05, pose)
    o1.time = o2.time = 0.0
    s1 = Segment(o1, CameraParams.simple(), 0)
    s2 = Segment(o2, CameraParams.simple(), 1)
    mapper.segments = [s1, s2]
    mapper.last_pose = pose
    mapper.merge()
    assert len(mapper.segments) == 1
    assert mapper.segments[0].id == 0


def test_plane_pruning(rng):
    params = MapperParams(plane_prune_params=(2.0, 2.0, 0.3))
    mapper = Mapper(params, CameraParams.simple())
    pose = np.eye(4)
    # large thin plane
    pts_w = rng.uniform(size=(300, 3)) * [5.0, 5.0, 0.02] + [2, -2, 0]
    obs = Observation(time=0.0, pose=pose, point_cloud=pts_w)
    seg = Segment(obs, CameraParams.simple(), 0)
    out = mapper.remove_bad_segments([seg], plane_prune_params=params.plane_prune_params)
    assert out == []


def test_t_camera_flu_affects_trajectory_not_observations():
    """Reference semantics (run.py:94-95): T_camera_flu converts only the
    EXPORTED trajectory to the FLU body frame; observation lifting keeps
    camera-frame poses (a composed pose would put depth points on the
    wrong axes)."""
    from roman_tpu.data.camera import CameraParams
    from roman_tpu.map.mapper import Mapper
    from roman_tpu.map.observation import Observation
    from roman_tpu.ops import se3_np
    from roman_tpu.params.mapper_params import MapperParams

    T_rdf_flu = np.array([[0.0, 0, 1, 0], [-1, 0, 0, 0],
                          [0, -1, 0, 0], [0, 0, 0, 1]])
    cam_pose = se3_np.make_T(np.eye(3), np.array([1.0, 2.0, 3.0]))
    pts_cam = np.tile(np.array([0.0, 0.0, 5.0]), (30, 1)) \
        + np.random.default_rng(0).normal(0, 0.05, (30, 3))

    m = Mapper(MapperParams(min_sightings=1, max_t_no_sightings=10.0,
                            min_max_extent=0.01), CameraParams.simple(64, 48))
    m.set_T_camera_flu(T_rdf_flu)
    for t in (0.0, 0.5):
        obs = Observation(time=t, pose=cam_pose, mask=None,
                          mask_downsampled=None, point_cloud=pts_cam.copy(),
                          semantic_descriptor=None)
        m.update(t, cam_pose, [obs], None)
    rm = m.get_roman_map()
    # trajectory is FLU-composed
    np.testing.assert_allclose(rm.trajectory[0], cam_pose @ T_rdf_flu,
                               atol=1e-12)
    # segment center is the camera-frame lift: pose @ [0,0,5]
    assert len(rm.segments) >= 1
    expect = cam_pose[:3, :3] @ np.array([0, 0, 5.0]) + cam_pose[:3, 3]
    np.testing.assert_allclose(rm.segments[0].center, expect, atol=0.1)
