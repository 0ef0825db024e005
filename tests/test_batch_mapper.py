import numpy as np

from roman_tpu.data.camera import CameraParams
from roman_tpu.map.batch_mapper import BatchMapper
from roman_tpu.map.observation import Observation
from roman_tpu.params.mapper_params import MapperParams
from roman_tpu.sim.world import yaw_T


def make_obs(rng, center_w, pose, t, desc=None, n=100, scale=0.2):
    pts_w = center_w + rng.normal(size=(n, 3)) * scale
    Ti = np.linalg.inv(pose)
    return Observation(time=t, pose=pose,
                       point_cloud=pts_w @ Ti[:3, :3].T + Ti[:3, 3],
                       semantic_descriptor=desc)


def test_batch_mapper_tracks_and_exports(rng):
    params = MapperParams(min_sightings=2, max_t_no_sightings=0.5,
                          geometric_score_range=(0.1, 1.0),
                          geometric_association_method="iom",
                          iou_voxel_size=0.25, segment_voxel_size=0.12,
                          max_segments=32, max_points_per_segment=256)
    m = BatchMapper(params, CameraParams.simple(), desc_dim=8)
    centers = np.array([[3.0, 1.0, 1.0], [3.0, -2.0, 0.5], [6.0, 0.0, 1.5]])
    descs = np.eye(8)[:3]
    t = 0.0
    for step in range(8):
        pose = yaw_T(0.0, np.array([0.1 * step, 0.0, 0.0]))
        obs = [make_obs(rng, c, pose, t, d) for c, d in zip(centers, descs)]
        m.update(t, pose, obs, frame_descriptor=np.ones(4))
        t += 0.1
    rmap = m.get_roman_map()
    # object count preserved — duplicates merged, tracks continued
    assert len(rmap.segments) == 3, [s.id for s in rmap.segments]
    got = np.stack([np.asarray(s.center).reshape(3) for s in rmap.segments])
    for c in centers:
        assert np.min(np.linalg.norm(got - c, axis=1)) < 0.4
    for s in rmap.segments:
        assert s.volume > 0
        assert s.last_seen > s.first_seen
        np.testing.assert_allclose(np.linalg.norm(s.semantic_descriptor), 1.0,
                                   atol=1e-3)
    assert len(rmap.times) == 8


def test_batch_mapper_capacity_and_new_objects(rng):
    params = MapperParams(min_sightings=1, max_t_no_sightings=5.0,
                          geometric_score_range=(0.15, 1.0),
                          max_segments=16, max_points_per_segment=64)
    m = BatchMapper(params, CameraParams.simple(), desc_dim=4, obs_capacity=8)
    pose = np.eye(4)
    # two frames with disjoint object sets -> all become segments
    for f in range(2):
        obs = [make_obs(rng, np.array([2.0 + 3 * k, 4.0 * f, 1.0]), pose, f * 0.1)
               for k in range(4)]
        m.update(f * 0.1, pose, obs)
    rmap = m.get_roman_map()
    assert len(rmap.segments) == 8
    ids = [s.id for s in rmap.segments]
    assert len(set(ids)) == 8  # unique ids allocated
