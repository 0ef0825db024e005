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


def _sim_stream(rng, n_objects=10, T=20, dt=0.5):
    """Tiny synthetic world: robot moves +x past fixed objects."""
    centers = np.stack([
        np.linspace(2.0, 18.0, n_objects),
        rng.uniform(-3, 3, n_objects),
        rng.uniform(0, 1.5, n_objects),
    ], axis=1)
    descs = np.eye(max(n_objects, 8), dtype=np.float32)[:n_objects, :8]
    times = np.arange(T) * dt
    poses = [yaw_T(0.0, np.array([0.8 * t, 0.0, 0.0])) for t in times]
    obs_rng = np.random.default_rng(7)

    def source(t):
        k = int(round(t / dt))
        pose = poses[min(k, T - 1)]
        obs = []
        for i, c in enumerate(centers):
            if np.linalg.norm(c[:2] - pose[:2, 3]) > 6.0:
                continue
            obs.append(make_obs(obs_rng, c, pose, t, desc=descs[i]))
        return pose, obs, np.ones(8, np.float32)

    return source, times, centers


def test_device_mapper_agrees_with_host(rng):
    """MapRunner with mapper_backend=device tracks the same objects as the
    host Mapper on a clean synthetic stream (VERDICT r1 item 5)."""
    from roman_tpu.data.pose_data import PoseData
    from roman_tpu.map.run import MapRunner
    from roman_tpu.params.fastsam_params import FastSAMParams

    source, times, centers = _sim_stream(rng)
    poses = np.stack([source(t)[0] for t in times])
    pd = PoseData.from_times_and_poses(times, poses)
    fp = FastSAMParams(batch_frames=4, max_masks_per_frame=16)

    maps = {}
    for backend in ("host", "device"):
        mp = MapperParams(min_sightings=2, max_t_no_sightings=2.0,
                          geometric_score_range=(0.1, 1.0),
                          mapper_backend=backend,
                          max_segments=64, max_points_per_segment=128)
        runner = MapRunner(mp, fp, CameraParams.simple(), pd,
                           t0=float(times[0]), tf=float(times[-1]) + 1e-6,
                           dt=0.5)
        maps[backend] = runner.run_observations(source)

    host_centers = np.stack([s.center for s in maps["host"].segments])
    dev_centers = np.stack([s.center for s in maps["device"].segments])
    # every host segment has a device counterpart within 1 m (clean world:
    # both should track the true objects)
    d = np.linalg.norm(host_centers[:, None] - dev_centers[None, :], axis=-1)
    assert (d.min(axis=1) < 1.0).mean() >= 0.8
    # segment counts in the same ballpark
    assert abs(len(host_centers) - len(dev_centers)) <= max(
        3, 0.4 * len(host_centers))


def test_merge_to_fixpoint_chained(rng):
    """Three segments forming an overlap chain a~b~c must collapse into
    ONE segment within a single frame — the reference restarts its merge
    scan after every edit (mapper.py:251-314); the device mapper's
    bounded while_loop must do the same, not stop after one merge."""
    # iom: a blob contained in a larger merged segment scores ~1
    # regardless of the size ratio, so the chain a~b~c is expressible
    # (plain IOU of a small blob vs the growing union shrinks below any
    # threshold as the union grows — the reference's merge similarity
    # supports iom for exactly this, mapper.py:182-212)
    params = MapperParams(min_sightings=1, max_t_no_sightings=10.0,
                          geometric_score_range=(0.15, 1.0),
                          geometric_association_method="iom",
                          iou_voxel_size=0.25, segment_voxel_size=0.1,
                          max_segments=16, max_points_per_segment=512)
    m = BatchMapper(params, CameraParams.simple(), desc_dim=4, obs_capacity=8)
    pose = np.eye(4)
    # frame 1: three observations of well-separated spots -> 3 segments
    # (point counts sized so the merged cloud fits the 512-point pool —
    # capacity truncation would otherwise clip the downsampled union and
    # break the overlap chain)
    spots = [np.array([2.0, y, 1.0]) for y in (-1.2, 0.0, 1.2)]
    m.update(0.0, pose, [make_obs(rng, c, pose, 0.0, n=80, scale=0.15)
                         for c in spots])
    assert int((np.asarray(m.state.status) > 0).sum()) == 3
    # frame 2: one wide observation overlapping ALL three -> after the
    # in-frame merge-to-fixpoint, exactly one live segment remains
    wide = np.concatenate([
        c + rng.normal(size=(80, 3)) * 0.15 for c in spots
    ] + [np.stack([np.full(60, 2.0),
                   np.linspace(-1.2, 1.2, 60),
                   np.full(60, 1.0)], axis=1)])
    from roman_tpu.map.observation import Observation
    m.update(0.1, pose, [Observation(time=0.1, pose=pose, point_cloud=wide)])
    live = int((np.asarray(m.state.status) > 0).sum())
    assert live == 1, f"expected 1 live segment after chained merge, got {live}"


def test_export_retirement_cleanup_drops_stragglers(rng):
    """The export program's DBSCAN-equivalent cleanup (reference
    mapper.py:101, segment.py:195-220) removes far-away straggler points
    so they do not corrupt the exported center/volume."""
    params = MapperParams(min_sightings=1, max_t_no_sightings=10.0,
                          geometric_score_range=(0.15, 1.0),
                          clustering_epsilon=0.25,
                          max_segments=8, max_points_per_segment=128)
    m = BatchMapper(params, CameraParams.simple(), desc_dim=4, obs_capacity=4)
    pose = np.eye(4)
    c = np.array([3.0, 0.0, 1.0])
    pts_w = np.concatenate([
        c + rng.normal(size=(100, 3)) * 0.08,
        c + np.array([8.0, 8.0, 0.0]) + rng.normal(size=(5, 3)) * 0.05,
    ])
    from roman_tpu.map.observation import Observation
    m.update(0.0, pose, [Observation(time=0.0, pose=pose, point_cloud=pts_w)])
    rmap = m.get_roman_map()
    assert len(rmap.segments) == 1
    # stragglers dropped: center near the true blob, not dragged toward it
    assert np.linalg.norm(np.asarray(rmap.segments[0].center) - c) < 0.3


def test_device_mapper_agrees_with_host_noisy(rng):
    """Host/device agreement under measurement noise + odometry drift
    (VERDICT r2 item 3): the same world as the clean test but with point
    noise on every observation and a drifting pose estimate."""
    from roman_tpu.data.pose_data import PoseData
    from roman_tpu.map.run import MapRunner
    from roman_tpu.params.fastsam_params import FastSAMParams

    source, times, centers = _sim_stream(rng)
    obs_rng = np.random.default_rng(11)

    def noisy_source(t):
        pose, obs, fd = source(t)
        # odometry drift: 1%/m forward + small yaw drift
        x = pose[0, 3]
        drift = yaw_T(0.002 * x, np.array([0.01 * x, 0.005 * x, 0.0]))
        pose_n = drift @ pose
        obs_n = []
        for o in obs:
            pc = np.asarray(o.point_cloud)
            pc = pc + obs_rng.normal(size=pc.shape) * 0.05
            obs_n.append(Observation(time=o.time, pose=pose_n,
                                     point_cloud=pc,
                                     semantic_descriptor=o.semantic_descriptor))
        return pose_n, obs_n, fd

    poses = np.stack([noisy_source(t)[0] for t in times])
    pd = PoseData.from_times_and_poses(times, poses)
    fp = FastSAMParams(batch_frames=4, max_masks_per_frame=16)

    maps = {}
    for backend in ("host", "device"):
        mp = MapperParams(min_sightings=2, max_t_no_sightings=2.0,
                          geometric_score_range=(0.1, 1.0),
                          mapper_backend=backend,
                          max_segments=64, max_points_per_segment=128)
        runner = MapRunner(mp, fp, CameraParams.simple(), pd,
                           t0=float(times[0]), tf=float(times[-1]) + 1e-6,
                           dt=0.5)
        maps[backend] = runner.run_observations(noisy_source)

    host_centers = np.stack([s.center for s in maps["host"].segments])
    dev_centers = np.stack([s.center for s in maps["device"].segments])
    d = np.linalg.norm(host_centers[:, None] - dev_centers[None, :], axis=-1)
    # noisy world: most host segments still have a device counterpart
    assert (d.min(axis=1) < 1.0).mean() >= 0.7, d.min(axis=1)
    assert abs(len(host_centers) - len(dev_centers)) <= max(
        3, 0.5 * len(host_centers))


def test_device_mapper_volume_parity(rng):
    """Device-pool capacity must not shrink exported OBB volumes: with
    fine-resolution SOR followed by adaptive voxel coarsening
    (voxel_downsample max_coarsen_levels) a 128-point pool tracks the
    host mapper's unbounded point sets to ~1.2x median volume on the
    noisy world — a bounded bias TOWARD the true footprint (SOR on the
    mixed-resolution overflow cloud under-trims noise tails slightly).
    Plain lowest-hash truncation gave 0.74x median (footprint randomly
    clipped, bias grows with overflow factor)."""
    from roman_tpu.data.pose_data import PoseData
    from roman_tpu.map.run import MapRunner
    from roman_tpu.params.fastsam_params import FastSAMParams

    source, times, centers = _sim_stream(rng)
    obs_rng = np.random.default_rng(11)

    def noisy_source(t):
        pose, obs, fd = source(t)
        x = pose[0, 3]
        drift = yaw_T(0.002 * x, np.array([0.01 * x, 0.005 * x, 0.0]))
        pose_n = drift @ pose
        obs_n = []
        for o in obs:
            pc = np.asarray(o.point_cloud)
            pc = pc + obs_rng.normal(size=pc.shape) * 0.05
            obs_n.append(Observation(time=o.time, pose=pose_n,
                                     point_cloud=pc,
                                     semantic_descriptor=o.semantic_descriptor))
        return pose_n, obs_n, fd

    poses = np.stack([noisy_source(t)[0] for t in times])
    pd = PoseData.from_times_and_poses(times, poses)
    fp = FastSAMParams(batch_frames=4, max_masks_per_frame=16)

    maps = {}
    for backend in ("host", "device"):
        mp = MapperParams(min_sightings=2, max_t_no_sightings=2.0,
                          geometric_score_range=(0.1, 1.0),
                          mapper_backend=backend,
                          max_segments=64, max_points_per_segment=128)
        runner = MapRunner(mp, fp, CameraParams.simple(), pd,
                           t0=float(times[0]), tf=float(times[-1]) + 1e-6,
                           dt=0.5)
        maps[backend] = runner.run_observations(noisy_source)

    h, d = maps["host"].segments, maps["device"].segments
    hc = np.stack([s.center for s in h])
    dc = np.stack([s.center for s in d])
    D = np.linalg.norm(hc[:, None] - dc[None, :], axis=-1)
    ratios = [d[int(np.argmin(D[i]))].volume / max(h[i].volume, 1e-9)
              for i in range(len(h)) if D[i].min() < 1.0]
    assert len(ratios) >= 5
    med = float(np.median(ratios))
    assert 0.85 <= med <= 1.45, ratios


def test_retired_spill_prevents_pool_exhaustion(rng):
    """Long trajectory with many transient objects: RETIRED segments must
    spill off-device and free their slots, so the map keeps growing past
    max_segments (regression: the r3 device-mapper e2e found 0 loop
    closures because the 256-slot pool saturated and later submaps were
    empty)."""
    params = MapperParams(min_sightings=1, max_t_no_sightings=0.3,
                          geometric_score_range=(0.15, 1.0),
                          # retirement follows the reference rule (robot
                          # pose at last observation vs current pose —
                          # mapper.py:113-123), so at 3 m/frame a 6 m
                          # graveyard radius retires a lost track ~2
                          # frames after it goes inactive, keeping pool
                          # turnover prompt for the spill under test
                          segment_graveyard_dist=6.0,
                          max_segments=24, max_points_per_segment=32)
    m = BatchMapper(params, CameraParams.simple(), desc_dim=4, obs_capacity=8)
    m.spill_check_every = 2
    n_frames, per_frame = 20, 6
    for f in range(n_frames):
        t = f * 0.2
        # moving robot: the robot moves > segment_graveyard_dist past the
        # last-observation pose and the track graveyards (then spills);
        # fresh objects appear every frame
        pose = yaw_T(0.0, np.array([3.0 * f, 0.0, 0.0]))
        obs = [make_obs(rng, np.array([3.0 * f, 4.0 * k, 1.0]), pose, t,
                        n=20, scale=0.1) for k in range(per_frame)]
        m.update(t, pose, obs)
    rmap = m.get_roman_map()
    # far more segments than the pool can hold at once
    assert len(rmap.segments) > params.max_segments, len(rmap.segments)
    assert len(rmap.segments) >= n_frames * per_frame * 0.8
    ids = [s.id for s in rmap.segments]
    assert len(set(ids)) == len(ids)  # no id reuse across spills


def test_ensure_desc_dim_widens_pool():
    """Regression: a stream whose first batch has no descriptors created
    the device mapper at the placeholder width, silently truncating all
    later full-width descriptors."""
    import numpy as np

    from roman_tpu.data.camera import CameraParams
    from roman_tpu.map.batch_mapper import BatchMapper
    from roman_tpu.params.mapper_params import MapperParams

    p = MapperParams(max_segments=16, max_points_per_segment=32,
                     min_sightings=1, max_t_no_sightings=10.0)
    bm = BatchMapper(p, CameraParams.simple(64, 48), desc_dim=8,
                     obs_capacity=4)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (1, 4, 8, 3)).astype(np.float32)
    val = np.ones((1, 4, 8), bool)
    mask = np.ones((1, 4), bool)
    bm.update_batch([0.0], np.eye(4)[None], pts, val,
                    np.zeros((1, 4, 8), np.float32), mask)
    bm.ensure_desc_dim(32)
    assert bm.desc_dim == 32 and bm.state.descriptors.shape[-1] == 32
    d32 = rng.normal(size=(1, 4, 32)).astype(np.float32)
    d32 /= np.linalg.norm(d32, axis=-1, keepdims=True)
    bm.update_batch([0.5], np.eye(4)[None], pts, val, d32, mask)
    # the full-width descriptors landed un-truncated: some segment's
    # stored descriptor has energy beyond the first 8 dims
    desc = np.asarray(bm.state.descriptors)
    assert np.abs(desc[..., 8:]).sum() > 0.0


def test_graveyard_uses_last_observation_pose(rng):
    """The inactive->graveyard distance rule compares the CURRENT robot
    pose against the robot pose at the segment's LAST OBSERVATION
    (reference mapper.py:113-123) — not against the segment center. A
    segment observed from afar must retire once the robot has moved
    segment_graveyard_dist since last seeing it, even while the robot is
    still closer than that to the segment itself; host Mapper agrees."""
    from roman_tpu.map.mapper import Mapper

    params = MapperParams(min_sightings=1, max_t_no_sightings=0.3,
                          segment_graveyard_dist=10.0,
                          segment_graveyard_time=1e9,
                          geometric_score_range=(0.1, 1.0),
                          max_segments=16, max_points_per_segment=64)
    dev = BatchMapper(params, CameraParams.simple(), desc_dim=4,
                      obs_capacity=4)
    host = Mapper(params, CameraParams.simple())
    target = np.array([15.0, 0.0, 1.0])   # 15 m ahead at first sight
    t = 0.0
    for f in range(8):
        # robot advances 1.6 m/frame: after ~7 frames it has moved
        # ~11 m > graveyard_dist from the target's observation pose, yet
        # is only ~4 m from the target's center (center rule would keep
        # it). Every frame ALSO observes a fresh nearby object — the
        # lifecycle only runs on frames that carry observations
        # (reference mapper.py:56-57 early-returns on empty frames).
        pose = yaw_T(0.0, np.array([1.6 * f, 0.0, 0.0]))
        obs = [make_obs(rng, np.array([1.6 * f + 2.0, 5.0, 1.0]), pose, t,
                        n=30, scale=0.1)]
        if f == 0:
            obs.append(make_obs(rng, target, pose, t, n=40, scale=0.1))
        dev.update(t, pose, obs)
        host.update(t, pose, [o.copy(include_ptcld=True) for o in obs])
        t += 0.2
    from roman_tpu.map.batch_mapper import GRAVEYARD

    status = np.asarray(dev.state.status)
    rows = np.flatnonzero(np.asarray(dev.state.seg_id) >= 0)
    pts = np.asarray(dev.state.points)
    val = np.asarray(dev.state.points_valid)
    centers = np.array([pts[r][val[r]].mean(axis=0) for r in rows])
    tgt_rows = rows[np.linalg.norm(centers - target, axis=-1) < 1.0]
    assert len(tgt_rows) == 1
    assert status[tgt_rows[0]] == GRAVEYARD
    host_grave = [s for s in host.segment_graveyard
                  if np.linalg.norm(np.asarray(s.center).reshape(3)
                                    - target) < 1.0]
    assert len(host_grave) == 1
    assert not any(np.linalg.norm(np.asarray(s.center).reshape(3)
                                  - target) < 1.0
                   for s in host.inactive_segments + host.segments)


def test_oversized_observation_downsampled_not_truncated(rng):
    """An observation with more points than max_points_per_segment must
    be reduced by voxel-downsample + even stride, not by keeping the
    first Q points (mask-pixel order = top image rows = a spatially
    biased footprint that skews center/extent vs the host mapper)."""
    params = MapperParams(min_sightings=1, max_t_no_sightings=5.0,
                          geometric_score_range=(0.15, 1.0),
                          segment_voxel_size=0.05,
                          max_segments=8, max_points_per_segment=32)
    m = BatchMapper(params, CameraParams.simple(), desc_dim=4, obs_capacity=4)
    pose = np.eye(4)
    # 1.2k points along a 10 m bar: first-32 would cover only the first
    # ~0.25 m of it and report a center near the bar's start
    bar = np.stack([np.linspace(0.0, 10.0, 1200),
                    np.zeros(1200), np.ones(1200)], axis=1)
    obs = Observation(time=0.0, pose=pose, point_cloud=bar)
    m.update(0.0, pose, [obs])
    seg = m.get_roman_map().segments[0]
    c = np.asarray(seg.center).reshape(3)
    assert abs(c[0] - 5.0) < 1.0, c       # mid-bar, not the biased ~0.1
    assert np.asarray(seg.extent).max() > 8.0  # spans the whole bar
