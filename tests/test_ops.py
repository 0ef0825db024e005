import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rot

from roman_tpu.ops import arun, geometry, voxel, pointcloud, metrics, hungarian


def test_arun_recovers_transform(rng):
    R = Rot.random(8, random_state=1).as_matrix()
    t = rng.normal(size=(8, 3)) * 3
    pts2 = rng.normal(size=(8, 12, 3))
    pts1 = np.einsum("bij,bnj->bni", R, pts2) + t[:, None]
    T = np.asarray(arun.arun(jnp.asarray(pts1), jnp.asarray(pts2)))
    np.testing.assert_allclose(T[:, :3, :3], R, atol=1e-5)
    np.testing.assert_allclose(T[:, :3, 3], t, atol=1e-5)


def test_arun_masked_ignores_padding(rng):
    R = Rot.random(1, random_state=2).as_matrix()[0]
    t = np.array([1.0, -2.0, 0.5])
    pts2 = rng.normal(size=(10, 3))
    pts1 = pts2 @ R.T + t
    # corrupt padded rows
    pts1_pad = np.concatenate([pts1, rng.normal(size=(5, 3)) * 100])
    pts2_pad = np.concatenate([pts2, rng.normal(size=(5, 3)) * 100])
    w = np.concatenate([np.ones(10), np.zeros(5)])
    T = np.asarray(arun.arun(jnp.asarray(pts1_pad), jnp.asarray(pts2_pad), jnp.asarray(w)))
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-5)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-5)


def test_arun_reflection_fix(rng):
    # coplanar points can produce reflection-prone SVD; det must stay +1
    pts2 = rng.normal(size=(6, 3))
    pts2[:, 2] = 0.0
    R = Rot.from_euler("z", 1.0).as_matrix()
    pts1 = pts2 @ R.T
    T = np.asarray(arun.arun(jnp.asarray(pts1), jnp.asarray(pts2)))
    assert np.linalg.det(T[:3, :3]) > 0.99


def test_shape_attributes(rng):
    # line-like, plane-like, sphere-like clouds
    n = 200
    line = np.stack([np.linspace(0, 10, n), np.zeros(n), np.zeros(n)], axis=1)
    line += rng.normal(size=(n, 3)) * 0.01
    plane = rng.normal(size=(n, 3)) * [5, 5, 0.01]
    blob = rng.normal(size=(n, 3))
    pts = np.stack([line, plane, blob])
    mask = np.ones((3, n), dtype=bool)
    att = np.asarray(geometry.shape_attributes(jnp.asarray(pts), jnp.asarray(mask)))
    assert att[0, 0] > 0.9  # linearity
    assert att[1, 1] > 0.7  # planarity
    assert att[2, 2] > 0.4  # scattering
    assert att[1, 1] > att[0, 1] and att[1, 1] > att[2, 1]

    # against the reference formula via numpy svd
    C = np.cov(blob.T, bias=True)
    e = np.linalg.svd(C)[1]
    e = e / e.sum()
    ref = [(e[0] - e[1]) / e[0], (e[1] - e[2]) / e[0], e[2] / e[0]]
    np.testing.assert_allclose(att[2], ref, atol=1e-5)


def test_obb_volume_axis_aligned_box(rng):
    pts = rng.uniform(size=(500, 3)) * [2.0, 3.0, 1.0]
    mask = np.ones(500, dtype=bool)
    vol, extent = geometry.obb_volume_extent(jnp.asarray(pts), jnp.asarray(mask))
    # PCA-OBB overestimates slightly for uniform boxes (axes from sample cov)
    assert abs(float(vol) - 6.0) / 6.0 < 0.25
    np.testing.assert_allclose(np.sort(np.asarray(extent)), [1.0, 2.0, 3.0], rtol=0.2)


def test_voxel_iou_matches_numpy(rng):
    for _ in range(5):
        p1 = rng.normal(size=(60, 3))
        p2 = p1 + rng.normal(size=(60, 3)) * 0.1
        m1 = rng.uniform(size=60) > 0.2
        m2 = rng.uniform(size=60) > 0.2
        got = float(
            voxel.voxel_iou_points(
                jnp.asarray(p1), jnp.asarray(m1), jnp.asarray(p2), jnp.asarray(m2), 0.2
            )
        )
        ref = voxel.voxel_iou_np(p1[m1], p2[m2], 0.2)
        np.testing.assert_allclose(got, ref, atol=1e-6)
        got_iom = float(
            voxel.voxel_iou_points(
                jnp.asarray(p1), jnp.asarray(m1), jnp.asarray(p2), jnp.asarray(m2), 0.2,
                iom_as_iou=True,
            )
        )
        ref_iom = voxel.voxel_iou_np(p1[m1], p2[m2], 0.2, iom_as_iou=True)
        np.testing.assert_allclose(got_iom, ref_iom, atol=1e-6)


def test_voxel_downsample_matches_numpy(rng):
    pts = rng.normal(size=(100, 3))
    mask = np.ones(100, dtype=bool)
    out, out_mask = voxel.voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 0.5)
    got = np.sort(np.asarray(out)[np.asarray(out_mask)], axis=0)
    ref = np.sort(voxel.voxel_downsample_np(pts, 0.5), axis=0)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_voxel_downsample_adaptive_coarsening(rng):
    """Overflowing the capacity with max_coarsen_levels preserves the
    footprint (bounding box) by doubling the voxel size per row instead
    of keeping a random voxel subset (which shrinks the OBB — the
    device-mapper 0.74x volume bug)."""
    # Gaussian cloud: extreme voxels are sparse, so a random subset loses
    # the tails (the OBB-shrink failure mode); coarsening must not
    pts = rng.normal(size=(400, 3)) * 0.7
    mask = np.ones(400, dtype=bool)
    cap = 48  # far fewer than the ~hundreds of occupied 0.1-voxels
    trunc, trunc_m = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.asarray(mask), 0.1, capacity=cap)
    coars, coars_m = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.asarray(mask), 0.1, capacity=cap,
        max_coarsen_levels=4)
    assert int(np.asarray(coars_m).sum()) <= cap

    def span(o, m):
        o = np.asarray(o)[np.asarray(m)]
        return (o.max(axis=0) - o.min(axis=0))

    full_span = pts.max(axis=0) - pts.min(axis=0)
    # coarsened output covers the true footprint; truncated subset doesn't
    assert (span(coars, coars_m) > 0.85 * full_span).all()
    assert span(trunc, trunc_m).prod() < 0.85 * span(coars, coars_m).prod()
    # batched rows pick their level independently: a small row stays at
    # the fine level (bit-equal to the non-adaptive result)
    small = rng.uniform(-0.25, 0.25, size=(400, 3))  # <=125 occupied 0.1-voxels
    both = jnp.asarray(np.stack([pts, small]))
    bm = jnp.ones((2, 400), bool)
    ad, ad_m = voxel.voxel_downsample(both, bm, 0.1, capacity=256,
                                      max_coarsen_levels=4)
    plain, plain_m = voxel.voxel_downsample(both[1], bm[1], 0.1,
                                            capacity=256)
    got = np.asarray(ad[1])[np.asarray(ad_m[1])]
    ref = np.asarray(plain)[np.asarray(plain_m)]
    np.testing.assert_allclose(np.sort(got, axis=0), np.sort(ref, axis=0),
                               atol=1e-6)


def test_outlier_removal_agrees_with_numpy(rng):
    pts = rng.normal(size=(50, 3))
    pts[0] = [100, 100, 100]  # obvious outlier
    mask = np.ones(50, dtype=bool)
    keep = np.asarray(
        pointcloud.statistical_outlier_mask(jnp.asarray(pts), jnp.asarray(mask), 10, 1.0)
    )
    ref = pointcloud.statistical_outlier_mask_np(pts, 10, 1.0)
    assert not keep[0]
    np.testing.assert_array_equal(keep, ref)


def test_largest_cluster(rng):
    a = rng.normal(size=(50, 3)) * 0.05
    b = rng.normal(size=(20, 3)) * 0.05 + 10.0
    keep = pointcloud.largest_cluster_mask_np(np.concatenate([a, b]), eps=0.5, min_points=5)
    assert keep[:50].all() and not keep[50:].any()


def test_largest_cluster_adaptive_eps_on_coarse_clouds(rng):
    """A cloud stored at coarsened voxel resolution has inter-point
    spacing above the fixed DBSCAN eps: every point is noise and the
    keep-all fallback silently skips straggler removal. With
    adaptive_spacing_factor the eps scales to the actual spacing and the
    far straggler is still dropped."""
    # 0.4-spaced grid (spacing > eps 0.25) + one straggler 8 m away
    g = np.arange(5) * 0.4
    core = np.stack(np.meshgrid(g, g, g), axis=-1).reshape(-1, 3)
    pts = np.concatenate([core, [[8.0, 8.0, 8.0]]]).astype(np.float32)
    mask = np.ones(len(pts), bool)
    fixed = np.asarray(pointcloud.largest_cluster_mask(
        jnp.asarray(pts), jnp.asarray(mask), eps=0.25))
    assert fixed.all()  # no clusters at fixed eps -> keep-all fallback
    adapt = np.asarray(pointcloud.largest_cluster_mask(
        jnp.asarray(pts), jnp.asarray(mask), eps=0.25,
        adaptive_spacing_factor=1.6))
    assert adapt[:-1].all() and not adapt[-1]
    # fine-spaced clouds are unaffected (adaptive eps = fixed eps)
    fine = rng.normal(size=(60, 3)).astype(np.float32) * 0.05
    fine = np.concatenate([fine, [[5.0, 5.0, 5.0]]]).astype(np.float32)
    fm = np.ones(len(fine), bool)
    a = np.asarray(pointcloud.largest_cluster_mask(
        jnp.asarray(fine), jnp.asarray(fm), eps=0.25))
    b = np.asarray(pointcloud.largest_cluster_mask(
        jnp.asarray(fine), jnp.asarray(fm), eps=0.25,
        adaptive_spacing_factor=1.6))
    np.testing.assert_array_equal(a, b)


def test_largest_cluster_device_matches_sklearn(rng):
    """Device largest_cluster_mask agrees with the sklearn-DBSCAN twin on
    clustered sets with cores, borders and noise — including padding and
    the all-noise degenerate case."""
    for trial in range(6):
        n_a = 30 + trial
        a = rng.normal(size=(n_a, 3)) * 0.08
        b = rng.normal(size=(12, 3)) * 0.08 + 5.0
        noise = rng.uniform(-20, 20, size=(6, 3))
        pts = np.concatenate([a, b, noise]).astype(np.float32)
        perm = rng.permutation(len(pts))
        pts = pts[perm]
        P = 64
        pad = np.zeros((P, 3), np.float32)
        pad[: len(pts)] = pts
        pad[len(pts):] = 1e3  # garbage in the padded region
        mask = np.zeros(P, bool)
        mask[: len(pts)] = True
        keep = np.asarray(pointcloud.largest_cluster_mask(
            jnp.asarray(pad), jnp.asarray(mask), eps=0.5, min_points=5))
        ref = pointcloud.largest_cluster_mask_np(pts, eps=0.5, min_points=5)
        np.testing.assert_array_equal(keep[: len(pts)], ref)
        assert not keep[len(pts):].any()

    # all-noise: both keep everything
    scatter = (rng.uniform(-50, 50, size=(10, 3))).astype(np.float32)
    pad = np.zeros((16, 3), np.float32)
    pad[:10] = scatter
    mask = np.zeros(16, bool)
    mask[:10] = True
    keep = np.asarray(pointcloud.largest_cluster_mask(
        jnp.asarray(pad), jnp.asarray(mask), eps=0.5, min_points=5))
    ref = pointcloud.largest_cluster_mask_np(scatter, eps=0.5, min_points=5)
    np.testing.assert_array_equal(keep[:10], ref)


def test_largest_cluster_device_batched(rng):
    """Batched (leading-dim) call gives per-segment results identical to
    per-segment calls."""
    S, P = 4, 48
    pts = np.zeros((S, P, 3), np.float32)
    mask = np.zeros((S, P), bool)
    for s in range(S):
        n = 20 + 5 * s
        pts[s, :n] = rng.normal(size=(n, 3)) * 0.1 + s
        pts[s, n - 3: n] += 8.0  # small far-away blob (noise)
        mask[s, :n] = True
    batched = np.asarray(pointcloud.largest_cluster_mask(
        jnp.asarray(pts), jnp.asarray(mask), eps=0.5, min_points=5))
    for s in range(S):
        single = np.asarray(pointcloud.largest_cluster_mask(
            jnp.asarray(pts[s]), jnp.asarray(mask[s]), eps=0.5, min_points=5))
        np.testing.assert_array_equal(batched[s], single)


def test_chamfer(rng):
    p1 = rng.normal(size=(30, 3))
    p2 = rng.normal(size=(40, 3))
    m1 = np.ones(30, dtype=bool)
    m2 = np.ones(40, dtype=bool)
    got = float(metrics.chamfer_distance(jnp.asarray(p1), jnp.asarray(m1), jnp.asarray(p2), jnp.asarray(m2)))
    d = np.linalg.norm(p1[:, None] - p2[None], axis=-1)
    ref = min(d.min(axis=1).mean(), d.min(axis=0).mean())
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_wasserstein_identity(rng):
    mu = rng.normal(size=3)
    A = rng.normal(size=(3, 3))
    S = A @ A.T + np.eye(3)
    got = float(metrics.wasserstein_metric(jnp.asarray(mu), jnp.asarray(S), jnp.asarray(mu), jnp.asarray(S)))
    np.testing.assert_allclose(got, 0.0, atol=1e-4)


def test_hungarian_rejection(rng):
    scores = np.array([[0.1, 2.0], [2.0, 0.2], [2.0, 2.0]])
    pairs = hungarian.assignment_with_rejection_np(scores)
    assert (0, 0) in pairs and (1, 1) in pairs
    assert len(pairs) == 2


def test_auction_matches_hungarian(rng):
    for _ in range(5):
        benefit = rng.uniform(0.1, 1.0, size=(6, 7))
        rm = np.ones(6, dtype=bool)
        cm = np.ones(7, dtype=bool)
        match = np.asarray(
            hungarian.auction_assignment(jnp.asarray(benefit), jnp.asarray(rm), jnp.asarray(cm), n_iters=500, eps=1e-4)
        )
        rows, cols = np.asarray(
            __import__("scipy.optimize", fromlist=["linear_sum_assignment"]).linear_sum_assignment(-benefit)
        )
        ref_total = benefit[rows, cols].sum()
        got_total = sum(benefit[i, match[i]] for i in range(6) if match[i] >= 0)
        assert got_total >= ref_total - 0.05  # near-optimal within eps-scaling


def test_voxel_iou_cross_far_sets_zero():
    """Regression: the old SPAN-clipped dense packing gave spurious IOU
    ~0.28 for point sets 50 m apart when both sat ~300 m from the grid
    origin; hashed keys have no bounded span."""
    import jax.numpy as jnp

    from roman_tpu.ops.voxel import voxel_iou_cross

    rng = np.random.default_rng(0)
    p1 = rng.uniform(0, 2, (1, 64, 3)) + 300.0
    p2 = p1[0][None] + 50.0
    m = np.ones((1, 64), bool)
    iou = voxel_iou_cross(jnp.asarray(p1), jnp.asarray(m),
                          jnp.asarray(p2), jnp.asarray(m), 0.2)
    assert float(iou[0, 0]) == 0.0
    same = voxel_iou_cross(jnp.asarray(p1), jnp.asarray(m),
                           jnp.asarray(p1), jnp.asarray(m), 0.2)
    assert float(same[0, 0]) == 1.0


def test_voxel_iou_cross_keys_backends_match(rng):
    """The TPU 'compare' backend (blocked broadcast equality — searchsorted
    lowers to a serial gather loop on TPU and was 97% of the device
    mapper's frame cost) must produce bit-identical IOUs to the
    'searchsorted' backend, including across O-axis block padding and
    _INVALID-padded rows."""
    import jax.numpy as jnp

    from roman_tpu.ops.voxel import sorted_unique_keys, voxel_iou_cross_keys

    # sizes chosen so the compare backend's 32M-element block budget
    # forces blk < O (S*P*Q = 64*256*256 ≈ 4.2M -> blk=7 over O=20,
    # exercising the O_pad != O branch)
    S, P, O, Q = 64, 256, 20, 256
    p1 = rng.uniform(0, 8, (S, P, 3)).astype(np.float32)
    p2 = rng.uniform(0, 8, (O, Q, 3)).astype(np.float32)
    m1 = rng.uniform(size=(S, P)) < 0.8
    m2 = rng.uniform(size=(O, Q)) < 0.8
    m1[0] = False  # fully-empty row: all keys _INVALID
    k1, n1 = sorted_unique_keys(jnp.asarray(p1), jnp.asarray(m1), 0.5)
    k2, n2 = sorted_unique_keys(jnp.asarray(p2), jnp.asarray(m2), 0.5)
    for iom in (False, True):
        a = voxel_iou_cross_keys(k1, n1, k2, n2, iom_as_iou=iom,
                                 method="compare")
        b = voxel_iou_cross_keys(k1, n1, k2, n2, iom_as_iou=iom,
                                 method="searchsorted")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.max(a)) > 0  # sets overlap: the test isn't vacuous
    assert np.all(np.asarray(a)[0] == 0)  # empty row intersects nothing


def test_auction_batched_matches_per_batch(rng):
    """Regression: the old row->col scatter used numpy outer advanced
    indexing across batch dims, corrupting every batch for B>1."""
    B, n, m = 3, 5, 6
    benefit = rng.uniform(0.1, 1.0, size=(B, n, m))
    rm = np.ones((B, n), bool)
    cm = np.ones((B, m), bool)
    batched = np.asarray(hungarian.auction_assignment(
        jnp.asarray(benefit), jnp.asarray(rm), jnp.asarray(cm),
        n_iters=300, eps=1e-4))
    for b in range(B):
        single = np.asarray(hungarian.auction_assignment(
            jnp.asarray(benefit[b]), jnp.asarray(rm[b]), jnp.asarray(cm[b]),
            n_iters=300, eps=1e-4))
        np.testing.assert_array_equal(batched[b], single)
