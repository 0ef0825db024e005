"""North-star benchmark: all-pairs submap registration throughput.

The reference's hot loop runs one C++/CPU CLIPPER solve per submap pair,
serially (reference roman/align/submap_align.py:93-201; per-pair timing
written to align.timing.txt). This benchmark measures our batched TPU
engine on a realistic workload — 40-object submaps with 768-d semantic
descriptors over a full 2-robot pair grid — against a serial
reference-equivalent CPU implementation (same invariant math, same
iteration counts): a native C++ per-pair solver
(roman_tpu/native/clipper_ref.cpp, g++ -O3, the honest stand-in for the
per-pair Eigen C++ clipperpy loop), with a vectorized-numpy fallback.

Prints ONE json line:
  {"metric": "submap_align_pairs_per_sec", "value": ..., "unit": "pairs/s",
   "vs_baseline": ...}
"""

import argparse
import json
import os
import time

import numpy as np

# persistent XLA compilation cache: first bench run pays ~3-5 min of
# compile for the chunked registration program; subsequent runs reuse it
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/roman_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def build_workload(seed=0, n_objects=1000, traj_len=240.0, desc_dim=768,
                   max_size=40, n_robots=2):
    from roman_tpu.sim import world
    from roman_tpu.map.roman_map import SubmapParams, submaps_from_roman_map
    from roman_tpu.map.roman_map import submaps_to_features
    from roman_tpu.align.registration import RegistrationConfig

    rng = np.random.default_rng(seed)
    _, runs = world.make_multi_robot_world(
        rng, n_robots=n_robots, n_objects=n_objects, area=(100.0, 100.0, 4.0),
        traj_len=traj_len, desc_dim=desc_dim,
        # VIO-grade drift (~0.2%/m): LC correctness vs GT then reflects
        # registration quality instead of accumulated odometry drift.
        # 256 classes + strong instance structure approximates real DINO
        # discriminability (32 classes over 1000 objects is pathologically
        # aliased and nothing like recorded environments)
        odom_drift_per_m=0.002, n_classes=256, instance_noise=0.45,
    )
    maps = [world.roman_map_from_run(r) for r in runs]
    params = SubmapParams(max_size=max_size, radius=15.0, distance=10.0)
    submaps = [submaps_from_roman_map(m, params) for m in maps]
    # use_pallas pinned False: the bench measures the XLA and pallas
    # engines separately (production default is auto = pallas-on-TPU)
    cfg = RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9,
                             use_pallas=False)
    feats, auxs = zip(*[
        submaps_to_features(sm, cfg, capacity=max_size, desc_dim=desc_dim)
        for sm in submaps
    ])
    return submaps, feats, auxs, cfg, runs


def gt_relative_poses(auxs, runs, pair_i, pair_j):
    """(P, 4, 4) yaw-only GT relative submap poses for the pair list."""
    from roman_tpu.data.pose_data import PoseData
    from roman_tpu.ops import se3_np

    gt_pd = [PoseData.from_times_and_poses(r.times, r.poses, time_tol=10.0)
             for r in runs]
    T_gt = []
    for k, aux in enumerate(auxs):
        T = np.stack([gt_pd[k].pose(float(t)) for t in aux["times"]])
        T_gt.append(se3_np.transform_rm_roll_pitch(T))
    return np.stack([
        np.linalg.inv(T_gt[0][i]) @ T_gt[1][j]
        for i, j in zip(pair_i, pair_j)
    ])


def lc_quality_from_lists(ok, count, T_align, T_ij_all, min_assoc=4,
                          dist_thresh=5.0, angle_thresh_deg=10.0,
                          radius=15.0):
    """Loop-closure precision/recall against sim ground truth (positive =
    GT submap distance < 2*radius, the reference's robots_nearby gate,
    submap_align.py:101; correct = registration error within thresholds
    after yaw-only projection)."""
    from roman_tpu.ops import se3_np

    tp = fp = fn = 0
    for idx in range(len(ok)):
        T_ij = T_ij_all[idx]
        positive = np.linalg.norm(T_ij[:3, 3]) < 2 * radius
        predicted = bool(ok[idx]) and int(count[idx]) >= min_assoc
        if predicted:
            T_hat = se3_np.transform_rm_roll_pitch(T_align[idx])
            err = np.linalg.inv(T_hat) @ T_ij
            good = (np.linalg.norm(err[:3, 3]) < dist_thresh
                    and np.degrees(se3_np.rotation_magnitude(err[:3, :3]))
                    < angle_thresh_deg)
        if predicted and positive and good:
            tp += 1
        else:
            if predicted:
                fp += 1
            if positive:
                # a wrong prediction on a positive pair is BOTH a false
                # positive and a missed closure — counting it only as fp
                # would overstate recall
                fn += 1
    return tp / max(tp + fp, 1), tp / max(tp + fn, 1)


def compute_lc_quality(res, auxs, runs, pair_i, pair_j, **kw):
    T_ij_all = gt_relative_poses(auxs, runs, pair_i, pair_j)
    return lc_quality_from_lists(
        np.asarray(res.ok), np.asarray(res.count), np.asarray(res.T_align),
        T_ij_all, **kw)


def run_multirobot(feats, auxs, cfg, chunk_size=32, repeats=2):
    """Every robot-pair grid in ONE dispatch: all robots' submaps are
    concatenated into a single pool and the cross-robot pair list spans
    all (a, b) robot pairs — the production multi-robot sweep (reference
    demo.py:138-161 runs one pair of robots at a time, serially)."""
    import jax

    from roman_tpu.align.submap_align import PairGridRegistrar

    pool = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0),
                        *[jax.tree.map(np.asarray, f) for f in feats])
    ids = np.concatenate([a["seg_ids"] for a in auxs], axis=0)
    offs = np.cumsum([0] + [f.centers.shape[0] for f in feats])
    pis, pjs = [], []
    for a in range(len(feats)):
        for b in range(a + 1, len(feats)):
            na = offs[a + 1] - offs[a]
            nb = offs[b + 1] - offs[b]
            pi, pj = np.meshgrid(np.arange(na), np.arange(nb), indexing="ij")
            pis.append(pi.reshape(-1) + offs[a])
            pjs.append(pj.reshape(-1) + offs[b])
    pair_i = np.concatenate(pis)
    pair_j = np.concatenate(pjs)

    registrar = PairGridRegistrar(cfg, chunk_size=chunk_size)
    registrar(pool, pool, ids, ids, pair_i, pair_j)  # warmup/compile
    dt = np.inf  # best-of: tunnel/queueing noise only ever adds time
    for _ in range(repeats):
        t0 = time.perf_counter()
        registrar(pool, pool, ids, ids, pair_i, pair_j)
        dt = min(dt, time.perf_counter() - t0)
    return len(pair_i), len(pair_i) / dt


def run_tpu(feats, auxs, cfg, chunk_size=32, repeats=2):
    from roman_tpu.align.submap_align import PairGridRegistrar

    n0 = feats[0].centers.shape[0]
    n1 = feats[1].centers.shape[0]
    pair_i, pair_j = np.meshgrid(np.arange(n0), np.arange(n1), indexing="ij")
    pair_i = pair_i.reshape(-1)
    pair_j = pair_j.reshape(-1)
    P = len(pair_i)

    registrar = PairGridRegistrar(cfg, chunk_size=chunk_size)
    # warmup / compile with the FULL pair list: the chunked program's
    # signature includes n_chunks, so a short warmup call would leave the
    # real compile inside the timed loop
    registrar(feats[0], feats[1], auxs[0]["seg_ids"], auxs[1]["seg_ids"],
              pair_i, pair_j)
    dt = np.inf  # best-of: tunnel/queueing noise only ever adds time
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = registrar(feats[0], feats[1], auxs[0]["seg_ids"], auxs[1]["seg_ids"],
                        pair_i, pair_j)
        dt = min(dt, time.perf_counter() - t0)
    # registrar.cfg.use_pallas flips to False on dispatch-time fallback
    # (Mosaic/VMEM failure), so this reports the engine that actually ran
    return P, P / dt, res, pair_i, pair_j, registrar.cfg.pallas_enabled()


# ---------------------------------------------------------------------------
# serial CPU reference-equivalent (stands in for per-pair C++ CLIPPER)
# ---------------------------------------------------------------------------

def _np_affinity(c1, r1, d1, c2, r2, d2, sigma, eps, mindist, cmin, cmax):
    n, m = len(c1), len(c2)
    D1 = np.linalg.norm(c1[:, None] - c1[None], axis=-1)
    D2 = np.linalg.norm(c2[:, None] - c2[None], axis=-1)
    dz1 = np.abs(c1[:, None, 2] - c1[None, :, 2])
    dz2 = np.abs(c2[:, None, 2] - c2[None, :, 2])
    dxy1 = np.linalg.norm(c1[:, None, :2] - c1[None, :, :2], axis=-1)
    dxy2 = np.linalg.norm(c2[:, None, :2] - c2[None, :, :2], axis=-1)
    d1b = D1[:, None, :, None]
    d2b = D2[None, :, None, :]
    slack = np.sin(0.0872665) * np.maximum(d1b, d2b)
    cz = np.maximum(np.abs(dz1[:, None, :, None] - dz2[None, :, None, :]) - slack, 0.0)
    cxy = np.abs(dxy1[:, None, :, None] - dxy2[None, :, None, :])
    c = np.sqrt(cz**2 + cxy**2)
    sd = np.exp(-0.5 * (c / sigma) ** 2) * (c < eps) * (d1b > mindist) * (d2b > mindist)
    # per-association ratio + cosine
    a = np.abs(r1[:, None, :])
    b = np.abs(r2[None, :, :])
    rho = np.minimum(a, b) / np.maximum(np.maximum(a, b), 1e-9)
    sr = np.exp(np.mean(np.log(np.maximum(rho, 1e-20)), axis=-1)) * np.all(rho > 0, -1)
    cos = d1 @ d2.T
    sc = np.clip((cos - cmin) / (cmax - cmin), 0, 1)
    single = (sr * sc) ** 0.5
    srp = np.sqrt(sr[:, :, None, None] * sr[None, None, :, :])
    scp = np.sqrt(sc[:, :, None, None] * sc[None, None, :, :])
    M = (sd * srp * scp) ** (1.0 / 3.0)
    ia = np.arange(n)
    ib = np.arange(m)
    same_a = (ia[:, None, None, None] == ia[None, None, :, None])
    same_b = (ib[None, :, None, None] == ib[None, None, None, :])
    M = np.where(same_a ^ same_b, 0.0, M)
    M = np.where(same_a & same_b, 0.0, M)
    M[ia[:, None], ib[None, :], ia[:, None], ib[None, :]] = single
    return M.reshape(n * m, n * m), single


def _np_solve_pair(c1, r1, d1, c2, r2, d2, cfg):
    """One serial reference-equivalent solve: affinity + dense-constraint
    penalty homotopy + the reference's omega rounding + Arun.

    Returns (sel list of (a, b), T (4, 4) or None)."""
    n1, n2 = len(c1), len(c2)
    M, single = _np_affinity(
        c1, r1, d1, c2, r2, d2,
        cfg.sigma, cfg.epsilon, cfg.mindist, cfg.cos_min, cfg.cos_max,
    )
    N = M.shape[0]
    u = np.ones(N) / np.sqrt(N)
    d = 0.0
    for _ in range(10):  # warmup power iters
        u = np.maximum(M @ u + u, 0)
        u /= max(np.linalg.norm(u), 1e-12)
    # penalty homotopy (Cb matvec done densely as C++ CLIPPER does)
    ia = np.repeat(np.arange(n1), n2)
    ib = np.tile(np.arange(n2), n1)
    conflict = ((ia[:, None] == ia[None, :]) ^ (ib[:, None] == ib[None, :])).astype(np.float64)
    for _ in range(12):
        for _ in range(10):
            g = M @ u - d * (conflict @ u)
            u = np.maximum(g, 0)
            nn = np.linalg.norm(u)
            u = u / nn if nn > 1e-12 else np.ones(N) / np.sqrt(N)
        Cbu = conflict @ u
        viol = (u > 1e-6) & (Cbu > 1e-6)
        if viol.any():
            d += (M @ u)[viol].sum() / max(Cbu[viol].sum(), 1e-9) + 1e-3
    # rounding + Arun
    omega = int(round(u @ (M @ u)))
    order = np.argsort(-u)[: max(omega, 0)]
    ra, rb = set(), set()
    sel = []
    for idx in order:
        a_, b_ = divmod(idx, n2)
        if a_ in ra or b_ in rb or u[idx] <= 0:
            continue
        ra.add(a_)
        rb.add(b_)
        sel.append((a_, b_))
    return sel, _arun_from_sel(c1, c2, sel)


def _arun_from_sel(c1, c2, sel):
    if len(sel) < 3:
        return None
    p1 = c1[[a for a, _ in sel]]
    p2 = c2[[b for _, b in sel]]
    m1, m2 = p1.mean(0), p2.mean(0)
    H = (p2 - m2).T @ (p1 - m1)
    U, _, Vh = np.linalg.svd(H)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vh))])
    R = (U @ S @ Vh).T
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = m1 - R @ m2
    return T


def _native_solve_pair(c1, r1, d1, c2, r2, d2, cfg):
    """One serial C++ reference-equivalent solve (roman_tpu.native
    clipper_ref.cpp — same math and iteration budget as _np_solve_pair,
    standing in for the reference's per-pair Eigen clipperpy loop).
    Returns (sel, T) or None if the native lib is unavailable."""
    from roman_tpu import native

    sel = native.clipper_ref_solve_native(
        c1, r1, d1, c2, r2, d2, cfg.sigma, cfg.epsilon, cfg.mindist,
        cfg.cos_min, cfg.cos_max)
    if sel is None:
        return None
    sel = [(int(a), int(b)) for a, b in sel]
    return sel, _arun_from_sel(c1, c2, sel)


def _pair_features(feats, i, j):
    f1, f2 = feats
    v1 = np.asarray(f1.valid[i])
    v2 = np.asarray(f2.valid[j])
    n1, n2 = int(v1.sum()), int(v2.sum())
    return (np.asarray(f1.centers[i])[:n1], np.asarray(f1.ratio_feats[i])[:n1],
            np.asarray(f1.descriptors[i])[:n1],
            np.asarray(f2.centers[j])[:n2], np.asarray(f2.ratio_feats[j])[:n2],
            np.asarray(f2.descriptors[j])[:n2])


def run_baseline(feats, cfg, n_sample=3):
    """Serial per-pair solve throughput with the same math + iteration
    budget (pairs spread across the grid for representative sizes).
    Prefers the native C++ solve (roman_tpu/native/clipper_ref.cpp, the
    honest stand-in for the reference's per-pair Eigen C++); falls back
    to the vectorized-numpy equivalent. Returns (pairs/s, engine)."""
    n0 = feats[0].centers.shape[0]
    n1 = feats[1].centers.shape[0]
    probe = _native_solve_pair(*_pair_features(feats, 0, 0), cfg)
    solve = _native_solve_pair if probe is not None else _np_solve_pair
    engine = "cpp" if probe is not None else "numpy"
    # materialize pair features BEFORE the timer: _pair_features fetches
    # device arrays, and each tunnel transfer costs ~1 s — timing them
    # would deflate the serial baseline and inflate vs_baseline
    sample = []
    for k in range(n_sample):
        i = (k * n0) // n_sample
        j = ((2 * k + 1) * n1) // (2 * n_sample)  # interleaved column spread
        sample.append(_pair_features(feats, i, j))
    t0 = time.perf_counter()
    for args in sample:
        solve(*args, cfg)
    dt = (time.perf_counter() - t0) / n_sample
    return 1.0 / dt, engine


def run_quality_comparison(feats, auxs, runs, cfg, res, pair_i, pair_j,
                           n_quality=100, min_assoc=4, seed=0):
    """Solver-parity evidence: run the serial numpy reference-equivalent
    over a stratified subset of the SAME pairs the batched engine solved
    and compare (a) association-set Jaccard, (b) LC decisions at the
    >=min_assoc threshold, (c) both engines' P/R vs sim GT on the subset.

    The subset is every GT-nearby pair (where loop closures live) plus a
    random fill of far pairs (where false positives live)."""
    T_ij_all = gt_relative_poses(auxs, runs, pair_i, pair_j)
    d_gt = np.linalg.norm(T_ij_all[:, :3, 3], axis=-1)
    near_idx = np.nonzero(d_gt < 30.0)[0]
    far_idx = np.nonzero(d_gt >= 30.0)[0]
    rng = np.random.default_rng(seed)
    if len(near_idx) > n_quality:
        # uniform sample (grid order would bias toward early submaps)
        print(f"# quality subset: sampling {n_quality} of {len(near_idx)} "
              "GT-nearby pairs", flush=True)
        near_idx = np.sort(rng.choice(near_idx, size=n_quality, replace=False))
    n_fill = max(n_quality - len(near_idx), 0)
    fill = rng.choice(far_idx, size=min(n_fill, len(far_idx)), replace=False)
    subset = np.concatenate([near_idx, fill]).astype(int)

    sel_eng = np.asarray(res.sel)
    cnt_eng = np.asarray(res.count)
    ok_eng = np.asarray(res.ok)
    T_eng = np.asarray(res.T_align)

    jaccards = []
    agree = 0
    base_ok, base_cnt, base_T = [], [], []
    for idx in subset:
        i, j = int(pair_i[idx]), int(pair_j[idx])
        sel_b, T_b = _np_solve_pair(*_pair_features(feats, i, j), cfg)
        set_b = set(sel_b)
        set_e = set(map(tuple, np.argwhere(sel_eng[idx])))
        union = len(set_b | set_e)
        jaccards.append(len(set_b & set_e) / union if union else 1.0)
        lc_b = len(sel_b) >= min_assoc and T_b is not None
        lc_e = bool(ok_eng[idx]) and int(cnt_eng[idx]) >= min_assoc
        agree += int(lc_b == lc_e)
        base_ok.append(T_b is not None)
        base_cnt.append(len(sel_b))
        base_T.append(T_b if T_b is not None else np.eye(4))

    T_sub = T_ij_all[subset]
    base_p, base_r = lc_quality_from_lists(
        np.array(base_ok), np.array(base_cnt), np.stack(base_T), T_sub,
        min_assoc=min_assoc)
    eng_p, eng_r = lc_quality_from_lists(
        ok_eng[subset], cnt_eng[subset], T_eng[subset], T_sub,
        min_assoc=min_assoc)
    return {
        "quality_pairs": len(subset),
        "assoc_jaccard_mean": round(float(np.mean(jaccards)), 3),
        "lc_decision_agreement": round(agree / max(len(subset), 1), 3),
        "baseline_lc_precision": round(base_p, 3),
        "baseline_lc_recall": round(base_r, 3),
        "engine_lc_precision_subset": round(eng_p, 3),
        "engine_lc_recall_subset": round(eng_r, 3),
    }


# v5e bf16 matmul peak, one chip (public spec: 197 TFLOP/s dense bf16)
_V5E_PEAK_TFLOPS = 197.0


def flops_per_pair(n, m, desc_dim, n_ratio, solver, refine_iters=6,
                   max_clique=64):
    """Analytic FLOP count of one fused registration (affinity build +
    CLIPPER homotopy + rounding + refinement), counting MXU matmul FLOPs
    and (N, N)-scale VPU elementwise ops. Matches the kernel structure
    in align/fused_register.py; the XLA engine computes the same
    algorithm with a fatter build, so this is a lower bound there.

    The workload is power-iteration-shaped: ~85% of the FLOPs are
    (1, N) x (N, N) matvecs whose MXU row utilization is 1/128 — see
    docs/PERF.md for why achievable MFU on this program is ~1% and what
    the speed-of-light for the shape actually is."""
    N = n * m
    matvec = 2.0 * N * N
    R = getattr(solver, "n_restarts", 1)   # restart rows ride the homotopy
    n_matvecs = (solver.warmup_iters       # warmup is single-row
                 + R * (solver.outer_iters * (solver.inner_iters + 1)
                        + 1)               # final Mu (omega + objective)
                 + 2 * refine_iters)       # support + zero-edge counts
    cb = 2.0 * N * (n + m) * 2             # rank-structured constraint
    n_cb = R * (solver.outer_iters * (solver.inner_iters + 1) + 1)
    build = (
        2 * (n * m * desc_dim * 2.0)       # cosine scores, both layouts
        + 2 * (n * m * max(n_ratio, 1) * 6.0)  # ratio geometric means
        + 7 * (N * m * n * 2.0)            # selector flatten matmuls
        + 12 * (N * n * 2.0)               # coordinate flattening
        + 25.0 * N * N                     # (N, N) broadcast build ops
        + 3.0 * N * N                      # zero-edge mask build
    )
    rounding = min(max_clique, min(n, m)) * 4 * (N * n * 2.0)
    return build + n_matvecs * matvec + n_cb * cb + rounding


def run_mapping_bench(n_frames=64, batch=16, obs_per_frame=24,
                      pts_per_obs=128, desc_dim=64, seed=0, repeats=3,
                      with_agreement=False):
    """Mapping throughput: the device-resident BatchMapper over a synthetic
    observation stream, one dispatch per batch of frames (the reference hot
    loop is mapper.py:47-142, one python update per frame).

    with_agreement additionally runs the HOST reference Mapper over the
    same stream and returns a symmetric center-match agreement scalar
    (fraction of each map's segments with a counterpart within 1 m in the
    other, averaged) — a quality referee pinned to the speed metric so
    mapper throughput can never improve by silently diverging from the
    reference semantics. Returns fps or (fps, agreement)."""
    from roman_tpu.data.camera import CameraParams
    from roman_tpu.map.batch_mapper import BatchMapper
    from roman_tpu.params.mapper_params import MapperParams

    rng = np.random.default_rng(seed)
    O, Q = obs_per_frame, pts_per_obs
    centers = np.stack([
        np.linspace(0.0, 120.0, 150),
        rng.uniform(-6, 6, 150),
        rng.uniform(0, 2, 150),
    ], axis=1)
    descs = rng.normal(size=(150, desc_dim)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=-1, keepdims=True)

    times = np.arange(n_frames) * (1.0 / 6.0)
    poses = np.broadcast_to(np.eye(4), (n_frames, 4, 4)).copy()
    poses[:, 0, 3] = times * 1.5  # 1.5 m/s forward
    pts = np.zeros((n_frames, O, Q, 3), np.float32)
    val = np.zeros((n_frames, O, Q), bool)
    desc = np.zeros((n_frames, O, desc_dim), np.float32)
    mask = np.zeros((n_frames, O), bool)
    for f in range(n_frames):
        near = np.flatnonzero(
            np.abs(centers[:, 0] - poses[f, 0, 3]) < 8.0)[:O]
        Ti = np.linalg.inv(poses[f])
        for k, i in enumerate(near):
            pw = centers[i] + rng.normal(size=(Q, 3)).astype(np.float32) * 0.2
            pts[f, k] = pw @ Ti[:3, :3].T + Ti[:3, 3]
            val[f, k] = True
            desc[f, k] = descs[i]
            mask[f, k] = True

    params = MapperParams(min_sightings=2, max_t_no_sightings=2.0,
                          geometric_score_range=(0.1, 1.0))
    mapper = BatchMapper(params, CameraParams.simple(), desc_dim=desc_dim,
                         obs_capacity=O)

    def feed():
        for s in range(0, n_frames, batch):
            e = min(s + batch, n_frames)
            mapper.update_batch(times[s:e], poses[s:e], pts[s:e], val[s:e],
                                desc[s:e], mask[s:e])

    feed()  # warmup/compile (also populates the map: realistic occupancy)
    # Snapshot the post-warmup MapState (an immutable jax pytree) and
    # reset to it before each timed repeat, so every repeat runs the SAME
    # workload on the SAME map occupancy — without this, repeats mutate
    # the map progressively (more merges, fewer spawns) and min-of-N can
    # pick a structurally lighter pass instead of the least-noisy run.
    state0 = mapper.state
    dt = np.inf  # best-of: tunnel/queueing noise only ever adds time
    for _ in range(repeats):
        mapper.state = state0
        t0 = time.perf_counter()
        feed()
        np.asarray(mapper.state.next_id)  # force
        dt = min(dt, time.perf_counter() - t0)
    fps = n_frames / dt
    if not with_agreement:
        return fps

    # quality referee: one clean single-pass device map vs the host
    # reference Mapper on the identical stream (tests pin the same
    # comparison; this surfaces it next to the speed number). The device
    # side replays the stream through update_batch — the same batched
    # entry point the timed path uses — so the referee scores the actual
    # fast path AND costs batches, not per-frame tunnel dispatches
    # (~1 s/transfer here makes 64 single-frame update() calls ~a minute
    # of pure tunnel overhead).
    from roman_tpu.map.mapper import Mapper
    from roman_tpu.map.observation import Observation

    dev2 = BatchMapper(params, CameraParams.simple(), desc_dim=desc_dim,
                       obs_capacity=O)
    host = Mapper(params, CameraParams.simple())
    for s in range(0, n_frames, batch):
        e = min(s + batch, n_frames)
        dev2.update_batch(times[s:e], poses[s:e], pts[s:e], val[s:e],
                          desc[s:e], mask[s:e])
    for f in range(n_frames):
        obs = [Observation(time=float(times[f]), pose=poses[f],
                           point_cloud=pts[f, k][val[f, k]],
                           semantic_descriptor=desc[f, k])
               for k in range(O) if mask[f, k]]
        host.update(float(times[f]), poses[f], obs)
    dev_segs = dev2.get_roman_map().segments
    host_segs = host.get_roman_map().segments
    if not dev_segs or not host_segs:
        return fps, 0.0
    dc = np.stack([np.asarray(s.center) for s in dev_segs])
    hc = np.stack([np.asarray(s.center) for s in host_segs])
    d = np.linalg.norm(hc[:, None] - dc[None, :], axis=-1)
    agreement = 0.5 * ((d.min(axis=1) < 1.0).mean()
                       + (d.min(axis=0) < 1.0).mean())
    return fps, float(agreement)


def run_perception_bench(batch=8, height=480, width=640, repeats=3):
    """Optional second metric: perception front-end frames/sec
    (segmentation + DINOv2 + lifting; the reference's per-frame torch
    pipeline is 'slower than real-time without GPU', README.md:78-80)."""
    import numpy as np

    from roman_tpu.data.camera import CameraParams
    from roman_tpu.params.fastsam_params import FastSAMParams
    from roman_tpu.perception.wrapper import PerceptionFrontend

    cam = CameraParams.simple(width=width, height=height)
    params = FastSAMParams(imgsz=(256, 256), batch_frames=batch,
                           max_masks_per_frame=64, max_points_per_mask=256)
    fe = PerceptionFrontend(params, cam)
    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(batch, height, width, 3)).astype(np.float32)
    depths = rng.uniform(1.0, 6.0, size=(batch, height, width)).astype(np.float32)
    fe.run_batch(imgs, depths)  # warmup/compile
    dt = np.inf  # best-of: tunnel/queueing noise only ever adds time
    for _ in range(repeats):
        t0 = time.perf_counter()
        fe.run_batch(imgs, depths)
        dt = min(dt, time.perf_counter() - t0)
    return batch / dt


def run_perception_torch_anchor(frames=2, height=480, width=640, repeats=2):
    """Judgment anchor for perception_frames_per_sec: the reference's
    image embedder (DINOv2-base, fastsam_wrapper.py:181-188) as
    transformers' torch Dinov2Model on THIS host's CPU, random weights,
    per-frame inference like the reference's loop, at the SAME camera
    resolution as run_perception_bench (floored to the 14-px patch grid,
    exactly like PerceptionFrontend's vit_in resize — wrapper.py:224-226),
    so per-frame ViT work matches token-for-token. DINOv2 is only PART
    of the reference's per-frame stack (it also runs FastSAM-x
    segmentation + per-mask torch post-processing), so the resulting
    perception_vs_torch_cpu still UNDERSTATES the true pipeline
    speedup."""
    import torch
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(0)
    model = Dinov2Model(Dinov2Config()).eval()  # base: 768w, 12 layers
    gh = (height // 14) * 14
    gw = (width // 14) * 14
    x = torch.rand(1, 3, gh, gw)
    with torch.no_grad():
        model(x)  # warmup
        dt = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(frames):
                model(x)
            dt = min(dt, time.perf_counter() - t0)
    return frames / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--desc-dim", type=int, default=768)
    ap.add_argument("--baseline-samples", type=int, default=8)
    ap.add_argument("--quality-pairs", type=int, default=100,
                    help="pairs for the serial-solver agreement comparison "
                         "(0 disables)")
    ap.add_argument("--cpu", action="store_true", help="force jax to CPU")
    ap.add_argument("--no-pallas", action="store_true",
                    help="skip the fused pallas engine (XLA path only)")
    ap.add_argument("--no-mapping", action="store_true",
                    help="skip the device-mapper throughput metric")
    ap.add_argument("--no-perception", action="store_true",
                    help="skip the perception frames/sec metric (saves its "
                         "one-time compile)")
    ap.add_argument("--profile", type=str, default=None, metavar="DIR",
                    help="capture a JAX profiler trace to DIR")
    ap.add_argument("--robots", type=int, default=2,
                    help="robots in the sim world; >2 additionally runs "
                         "the all-robot-pairs sweep in one dispatch")
    ap.add_argument("--solver-iters", type=int, nargs=3, default=None,
                    metavar=("WARMUP", "OUTER", "INNER"),
                    help="override the engine's ClipperSolveParams "
                         "iteration budget (the serial baseline keeps the "
                         "reference-grade fixed budget, so quality fields "
                         "measure the reduced budget's cost)")
    ap.add_argument("--pairs-per-step", type=int, default=None,
                    help="override pallas_pairs_per_step (K)")
    ap.add_argument("--restarts", type=int, default=None,
                    help="override ClipperSolveParams.n_restarts: R "
                         "perturbed homotopy starts per pair, solved as "
                         "extra rows of the same per-pair MXU matvec; the "
                         "best feasible-omega restart wins (the serial "
                         "baseline stays single-start by design)")
    ap.add_argument("--capacity", type=int, default=40,
                    help="submap capacity (objects per submap; reference "
                         "SubmapParams.max_size knob, map.py:165-192). "
                         "Pallas K auto-scales down with capacity; when "
                         "even K=1 overflows VMEM the registrar falls "
                         "back to the XLA engine")
    args = ap.parse_args()

    if args.profile:
        import atexit

        import jax

        jax.profiler.start_trace(args.profile)
        atexit.register(jax.profiler.stop_trace)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # TPU-tunnel watchdog: jax.devices() blocks indefinitely in C
        # land when the axon tunnel is down, which would hang the whole
        # bench. Probe it on a side thread; if the backend doesn't come
        # up in time, emit a machine-readable error line and exit
        # nonzero instead of hanging.
        import threading

        probe_ok = []

        def _probe():
            import jax

            probe_ok.append(len(jax.devices()))

        th = threading.Thread(target=_probe, daemon=True)
        th.start()
        th.join(timeout=float(os.environ.get("BENCH_TPU_TIMEOUT", "300")))
        if not probe_ok:
            print(json.dumps({
                "metric": "submap_align_pairs_per_sec", "value": None,
                "unit": "pairs/s", "vs_baseline": None,
                "error": "tpu backend unavailable (tunnel down?) — "
                         "rerun when the chip is reachable, or use --cpu",
            }), flush=True)
            os._exit(3)

    submaps, feats, auxs, cfg, runs = build_workload(
        desc_dim=args.desc_dim, n_robots=args.robots,
        max_size=args.capacity)
    if args.solver_iters or args.pairs_per_step or args.restarts:
        import dataclasses as _dc

        from roman_tpu.align.clipper import ClipperSolveParams

        if args.solver_iters:
            w, o, i = args.solver_iters
            cfg = _dc.replace(cfg, solver=ClipperSolveParams(
                warmup_iters=w, outer_iters=o, inner_iters=i))
        if args.restarts:
            cfg = _dc.replace(
                cfg, solver=cfg.solver.replace(n_restarts=args.restarts))
        if args.pairs_per_step:
            cfg = _dc.replace(cfg, pallas_pairs_per_step=args.pairs_per_step)
    P, xla_pps, res_xla, pair_i, pair_j, _ = run_tpu(
        feats[:2], auxs[:2], cfg, chunk_size=args.chunk, repeats=args.repeats)

    # fused VMEM-resident pallas engine (TPU only; measured ~2.1x the XLA
    # path on v5e, so it is the headline path when available)
    pallas_pps, res_pal, pallas_ran = None, None, False
    if not args.no_pallas and not args.cpu:
        import dataclasses as _dc

        # auto-scale pallas K with capacity: VMEM holds ~K+1 bf16
        # (N, N) matrices (K pair matrices + the shared zero-edge mask)
        # inside a ~100 MB budget; larger capacities need smaller K, and
        # when even K=1 overflows, PairGridRegistrar's dispatch-time
        # fallback lands on the XLA engine
        if args.pairs_per_step is None:
            from roman_tpu.align.fused_register import max_pairs_per_step

            k_auto = max_pairs_per_step(args.capacity * args.capacity)
            cfg = _dc.replace(
                cfg, pallas_pairs_per_step=max(min(k_auto, 4), 1))
        cfg_pal = _dc.replace(cfg, use_pallas=True)
        try:
            _, pallas_pps, res_pal, _, _, pallas_ran = run_tpu(
                feats, auxs, cfg_pal, chunk_size=args.chunk,
                repeats=args.repeats)
        except Exception as e:  # non-TPU backend or Mosaic failure
            print(f"# pallas path unavailable: {type(e).__name__}: {e}",
                  flush=True)

    # pallas_ran=False means the registrar's dispatch-time fallback ran
    # the XLA engine under the pallas label — report it as what it was
    use_pal = pallas_pps is not None and pallas_ran and pallas_pps > xla_pps
    pps = pallas_pps if use_pal else xla_pps
    res = res_pal if use_pal else res_xla

    base_pps, base_engine = run_baseline(feats[:2], cfg,
                                         n_sample=args.baseline_samples)
    lc_p, lc_r = compute_lc_quality(res, auxs, runs, pair_i, pair_j)
    record = {
        "metric": "submap_align_pairs_per_sec",
        "value": round(pps, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pps / base_pps, 2),
        "pairs": P,
        "engine": "pallas_fused" if use_pal else "xla",
        "xla_pairs_per_sec": round(xla_pps, 2),
        "baseline_pairs_per_sec": round(base_pps, 3),
        "baseline_engine": base_engine,
        "lc_precision": round(lc_p, 3),
        "lc_recall": round(lc_r, 3),
        "submap_capacity": args.capacity,
        "desc_dim": args.desc_dim,
    }
    # MFU accounting (docs/PERF.md): analytic FLOPs of the winning engine
    # at its measured throughput vs the chip's dense-bf16 peak
    fpp = flops_per_pair(args.capacity, args.capacity, args.desc_dim, 4,
                         cfg.solver)
    record["flops_per_pair"] = round(fpp / 1e6, 1)  # MFLOP
    record["achieved_tflops"] = round(pps * fpp / 1e12, 3)
    record["mfu"] = round(pps * fpp / 1e12 / _V5E_PEAK_TFLOPS, 5)
    if pallas_pps is not None and pallas_ran:
        record["pallas_pairs_per_sec"] = round(pallas_pps, 2)
    if args.solver_iters:
        record["solver_iters"] = args.solver_iters
    if args.restarts:
        record["n_restarts"] = args.restarts
    if args.pairs_per_step:
        record["pairs_per_step"] = args.pairs_per_step
    if args.robots > 2:
        import dataclasses as _dc

        cfg_mr = (_dc.replace(cfg, use_pallas=True)
                  if use_pal and not args.cpu else cfg)
        mr_pairs, mr_pps = run_multirobot(feats, auxs, cfg_mr,
                                          chunk_size=args.chunk)
        record["multirobot_pairs"] = mr_pairs
        record["multirobot_pairs_per_sec"] = round(mr_pps, 2)
        record["robots"] = args.robots
    if args.quality_pairs > 0:
        record.update(run_quality_comparison(
            feats[:2], auxs, runs, cfg, res, pair_i, pair_j,
            n_quality=args.quality_pairs))
    if not args.no_mapping:
        map_fps, map_agree = run_mapping_bench(with_agreement=True)
        record["mapping_frames_per_sec"] = round(map_fps, 2)
        record["mapping_host_agreement"] = round(map_agree, 3)
    if not args.no_perception and not args.cpu:
        record["perception_frames_per_sec"] = round(run_perception_bench(), 2)
        try:  # reference-stack anchor (see run_perception_torch_anchor)
            tfps = run_perception_torch_anchor()
            record["perception_torch_cpu_fps"] = round(tfps, 2)
            record["perception_vs_torch_cpu"] = round(
                record["perception_frames_per_sec"] / tfps, 1)
        except Exception as e:  # torch/transformers unavailable
            print(f"# torch anchor unavailable: {type(e).__name__}: {e}",
                  flush=True)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
