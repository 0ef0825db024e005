"""All-pairs submap alignment — the north-star hot loop, batched on TPU.

Reference behavior: roman/align/submap_align.py iterates the (i, j) submap
pair grid serially, running one C++ CLIPPER solve + Arun SVD per pair
(:93-201). Here the entire pair grid is packed into padded tensors and
registered by ONE jit'd batched program (chunked to bound memory,
optionally sharded over a device mesh along the pair axis), then the same
gating, post-filters, error metrics and result matrices as the reference
are filled in.

Pipeline semantics preserved:
- distance / AABB gating into robots_nearby (:96-103)
- shared-segment removal for single-robot loop closure (:108-115)
- GT relative pose + yaw difference (:117-129)
- submap-descriptor cosine gate (:131-149)
- skip_distance hard gate (:136-142)
- upside-down rejection and roll/pitch removal (:167-172)
- per-pair angular/translation error vs (GT) relative pose (:159-175)
- result matrices incl. percent associations (:186-200)
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from roman_tpu.align import registration as reg
from roman_tpu.align.registration import RegistrationConfig, RegistrationResult
from roman_tpu.align.results import SubmapAlignResults, save_submap_align_results
from roman_tpu.map.roman_map import (
    RomanMap,
    Submap,
    SubmapParams,
    load_roman_map,
    submaps_from_roman_map,
    submaps_to_features,
)
from roman_tpu.data.pose_data import PoseData
from roman_tpu.ops import se3_np
from roman_tpu.params.submap_align_params import (
    SubmapAlignInputOutput,
    SubmapAlignParams,
)
from roman_tpu.utils import aabb_intersects, expandvars_recursive


def _pack_result(res: RegistrationResult) -> jax.Array:
    """Flatten a batched RegistrationResult into ONE small int32 array.

    Host<->device transfers on the tunneled deployment cost fixed latency
    PER ARRAY plus size-dependent tunnel time, so fetching the 6 result
    fields separately (and sel at one f32 per bool) dominated the wall
    clock of a batched dispatch. Layout along the last axis:
    [sel bitfield (ceil(n*m/32) words, little-endian within each word),
     count (1), T_align (16, f32 bitcast), ok (1), score (1, f32
     bitcast), converged (1 if present)]. Exact: ints stay ints, floats
    are bitcast. The solver certificate u is debug-only and dropped."""
    batch = res.sel.shape[:-2]
    nm = res.sel.shape[-2] * res.sel.shape[-1]
    words = (nm + 31) // 32
    bits = res.sel.reshape(batch + (nm,)).astype(jnp.int32)
    pad = words * 32 - nm
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(batch + (pad,), jnp.int32)], axis=-1)
    shifts = jnp.arange(32, dtype=jnp.int32)
    packed_sel = jnp.sum(
        bits.reshape(batch + (words, 32)) << shifts, axis=-1)
    f2i = lambda x: jax.lax.bitcast_convert_type(
        x.astype(jnp.float32), jnp.int32)
    cols = [
        packed_sel,
        res.count[..., None].astype(jnp.int32),
        f2i(res.T_align).reshape(batch + (16,)),
        res.ok[..., None].astype(jnp.int32),
        f2i(res.score)[..., None],
    ]
    if res.converged is not None:
        cols.append(res.converged[..., None].astype(jnp.int32))
    return jnp.concatenate(cols, axis=-1)


def _unpack_result(arr: np.ndarray, n: int, m: int,
                   has_converged: bool) -> RegistrationResult:
    """Inverse of _pack_result over a host numpy array (..., W)."""
    nm = n * m
    words = (nm + 31) // 32
    bits = (arr[..., :words, None] >> np.arange(32)) & 1
    sel = bits.reshape(arr.shape[:-1] + (words * 32,))[..., :nm]
    sel = sel.reshape(arr.shape[:-1] + (n, m)) > 0
    i2f = lambda x: x.astype(np.int32).view(np.float32)
    count = arr[..., words].astype(np.int32)
    T = i2f(arr[..., words + 1:words + 17]).reshape(arr.shape[:-1] + (4, 4))
    ok = arr[..., words + 17] > 0
    score = i2f(arr[..., words + 18])
    converged = arr[..., words + 19] > 0 if has_converged else None
    return RegistrationResult(sel=sel, count=count, T_align=T, ok=ok,
                              u=None, score=score, converged=converged)


# in-program rescue: fixed number of unconverged-pair slots re-solved at
# RESCUE_SOLVER budget INSIDE the batched program (lax.cond-gated, so a
# fully-converged dispatch skips the work at runtime). Sized ~3x the
# worst observed unconverged count on the flagship workload (2-3 of 506
# pairs); overflow rows keep converged=False/rescued=False and fall back
# to the host re-dispatch path, which costs the ~1 s tunnel round trip
# the in-program path exists to avoid (docs/PERF.md).
RESCUE_CAP = 8


class PairGridRegistrar:
    """Registers arbitrary batches of submap pairs with one compiled program.

    Compiles once per (chunk_size, capacity, feature-dims) signature; the
    pair list is processed in padded chunks. With a mesh, the chunk's pair
    axis is sharded across devices (features are gathered per pair, so no
    cross-device communication is needed during the solve).
    """

    def __init__(self, cfg: RegistrationConfig, single_robot_lc: bool = False,
                 chunk_size: int = 64, mesh=None, donate: bool = True,
                 _is_rescue: bool = False):
        self.cfg = cfg
        self.single_robot_lc = single_robot_lc
        self.mesh = mesh
        if mesh is not None:
            n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
            chunk_size = max(chunk_size, n_dev)
            chunk_size = ((chunk_size + n_dev - 1) // n_dev) * n_dev
        self.chunk_size = chunk_size
        self._jitted = {}
        self._is_rescue = _is_rescue
        self._rescue = None

    def _rescue_registrar(self) -> "PairGridRegistrar":
        """Registrar for re-solving unconverged pairs at RESCUE_SOLVER
        budget (registration.register_clipper_rescued docstring). XLA
        engine, small fixed chunk: one extra compiled signature, cached
        across calls."""
        if self._rescue is None:
            import dataclasses

            rcfg = dataclasses.replace(
                self.cfg, solver=reg.rescue_solver(self.cfg.solver),
                use_pallas=False)
            self._rescue = PairGridRegistrar(
                rcfg, self.single_robot_lc,
                chunk_size=min(self.chunk_size, 16), _is_rescue=True)
        return self._rescue

    def _apply_rescue(self, res, feats1, feats2, ids1_all, ids2_all,
                      pair_i, pair_j, seed, already_rescued=None):
        """Re-solve pairs whose homotopy ran out of iteration budget
        (res.converged False) and splice the high-budget results back.

        already_rescued marks rows the IN-PROGRAM rescue stage handled
        (their converged flag may honestly remain False when even the big
        budget cannot finish — re-dispatching those at the same budget
        would reproduce the identical result for a wasted tunnel round
        trip). Only overflow rows (> RESCUE_CAP unconverged in one
        dispatch) reach the re-dispatch here."""
        if self._is_rescue or res is None or res.converged is None:
            return res
        bad = ~np.asarray(res.converged)
        if already_rescued is not None:
            bad &= ~np.asarray(already_rescued)
        bad = np.flatnonzero(bad)
        if bad.size == 0:
            return res
        r2 = self._rescue_registrar()(
            feats1, feats2, ids1_all, ids2_all,
            np.asarray(pair_i)[bad], np.asarray(pair_j)[bad], seed=seed)
        return reg.splice_rescued(res, r2, bad)

    def _registration_fn(self, cfg=None):
        def fn(feats1, feats2, ids1_all, ids2_all, idx_i, idx_j, key):
            # gather per-pair features ON DEVICE (host gathers would
            # round-trip through the TPU tunnel per chunk)
            f1 = jax.tree.map(lambda x: x[idx_i], feats1)
            f2 = jax.tree.map(lambda x: x[idx_j], feats2)
            ids1 = ids1_all[idx_i]
            ids2 = ids2_all[idx_j]
            return self._register(f1, f2, ids1, ids2, key, cfg=cfg)

        return fn

    def _register(self, f1, f2, ids1, ids2, key, cfg=None):
        cfg = cfg if cfg is not None else self.cfg
        if self.single_robot_lc:
            # remove segments whose ids appear in both submaps
            # (submap_align.py:108-115)
            shared1 = jnp.any(
                ids1[..., :, None] == jnp.where(f2.valid, ids2, -2)[..., None, :],
                axis=-1,
            )
            shared2 = jnp.any(
                ids2[..., :, None] == jnp.where(f1.valid, ids1, -2)[..., None, :],
                axis=-1,
            )
            f1 = f1.replace(valid=f1.valid & ~shared1)
            f2 = f2.replace(valid=f2.valid & ~shared2)
        if cfg.method == "ransac":
            res = reg.register_ransac(f1, f2, cfg, key)
        elif cfg.method == "clipper+prune":
            res = reg.register_clipper_prune(
                f1, f2, cfg,
                pca_attrs1=f1.ratio_feats[..., :3] if f1.ratio_feats.shape[-1] >= 3 else None,
                volume1=f1.ratio_feats[..., 3] if f1.ratio_feats.shape[-1] >= 4 else None,
                pca_attrs2=f2.ratio_feats[..., :3] if f2.ratio_feats.shape[-1] >= 3 else None,
                volume2=f2.ratio_feats[..., 3] if f2.ratio_feats.shape[-1] >= 4 else None,
                descriptors1=f1.descriptors if f1.descriptors.shape[-1] else None,
                descriptors2=f2.descriptors if f2.descriptors.shape[-1] else None,
            )
        else:
            res = reg.register_clipper(f1, f2, cfg)
        return res

    def _fallback_to_xla(self, err):
        """Drop the pallas fast path for this registrar (e.g. Mosaic
        VMEM overflow at large submap capacity) and recompile on the
        plain-XLA engine. Quality is unaffected — the two paths are
        bit-equal (test_fused_register.py)."""
        import dataclasses

        print(f"# PairGridRegistrar: pallas path failed "
              f"({type(err).__name__}); falling back to XLA engine",
              flush=True)
        self.cfg = dataclasses.replace(self.cfg, use_pallas=False)
        self._jitted = {}

    def _inprog_rescue(self) -> bool:
        """True when the compiled program rescues unconverged pairs
        itself (and its packed output carries one extra 'rescued' int32
        column). Meshes keep the host re-dispatch: the rescue stage
        gathers/scatters across the GLOBAL pair axis, which under
        shard_map would need collectives for a stage that is almost
        always runtime-skipped."""
        return (self.mesh is None and not self._is_rescue
                and self.cfg.method != "ransac")

    def _get_jitted(self, sig):
        """One compiled program processing ALL chunks: lax.map over the
        chunk axis keeps peak memory at one chunk while giving a single
        dispatch + a single result fetch (host<->device round trips on this
        deployment cost ~1s each regardless of size, so dispatch/fetch
        COUNT dominates the wall clock). Unconverged pairs are re-solved
        at RESCUE_SOLVER budget inside the same program (lax.cond-gated,
        up to RESCUE_CAP of them) so the common 1-3-unconverged case costs
        no extra dispatch/fetch round trip."""
        if sig not in self._jitted:
            fn = self._registration_fn()
            rescue_fn = None
            if self._inprog_rescue():
                import dataclasses

                rcfg = dataclasses.replace(
                    self.cfg, solver=reg.rescue_solver(self.cfg.solver))
                rescue_fn = self._registration_fn(rcfg)
            if self.mesh is not None:
                # explicit SPMD: each device registers its shard of the
                # chunk's pair axis (features replicated — they're tiny,
                # SURVEY §2.4 — so no collectives during the solve). Unlike
                # sharding constraints, shard_map also partitions pallas
                # kernels correctly on real meshes.
                from jax.sharding import PartitionSpec as P

                axis = self.mesh.axis_names[0]
                specs = dict(
                    in_specs=(P(), P(), P(), P(), P(axis), P(axis), P()),
                    out_specs=P(axis),
                )
                if hasattr(jax, "shard_map"):  # jax >= 0.8
                    fn = jax.shard_map(fn, mesh=self.mesh, check_vma=False,
                                       **specs)
                else:
                    from jax.experimental.shard_map import shard_map

                    fn = shard_map(fn, mesh=self.mesh, check_rep=False,
                                   **specs)

            def all_chunks(feats1, feats2, ids1_all, ids2_all, idx_i, idx_j,
                           valid, key):
                # idx_i/idx_j/valid: (n_chunks, C); valid False on the
                # pad rows of the last chunk
                def one(chunk):
                    ci, cj = chunk
                    return fn(feats1, feats2, ids1_all, ids2_all, ci, cj, key)

                packed = _pack_result(jax.lax.map(one, (idx_i, idx_j)))
                if rescue_fn is None:
                    return packed
                nc, C, W = packed.shape
                T = nc * C
                cap = min(RESCUE_CAP, T)
                flat = packed.reshape(T, W)
                # converged is the last packed column (see _pack_result)
                bad = (flat[:, -1] <= 0) & valid.reshape(T)
                n_bad = jnp.sum(bad.astype(jnp.int32))

                def do_rescue(flat):
                    order = jnp.argsort(~bad)  # stable: bad rows first
                    slots = order[:cap]        # unique (permutation slice)
                    slot_ok = bad[slots]
                    rp = _pack_result(rescue_fn(
                        feats1, feats2, ids1_all, ids2_all,
                        idx_i.reshape(T)[slots], idx_j.reshape(T)[slots],
                        key))
                    rows = jnp.where(slot_ok[:, None], rp, flat[slots])
                    rescued = jnp.zeros((T,), jnp.int32).at[slots].set(
                        slot_ok.astype(jnp.int32))
                    return flat.at[slots].set(rows), rescued

                flat, rescued = jax.lax.cond(
                    n_bad > 0, do_rescue,
                    lambda f: (f, jnp.zeros((T,), jnp.int32)), flat)
                out = jnp.concatenate([flat, rescued[:, None]], axis=-1)
                return out.reshape(nc, C, W + 1)

            self._jitted[sig] = jax.jit(all_chunks)
        return self._jitted[sig]

    def __call__(self, feats1, feats2, ids1_all, ids2_all, pair_i, pair_j,
                 seed: int = 0, timed: bool = False):
        """feats*: SubmapFeatures over all submaps of each robot;
        pair_i/pair_j: (P,) submap indices to register. Returns batched
        RegistrationResult as numpy-backed arrays of length P.

        timed=True dispatches chunk by chunk and additionally returns a
        (P,) array of per-pair wall times (chunk time / chunk size) — the
        closest honest per-pair attribution a batched engine can give
        (reference submap_align.py:153-157 times each pair's solve). It
        costs one dispatch+fetch round trip per chunk, so the default is
        the single-dispatch program."""
        import jax.numpy as jnp

        P = len(pair_i)
        if P == 0:
            return (None, np.zeros(0)) if timed else None
        C = self.chunk_size
        n_chunks = (P + C - 1) // C
        total = n_chunks * C
        idx_i = np.zeros(total, np.int32)
        idx_j = np.zeros(total, np.int32)
        idx_i[:P] = pair_i
        idx_j[:P] = pair_j
        valid = np.zeros(total, bool)
        valid[:P] = True
        key = jax.random.PRNGKey(seed)

        n_cap, m_cap = feats1.capacity, feats2.capacity
        has_conv = self.cfg.method != "ransac"

        def split_rescued(packed):
            # the in-program rescue appends one 'rescued' int32 column
            if not self._inprog_rescue():
                return packed, None
            return packed[..., :-1], packed[..., -1] > 0

        if timed:
            chunks = []
            times = np.zeros(total)
            for c in range(n_chunks):
                t0 = time.perf_counter()
                args = (feats1, feats2, jnp.asarray(ids1_all),
                        jnp.asarray(ids2_all),
                        jnp.asarray(idx_i[c * C:(c + 1) * C].reshape(1, C)),
                        jnp.asarray(idx_j[c * C:(c + 1) * C].reshape(1, C)),
                        jnp.asarray(valid[c * C:(c + 1) * C].reshape(1, C)),
                        key)
                try:
                    r = np.asarray(self._get_jitted((C, 1))(*args))
                except Exception as e:
                    if not self.cfg.pallas_enabled():
                        raise
                    self._fallback_to_xla(e)
                    r = np.asarray(self._get_jitted((C, 1))(*args))
                dt = time.perf_counter() - t0
                times[c * C:(c + 1) * C] = dt / C
                chunks.append(r)
            packed = np.concatenate(chunks, axis=0)
            packed = packed.reshape((total,) + packed.shape[2:])[:P]
            packed, rescued = split_rescued(packed)
            res = _unpack_result(packed, n_cap, m_cap, has_conv)
            res = self._apply_rescue(res, feats1, feats2, ids1_all,
                                     ids2_all, pair_i, pair_j, seed,
                                     already_rescued=rescued)
            return res, times[:P]

        args = (feats1, feats2, jnp.asarray(ids1_all), jnp.asarray(ids2_all),
                jnp.asarray(idx_i.reshape(n_chunks, C)),
                jnp.asarray(idx_j.reshape(n_chunks, C)),
                jnp.asarray(valid.reshape(n_chunks, C)), key)
        try:
            packed = np.asarray(self._get_jitted((C, n_chunks))(*args))
        except Exception as e:
            if not self.cfg.pallas_enabled():
                raise
            self._fallback_to_xla(e)
            packed = np.asarray(self._get_jitted((C, n_chunks))(*args))
        packed = packed.reshape((total,) + packed.shape[2:])[:P]
        packed, rescued = split_rescued(packed)
        res = _unpack_result(packed, n_cap, m_cap, has_conv)
        return self._apply_rescue(res, feats1, feats2, ids1_all, ids2_all,
                                  pair_i, pair_j, seed,
                                  already_rescued=rescued)


def submap_align(sm_params: SubmapAlignParams, sm_io: SubmapAlignInputOutput,
                 mesh=None, chunk_size: int = 64,
                 precomputed_submaps: Optional[List[List[Submap]]] = None,
                 roman_maps: Optional[List[RomanMap]] = None) -> SubmapAlignResults:
    """Full alignment stage; drop-in equivalent of reference submap_align
    (submap_align.py:28-220), writing the same artifact set."""
    import os

    # --- load ground truth pose data (submap_align.py:41-58) ---
    gt_pose_data = [None, None]
    for i, yaml_file in enumerate(sm_io.input_gt_pose_yaml):
        if yaml_file is not None:
            import yaml as _yaml

            if sm_io.robot_env is not None:
                os.environ[sm_io.robot_env] = sm_io.robot_names[i]
            with open(expandvars_recursive(yaml_file)) as f:
                gt_args = _yaml.safe_load(f)
            gt_pose_data[i] = PoseData.from_yaml_spec(gt_args)

    # --- load maps, build submaps (submap_align.py:60-65) ---
    if roman_maps is None:
        assert sm_io.input_type_pkl, "only pkl input supported"
        roman_maps = [load_roman_map(sm_io.inputs[i]) for i in range(2)]
    if precomputed_submaps is None:
        submap_params = SubmapParams.from_submap_align_params(sm_params)
        submap_params.use_minimal_data = True
        submaps = [
            submaps_from_roman_map(roman_maps[i], submap_params, gt_pose_data[i])
            for i in range(2)
        ]
    else:
        submaps = precomputed_submaps

    total_t0 = time.time()
    cfg = sm_params.get_registration_config()
    results = align_submap_lists(
        submaps, cfg, sm_params, sm_io, gt_pose_data, mesh=mesh, chunk_size=chunk_size
    )
    results.total_time = time.time() - total_t0

    save_submap_align_results(results, submaps, roman_maps)
    return results


def align_submap_lists(submaps, cfg: RegistrationConfig,
                       sm_params: SubmapAlignParams, sm_io: SubmapAlignInputOutput,
                       gt_pose_data=[None, None], mesh=None, chunk_size: int = 64,
                       ) -> SubmapAlignResults:
    """Core grid alignment on prebuilt submap lists (device part)."""
    n0, n1 = len(submaps[0]), len(submaps[1])
    cap = sm_params.submap_max_size

    if n0 == 0 or n1 == 0:
        # A degenerate map (e.g. perception produced no segments) must
        # not kill the multi-stage pipeline: emit a well-formed empty
        # result so the g2o/json artifacts exist with zero loop closures
        # and the rpgo stage still runs on odometry (failure-recovery
        # posture; the reference has no equivalent guard and crashes).
        nanmat = np.full((n0, n1), np.nan)
        return SubmapAlignResults(
            robots_nearby_mat=nanmat.copy(),
            clipper_angle_mat=nanmat.copy(),
            clipper_dist_mat=nanmat.copy(),
            clipper_num_associations=np.zeros((n0, n1), int),
            similarity_mat=None,
            submap_yaw_diff_mat=nanmat.copy(),
            associated_objs_mat=[[np.zeros((0, 2), int)] * n1] * n0,
            T_ij_mat=np.zeros((n0, n1, 4, 4)),
            T_ij_hat_mat=np.full((n0, n1, 4, 4), np.nan),
            timing_list=[],
            submap_align_params=sm_params,
            submap_io=sm_io,
        )

    feats = []
    auxs = []
    desc_dim = sm_params.semantics_dim if cfg.feature_flags[4] or cfg.method == "clipper+prune" else 0
    for k in range(2):
        f, aux = submaps_to_features(submaps[k], cfg, capacity=cap, desc_dim=desc_dim)
        feats.append(f)
        auxs.append(aux)

    # ---- host-side gating (submap_align.py:96-149) ----
    pos0 = (auxs[0]["positions_gt"] if auxs[0]["positions_gt"] is not None
            else auxs[0]["positions"])
    pos1 = (auxs[1]["positions_gt"] if auxs[1]["positions_gt"] is not None
            else auxs[1]["positions"])
    dist = np.linalg.norm(pos0[:, None, :] - pos1[None, :, :], axis=-1)

    nearby = np.full((n0, n1), np.nan)
    for i in range(n0):
        for j in range(n1):
            if (
                not sm_params.force_fill_submaps
                and sm_params.submap_radius is not None
                and dist[i, j] < sm_params.submap_radius * 2
            ) or (
                (sm_params.force_fill_submaps or sm_params.submap_radius is None)
                and aabb_intersects(
                    submaps[0][i].segments_as_global_points,
                    submaps[1][j].segments_as_global_points,
                )
            ):
                nearby[i, j] = dist[i, j]

    # GT relative pose + yaw difference (submap_align.py:117-129)
    T_w0 = (auxs[0]["poses_gravity_gt"] if gt_pose_data[0] is not None
            else auxs[0]["poses_gravity"])
    T_w1 = (auxs[1]["poses_gravity_gt"] if gt_pose_data[1] is not None
            else auxs[1]["poses_gravity"])
    T_ij_mat = np.einsum("iab,jbc->ijac", np.linalg.inv(T_w0), T_w1)
    yaw_diff = np.abs(np.rad2deg(se3_np.T_to_xyzrpy(T_ij_mat)[..., 5]))
    submap_yaw_diff_mat = np.where(~np.isnan(nearby), yaw_diff, np.nan)

    # submap descriptor similarity gate (submap_align.py:131-149)
    if sm_params.submap_descriptor is not None:
        similarity_mat = np.array(
            [[Submap.similarity(submaps[0][i], submaps[1][j]) for j in range(n1)]
             for i in range(n0)]
        )
    else:
        similarity_mat = np.full((n0, n1), np.inf)

    run_mask = (dist <= sm_io.skip_distance) & (
        similarity_mat >= sm_params.submap_descriptor_thresh
    )
    pair_i, pair_j = np.nonzero(run_mask)

    # ---- the batched registration (device) ----
    registrar = PairGridRegistrar(
        cfg, single_robot_lc=sm_params.single_robot_lc, chunk_size=chunk_size,
        mesh=mesh,
    )
    t0 = time.time()
    if sm_params.per_pair_timing:
        res, times = registrar(
            feats[0], feats[1], auxs[0]["seg_ids"], auxs[1]["seg_ids"],
            pair_i, pair_j, timed=True,
        )
        timing_list = list(times)
    else:
        res = registrar(
            feats[0], feats[1], auxs[0]["seg_ids"], auxs[1]["seg_ids"],
            pair_i, pair_j,
        )
        # one batched dispatch: attribute wall time uniformly
        reg_time = time.time() - t0
        n_solved = max(len(pair_i), 1)
        timing_list = [reg_time / n_solved] * len(pair_i)

    # ---- host-side post-filters + matrices ----
    angle_mat = np.full((n0, n1), np.nan)
    dist_mat = np.full((n0, n1), np.nan)
    num_assoc = np.full((n0, n1), np.nan)
    pct_assoc = np.full((n0, n1), np.nan)
    T_ij_hat_mat = np.full((n0, n1, 4, 4), np.nan)
    assoc_mat = [[np.zeros((0, 2), np.int64) for _ in range(n1)] for _ in range(n0)]

    # pairs hard-gated by skip_distance (submap_align.py:136-142)
    skip = dist > sm_io.skip_distance
    num_assoc[skip] = 0
    pct_assoc[skip] = 0.0

    # pairs gated by descriptor similarity -> "no match" record
    desc_gated = (~run_mask) & (~skip)
    for i, j in zip(*np.nonzero(desc_gated)):
        theta, d = 180.0, 1e6
        if not np.isnan(nearby[i, j]):
            angle_mat[i, j] = theta
            dist_mat[i, j] = d
        num_assoc[i, j] = 0
        pct_assoc[i, j] = 0.0

    if res is not None and len(pair_i):
        T_hat = res.T_align.copy()
        ok = res.ok.copy()
        rpy = se3_np.T_to_xyzrpy(T_hat)[:, 3:]
        if sm_params.dim == 3 and sm_params.force_rm_upside_down:
            upside_down = (np.abs(rpy[:, 0]) > np.deg2rad(90.0)) | (
                np.abs(rpy[:, 1]) > np.deg2rad(90.0)
            )
            ok = ok & ~upside_down
        if sm_params.dim == 3 and sm_params.force_rm_lc_roll_pitch:
            T_hat = se3_np.transform_rm_roll_pitch(T_hat)

        T_ij_sel = T_ij_mat[pair_i, pair_j]
        # guard: failed registrations carry garbage T; inv of near-singular
        # matrices is fine for error reporting since ok[k] gates usage
        T_hat_safe = np.where(np.isfinite(T_hat).all(axis=(1, 2), keepdims=True), T_hat,
                              np.eye(4))
        T_err = np.einsum("pab,pbc->pac", np.linalg.inv(T_hat_safe), T_ij_sel)
        theta_all = se3_np.rotation_magnitude(T_err[:, :3, :3])
        d_all = np.linalg.norm(T_err[:, : sm_params.dim, 3], axis=-1)

        for k, (i, j) in enumerate(zip(pair_i, pair_j)):
            if ok[k]:
                theta, d = float(theta_all[k]), float(d_all[k])
                T_ij_hat_mat[i, j] = T_hat[k]
                sel = np.argwhere(np.asarray(res.sel[k]))
                assoc_mat[i][j] = sel
                count = int(res.count[k])
            else:
                # InsufficientAssociations / GravityConstraint path
                # (submap_align.py:179-184)
                theta, d = np.pi, 1e6
                count = 0
            if not np.isnan(nearby[i, j]):
                angle_mat[i, j] = np.abs(np.rad2deg(theta)) if ok[k] else 180.0
                dist_mat[i, j] = d
            num_assoc[i, j] = count
            len_i, len_j = len(submaps[0][i]), len(submaps[1][j])
            if sm_params.single_robot_lc:
                # registration ran on the submaps WITH shared segments
                # removed (reference prunes the deepcopied submaps and
                # divides by the pruned lengths, submap_align.py:108-115)
                inter = len({s.id for s in submaps[0][i].segments}
                            & {s.id for s in submaps[1][j].segments})
                len_i, len_j = len_i - inter, len_j - inter
            denom = np.mean([len_i, len_j])
            pct_assoc[i, j] = count / denom if denom > 0 else 0.0

    return SubmapAlignResults(
        robots_nearby_mat=nearby,
        clipper_angle_mat=angle_mat,
        clipper_dist_mat=dist_mat,
        clipper_num_associations=num_assoc,
        similarity_mat=similarity_mat if sm_params.submap_descriptor is not None else None,
        submap_yaw_diff_mat=submap_yaw_diff_mat,
        associated_objs_mat=assoc_mat,
        T_ij_mat=T_ij_mat,
        T_ij_hat_mat=T_ij_hat_mat,
        timing_list=timing_list,
        submap_align_params=sm_params,
        submap_io=sm_io,
    )
