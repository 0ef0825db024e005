"""Device-resident vectorized segment mapper.

SURVEY §7.6: the reference's mapper is a python object graph updated one
observation at a time (roman/map/mapper.py). This is the TPU-native
alternative: the entire segment map lives on device as capacity-padded
pools (points, descriptors, lifecycle counters), and one jit'd program per
frame performs association scoring (voxel IOU + cosine), assignment
(device auction with rejection), point integration with voxel
downsampling, lifecycle transitions (nursery -> active -> retired), and
pairwise merging — with no host round trips during a run (state arrays
stay on device; the map is fetched once at export).

Semantics follow Mapper/MapperParams (GNN thresholds, min_sightings,
max_t_no_sightings, merge-to-fixpoint as a bounded while_loop per frame,
DBSCAN-equivalent largest-cluster retirement cleanup applied batched in
the export program, per-insert statistical outlier removal at
integration/spawn/merge like host Segment._cleanup_points). The host
Mapper remains the reference implementation; test_batch_mapper.py checks
host/device agreement on clean AND noisy worlds.

Sizing: when an object's occupied voxel count at segment_voxel_size
exceeds max_points_per_segment, the pool downsample ADAPTIVELY COARSENS
that segment's voxel size (x2, up to x4) so the spatial footprint is
preserved at reduced resolution (voxel_downsample max_coarsen_levels),
with statistical outlier removal running BEFORE the capping pass on the
uncapped fine-resolution cloud (SOR's tail-trim is resolution-dependent;
running it post-coarsening under-pruned to 1.8x host volumes). Without
coarsening, overflow kept an unbiased random voxel subset whose OBB
shrank to a median 0.74x of the host mapper's unbounded pools on a noisy
world (extreme voxels each likely dropped); with it the exported volume
carries a bounded ~1.2x median bias TOWARD the true footprint
(test_device_mapper_volume_parity). Beyond x4 coarsening the subset
truncation still applies.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from roman_tpu.data.camera import CameraParams
from roman_tpu.map.roman_map import RomanMap, SegmentData
from roman_tpu.ops.geometry import obb_volume_extent, shape_attributes
from roman_tpu.ops.hungarian import auction_assignment
from roman_tpu.ops.pointcloud import (largest_cluster_mask,
                                      statistical_outlier_mask)
from roman_tpu.ops.voxel import (_INVALID, sorted_unique_keys,
                                 voxel_downsample, voxel_iou_cross_keys)
from roman_tpu.params.mapper_params import MapperParams

# lifecycle states (reference mapper.py:93-127: nursery -> segments ->
# inactive -> graveyard). INACTIVE segments are still merge targets —
# the reference's merge scans segments + inactive_segments
# (mapper.py:277), which is how a track that missed a few frames gets
# re-fused with its freshly-spawned duplicate instead of fragmenting.
# GRAVEYARD is terminal (spillable off-device).
EMPTY, NURSERY, ACTIVE, INACTIVE, GRAVEYARD = 0, 1, 2, 3, 4
RETIRED = GRAVEYARD  # compat alias


@struct.dataclass
class MapState:
    points: jax.Array          # (S, P, 3)
    points_valid: jax.Array    # (S, P) bool
    descriptors: jax.Array     # (S, D) running mean (unit)
    desc_count: jax.Array      # (S,)
    status: jax.Array          # (S,) int32
    num_sightings: jax.Array   # (S,)
    first_seen: jax.Array      # (S,)
    last_seen: jax.Array       # (S,)
    seg_id: jax.Array          # (S,) int32 (-1 empty)
    # robot position at each segment's LAST observation: the reference's
    # inactive->graveyard distance rule compares the current robot pose
    # against seg.last_observation.pose (mapper.py:113-123), NOT against
    # the segment's center — a segment observed from afar must retire
    # when the robot has MOVED segment_graveyard_dist since last seeing
    # it, even if the robot is still near the segment itself
    last_obs_pos: jax.Array    # (S, 3)
    next_id: jax.Array         # () int32
    # cached sorted-unique voxel keys at the association voxel size
    # (ops.voxel.sorted_unique_keys of the row's points): association and
    # merge scoring read these instead of re-keying + re-sorting the
    # whole (S, P) pool every frame; refreshed only for rows whose points
    # changed (integrate / spawn / merge / free)
    vox_keys: jax.Array        # (S, P) int32 sorted, _INVALID-padded
    vox_n: jax.Array           # (S,) int32 occupied-voxel count


def init_state(capacity: int, points_per_seg: int, desc_dim: int) -> MapState:
    S, P, D = capacity, points_per_seg, desc_dim
    return MapState(
        points=jnp.zeros((S, P, 3), jnp.float32),
        points_valid=jnp.zeros((S, P), bool),
        descriptors=jnp.zeros((S, D), jnp.float32),
        desc_count=jnp.zeros((S,), jnp.float32),
        status=jnp.zeros((S,), jnp.int32),
        num_sightings=jnp.zeros((S,), jnp.int32),
        first_seen=jnp.zeros((S,), jnp.float32),
        last_seen=jnp.full((S,), -1e9, jnp.float32),
        seg_id=jnp.full((S,), -1, jnp.int32),
        last_obs_pos=jnp.zeros((S, 3), jnp.float32),
        next_id=jnp.zeros((), jnp.int32),
        vox_keys=jnp.full((S, P), _INVALID, jnp.int32),
        vox_n=jnp.zeros((S,), jnp.int32),
    )


class BatchMapper:
    def __init__(self, params: MapperParams, camera: CameraParams,
                 desc_dim: int = 64, obs_capacity: int = 32):
        self.params = params
        self.camera = camera
        self.desc_dim = desc_dim
        self.obs_capacity = obs_capacity
        self.state = init_state(params.max_segments, params.max_points_per_segment,
                                desc_dim)
        self.poses: List[np.ndarray] = []
        self.times: List[float] = []
        self.frame_descriptors: List[np.ndarray] = []
        self._T_camera_flu = np.eye(4)
        self._step_fn = self._build()
        self._step = jax.jit(self._step_fn)
        self._scan_steps = {}
        # RETIRED segments spilled off-device (see maybe_spill): the pool
        # only needs to hold LIVE segments, so long runs don't exhaust
        # max_segments (retired segments never change again —
        # graveyard semantics, reference mapper.py:93-127)
        self._spilled: List[SegmentData] = []
        self._updates_since_spill_check = 0
        # check pool occupancy every N update_batch calls (each check is
        # one small device fetch — ~1 s through the TPU tunnel)
        self.spill_check_every = 4
        self.spill_threshold = 0.7

    def set_T_camera_flu(self, T: np.ndarray):
        """Camera->FLU convention applied to the EXPORTED trajectory only
        (reference Mapper.set_T_camera_flu; observation poses stay
        camera-frame for point lifting)."""
        self._T_camera_flu = np.asarray(T)

    # ------------------------------------------------------------------ #
    def _build(self):
        p = self.params
        S = p.max_segments
        P = p.max_points_per_segment
        O = self.obs_capacity
        vs_iou = p.iou_voxel_size
        vs_seg = p.segment_voxel_size
        geo_lo, geo_hi = p.geometric_score_range
        use_sem = p.semantic_association_method is not None
        sem_lo, sem_hi = p.semantic_score_range
        iom = p.geometric_association_method == "iom"

        def step(state: MapState, t, robot_pos, obs_pts, obs_valid, obs_desc,
                 obs_mask):
            """obs_pts (O, Q, 3) world frame; obs_valid (O, Q); obs_desc
            (O, D); obs_mask (O,) real observations; robot_pos (3,) for
            the graveyard distance rule."""
            trackable = (state.status == NURSERY) | (state.status == ACTIVE)

            # ---- association scores (segment x observation) ----
            # segment-side keys come from the state cache (refreshed only
            # for rows whose points change); observation keys are computed
            # once per frame (shared world grid), not per pair
            k_obs, n_obs = sorted_unique_keys(obs_pts, obs_valid, vs_iou)
            iou = voxel_iou_cross_keys(
                state.vox_keys, state.vox_n, k_obs, n_obs, iom_as_iou=iom,
            )  # (S, O)
            geo_norm = (iou - geo_lo) / jnp.maximum(geo_hi - geo_lo, 1e-9)
            score = geo_norm
            if use_sem:
                cos = jnp.einsum("sd,od->so", state.descriptors, obs_desc)
                # missing descriptor on either side scores a perfect 1.0,
                # matching Mapper._semantic_score (geometry then decides;
                # a zero placeholder would otherwise hard-reject the pair)
                has_desc = (state.desc_count > 0)[:, None] & (
                    jnp.linalg.norm(obs_desc, axis=-1) > 1e-9)[None, :]
                cos = jnp.where(has_desc, cos, 1.0)
                sem_norm = (cos - sem_lo) / jnp.maximum(sem_hi - sem_lo, 1e-9)
                ok_pair = (iou >= geo_lo) & (cos >= sem_lo)
                score = jnp.sqrt(jnp.maximum(geo_norm * sem_norm, 0.0))
            else:
                ok_pair = iou >= geo_lo
            benefit = jnp.where(
                ok_pair & trackable[:, None] & obs_mask[None, :], score, 0.0
            )

            match = auction_assignment(benefit.T, obs_mask, trackable, n_iters=64)
            # match: (O,) segment slot per observation, -1 unmatched.
            # route unmatched observations OUT OF BOUNDS (mode="drop"
            # discards them) — routing them to slot 0 would clobber real
            # scatters there (at[].set is last-writer-wins)
            matched = match >= 0
            seg_of_obs = jnp.where(matched, match, S)

            # ---- integrate matched observations ----
            # scatter obs points into matched segments then re-downsample
            add_pts = jnp.zeros((S, obs_pts.shape[1], 3), jnp.float32)
            add_val = jnp.zeros((S, obs_pts.shape[1]), bool)
            add_pts = add_pts.at[seg_of_obs].set(
                jnp.where(matched[:, None, None], obs_pts, 0.0), mode="drop")
            add_val = add_val.at[seg_of_obs].set(
                obs_valid & matched[:, None], mode="drop")
            # Only the <= O matched rows change, so the maintenance
            # pipeline GATHERS them, processes (R0, P+Q) instead of
            # (S, P+Q), and scatters back — ~S/O less downsample work.
            # host-parity order (segment.py:87-93 _cleanup_points):
            # 1. UNCAPPED fine-resolution downsample (transient, P+Q slots)
            # 2. statistical outlier removal on the FINE cloud — the SOR
            #    tail-trim is resolution-dependent (a coarse cloud
            #    equalizes inter-point spacing and under-prunes: device
            #    OBB volumes ran 1.8x host when SOR ran post-coarsening)
            # 3. capped downsample with adaptive coarsening to bound the
            #    pool (footprint-preserving, see voxel_downsample)
            touched = jnp.zeros((S,), bool).at[seg_of_obs].set(matched, mode="drop")
            R0 = min(O, S)
            t_rows = jnp.argsort(~touched)[:R0]
            row_touched = touched[t_rows]
            comb_pts = jnp.concatenate(
                [state.points[t_rows], add_pts[t_rows]], axis=1)
            comb_val = jnp.concatenate(
                [state.points_valid[t_rows], add_val[t_rows]], axis=1)
            fine_pts, fine_val = voxel_downsample(comb_pts, comb_val, vs_seg)
            if p.segment_outlier_removal_std is not None:
                fine_val = statistical_outlier_mask(
                    fine_pts, fine_val, 10, p.segment_outlier_removal_std)
            new_pts, new_val = voxel_downsample(fine_pts, fine_val, vs_seg,
                                                capacity=P,
                                                max_coarsen_levels=2)
            points = state.points.at[t_rows].set(
                jnp.where(row_touched[:, None, None], new_pts,
                          state.points[t_rows]))
            points_valid = state.points_valid.at[t_rows].set(
                jnp.where(row_touched[:, None], new_val,
                          state.points_valid[t_rows]))
            # refresh the touched rows' cached association-voxel keys
            rk, rn = sorted_unique_keys(new_pts, new_val, vs_iou)
            vox_keys = state.vox_keys.at[t_rows].set(
                jnp.where(row_touched[:, None], rk, state.vox_keys[t_rows]))
            vox_n = state.vox_n.at[t_rows].set(
                jnp.where(row_touched, rn, state.vox_n[t_rows]))

            # descriptors: running mean
            add_desc = jnp.zeros((S, obs_desc.shape[1]), jnp.float32).at[
                seg_of_obs].add(jnp.where(matched[:, None], obs_desc, 0.0), mode="drop")
            add_cnt = jnp.zeros((S,), jnp.float32).at[seg_of_obs].add(
                matched.astype(jnp.float32), mode="drop")
            desc = state.descriptors * state.desc_count[:, None] + add_desc
            desc_count = state.desc_count + add_cnt
            desc = desc / jnp.maximum(desc_count[:, None], 1.0)
            desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)

            num_sightings = state.num_sightings + touched.astype(jnp.int32)
            last_seen = jnp.where(touched, t, state.last_seen)
            last_obs_pos = jnp.where(touched[:, None], robot_pos[None, :],
                                     state.last_obs_pos)

            # ---- lifecycle (reference mapper.py:93-127) ----
            # reference parity: an observation-less frame is a lifecycle
            # no-op (mapper.py:56-57 early-returns before any state
            # transition), so every status change below is gated on the
            # frame carrying at least one observation — update_batch
            # scans mixed batches where some frames are empty
            has_obs = jnp.any(obs_mask)
            status = state.status

            def lc(pred, new, status):
                return jnp.where(has_obs & pred, new, status)

            # nursery -> active
            status = lc((status == NURSERY)
                        & (num_sightings >= p.min_sightings), ACTIVE, status)
            # unseen too long -> inactive (actives) / freed (nursery)
            stale = t - last_seen > p.max_t_no_sightings
            status = lc((status == ACTIVE) & stale, INACTIVE, status)
            status = lc((status == NURSERY) & stale, EMPTY, status)
            # inactive -> graveyard when too old or the robot moved away
            # (segment_graveyard_time / _dist, reference mapper.py:113-123:
            # the distance is current robot pose vs the robot pose at the
            # segment's LAST OBSERVATION — not vs the segment center)
            far = jnp.linalg.norm(
                last_obs_pos - robot_pos[None, :],
                axis=-1) > p.segment_graveyard_dist
            old = t - last_seen > p.segment_graveyard_time
            status = lc((status == INACTIVE) & (far | old), GRAVEYARD, status)

            # ---- new segments from unmatched observations ----
            new_obs = obs_mask & ~matched
            free = status == EMPTY
            free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank per slot
            obs_rank = jnp.cumsum(new_obs.astype(jnp.int32)) - 1
            # slot for each new obs: the obs_rank-th free slot
            slot_of_rank = jnp.full((O,), S, jnp.int32).at[
                jnp.where(free, free_rank, O)
            ].set(jnp.arange(S, dtype=jnp.int32), mode="drop")
            obs_slot = jnp.where(new_obs, slot_of_rank[jnp.clip(obs_rank, 0, O - 1)], S)
            can_place = new_obs & (obs_slot < S)
            tgt = jnp.where(can_place, obs_slot, S)

            def place(arr, vals):
                return arr.at[tgt].set(vals, mode="drop")

            init_pts = jnp.zeros((O, P, 3), jnp.float32)
            q = obs_pts.shape[1]
            init_pts = init_pts.at[:, :q].set(obs_pts[:, :P])
            init_val = jnp.zeros((O, P), bool).at[:, :q].set(obs_valid[:, :P])
            if p.segment_outlier_removal_std is not None:
                # host parity: Segment creation also runs _cleanup_points
                init_val = statistical_outlier_mask(
                    init_pts, init_val, 10, p.segment_outlier_removal_std)
            points = place(points, init_pts)
            points_valid = place(points_valid, init_val)
            pk, pn = sorted_unique_keys(init_pts, init_val, vs_iou)
            vox_keys = place(vox_keys, pk)
            vox_n = place(vox_n, pn)
            dnorm = obs_desc / jnp.maximum(
                jnp.linalg.norm(obs_desc, axis=-1, keepdims=True), 1e-9)
            desc = place(desc, dnorm)
            desc_count = place(desc_count, jnp.ones((O,), jnp.float32))
            status = place(status, jnp.full((O,), NURSERY, jnp.int32))
            num_sightings = place(num_sightings, jnp.ones((O,), jnp.int32))
            first_seen = place(state.first_seen, jnp.full((O,), t, jnp.float32))
            last_seen = place(last_seen, jnp.full((O,), t, jnp.float32))
            last_obs_pos = place(last_obs_pos,
                                 jnp.broadcast_to(robot_pos, (O, 3)))
            n_new = jnp.sum(can_place.astype(jnp.int32))
            new_ids = state.next_id + jnp.cumsum(can_place.astype(jnp.int32)) - 1
            seg_id = state.seg_id.at[tgt].set(
                jnp.where(can_place, new_ids, -1), mode="drop")

            # ---- merge to fixpoint (reference mapper.py:251-314 restarts
            # its O(n^2) merge scan after every edit until none fires).
            # Batched equivalent: repeat "merge the highest-IOU live pair"
            # until no pair clears the threshold, as a bounded
            # lax.while_loop — each iteration recomputes the pair IOU on
            # the merged pools, so chained merges (a<-b then a<-c)
            # resolve within one frame like the reference.
            #
            # Only DIRTY segments (touched / spawned this frame, or just
            # merged) can form a newly-mergeable pair: the previous
            # frame ended at a merge fixpoint, untouched footprints are
            # unchanged, and statuses only become less mergeable without
            # a touch (INACTIVE can't re-activate except via merge). So
            # the scan is dirty-rows x all-columns, (R, S) instead of
            # (S, S) — R is bounded by O observations + the merge budget.
            spawned = jnp.zeros((S,), bool).at[tgt].set(
                can_place, mode="drop")
            dirty0 = touched | spawned
            R = min(O + int(p.max_merges_per_frame), S)

            def merge_once(carry):
                (points, points_valid, desc, desc_count, num_sightings,
                 first_seen, last_seen, last_obs_pos, seg_id, status,
                 vox_keys, vox_n, dirty, n_merges) = carry
                activeish = (status == NURSERY) | (status == ACTIVE)
                track3 = activeish | (status == INACTIVE)
                # dirty rows first (stable sort keeps this deterministic)
                rows = jnp.argsort(~dirty)[:R]
                row_dirty = dirty[rows]
                pair_iou = voxel_iou_cross_keys(
                    vox_keys[rows], vox_n[rows], vox_keys, vox_n,
                    iom_as_iou=iom)  # (R, S)
                g = rows[:, None]
                c = jnp.arange(S)[None, :]
                # at least one side currently tracked; the other may be
                # INACTIVE (reference merge scans segments +
                # inactive_segments, mapper.py:277) — this re-fuses a
                # briefly-lost track with its freshly-spawned duplicate
                mergeable = (row_dirty[:, None] & (g != c)
                             & ((activeish[rows][:, None] & track3[None, :])
                                | (track3[rows][:, None]
                                   & activeish[None, :]))
                             & (pair_iou >= geo_lo))
                flat = jnp.where(mergeable, pair_iou, -1.0).reshape(-1)
                best = jnp.argmax(flat)
                do_merge = flat[best] > 0
                gbest = rows[best // S]
                cbest = best % S
                # merge b into a, a = lower slot (reference keeps seg1)
                a = jnp.minimum(gbest, cbest)
                b = jnp.maximum(gbest, cbest)
                # merge b into a (a < b by triu): concatenate + downsample
                mpts = jnp.concatenate([points[a], points[b]], axis=0)
                mval = jnp.concatenate([points_valid[a] & do_merge,
                                        points_valid[b] & do_merge], axis=0)
                # same fine-SOR-then-coarsen order as the integrate path
                mf_pts, mf_val = voxel_downsample(mpts, mval, vs_seg)
                if p.segment_outlier_removal_std is not None:
                    # host parity: update_from_segment -> _cleanup_points
                    mf_val = statistical_outlier_mask(
                        mf_pts[None], mf_val[None], 10,
                        p.segment_outlier_removal_std)[0]
                md_pts, md_val = voxel_downsample(mf_pts, mf_val, vs_seg,
                                                  capacity=P,
                                                  max_coarsen_levels=2)
                points = points.at[a].set(
                    jnp.where(do_merge, md_pts, points[a]))
                points_valid = points_valid.at[a].set(
                    jnp.where(do_merge, md_val, points_valid[a]))
                mk, mn = sorted_unique_keys(md_pts, md_val, vs_iou)
                vox_keys = vox_keys.at[a].set(
                    jnp.where(do_merge, mk, vox_keys[a]))
                vox_n = vox_n.at[a].set(jnp.where(do_merge, mn, vox_n[a]))
                vox_keys = vox_keys.at[b].set(
                    jnp.where(do_merge, _INVALID, vox_keys[b]))
                vox_n = vox_n.at[b].set(jnp.where(do_merge, 0, vox_n[b]))
                wa = desc_count[a]
                wb = desc_count[b]
                mdesc = (desc[a] * wa + desc[b] * wb) / jnp.maximum(wa + wb, 1.0)
                mdesc = mdesc / jnp.maximum(jnp.linalg.norm(mdesc), 1e-9)
                desc = desc.at[a].set(jnp.where(do_merge, mdesc, desc[a]))
                desc_count = desc_count.at[a].add(jnp.where(do_merge, wb, 0.0))
                num_sightings = num_sightings.at[a].add(
                    jnp.where(do_merge, num_sightings[b], 0))
                first_seen = first_seen.at[a].min(
                    jnp.where(do_merge, first_seen[b], jnp.inf))
                # the merged track's last observation is whichever side
                # was seen later (host parity: update_from_segment keeps
                # the later last_observation)
                use_b = last_seen[b] > last_seen[a]
                last_obs_pos = last_obs_pos.at[a].set(
                    jnp.where(do_merge & use_b, last_obs_pos[b],
                              last_obs_pos[a]))
                last_seen = last_seen.at[a].max(
                    jnp.where(do_merge, last_seen[b], -jnp.inf))
                seg_id = seg_id.at[a].set(
                    jnp.where(do_merge, jnp.minimum(seg_id[a], seg_id[b]),
                              seg_id[a]))
                # merged segment is alive again (reference merges into an
                # ACTIVE seg1); sightings decide active vs nursery
                new_a = jnp.where(num_sightings[a] >= p.min_sightings,
                                  ACTIVE, NURSERY)
                status = status.at[a].set(
                    jnp.where(do_merge, new_a, status[a]))
                status = status.at[b].set(
                    jnp.where(do_merge, EMPTY, status[b]))
                seg_id = seg_id.at[b].set(jnp.where(do_merge, -1, seg_id[b]))
                # a's footprint changed -> candidate row next iteration;
                # b is emptied and drops out of the status masks anyway
                dirty = dirty.at[a].set(dirty[a] | do_merge)
                dirty = dirty.at[b].set(jnp.where(do_merge, False, dirty[b]))
                n_merges = jnp.where(do_merge, n_merges + 1, -1)
                return (points, points_valid, desc, desc_count,
                        num_sightings, first_seen, last_seen, last_obs_pos,
                        seg_id, status, vox_keys, vox_n, dirty, n_merges)

            max_merges = p.max_merges_per_frame
            carry = (points, points_valid, desc, desc_count, num_sightings,
                     first_seen, last_seen, last_obs_pos, seg_id, status,
                     vox_keys, vox_n, dirty0, jnp.zeros((), jnp.int32))
            carry = jax.lax.while_loop(
                lambda c: (c[-1] >= 0) & (c[-1] < max_merges),
                merge_once, carry)
            (points, points_valid, desc, desc_count, num_sightings,
             first_seen, last_seen, last_obs_pos, seg_id, status, vox_keys,
             vox_n, _, _) = carry

            return MapState(
                points=points, points_valid=points_valid, descriptors=desc,
                desc_count=desc_count, status=status, num_sightings=num_sightings,
                first_seen=first_seen, last_seen=last_seen, seg_id=seg_id,
                last_obs_pos=last_obs_pos,
                next_id=state.next_id + n_new,
                vox_keys=vox_keys, vox_n=vox_n,
            )

        return step

    # ------------------------------------------------------------------ #
    def ensure_desc_dim(self, d: int):
        """Widen the descriptor pool to d dims in place (zero-padding the
        existing state) and drop the compiled steps. Covers streams whose
        first frames carry no descriptors: the runner would otherwise
        construct the mapper at a small placeholder width and update_batch
        would silently truncate every later full-width descriptor."""
        if d <= self.desc_dim:
            return
        desc = np.zeros(self.state.descriptors.shape[:-1] + (d,), np.float32)
        desc[..., : self.desc_dim] = np.asarray(self.state.descriptors)
        self.state = self.state.replace(descriptors=jnp.asarray(desc))
        self.desc_dim = d
        self._step_fn = self._build()
        self._step = jax.jit(self._step_fn)
        self._scan_steps = {}
        self._export_fn = None  # packed layout includes the desc block

    def _get_scan_step(self, sig):
        """One dispatch for a whole batch of frames: lax.scan of the
        per-frame step over the frame axis, with the camera->world point
        transform fused in (the per-frame update() path ships world-frame
        points from the host instead)."""
        if sig not in self._scan_steps:
            step_fn = self._step_fn

            @jax.jit
            def steps(state, ts, poses, pts, val, desc, mask):
                def body(st, x):
                    t, pose, p_, v_, d_, m_ = x
                    pw = jnp.einsum("ij,oqj->oqi", pose[:3, :3], p_) + pose[:3, 3]
                    pw = jnp.where(v_[..., None], pw, 0.0)
                    return step_fn(st, t, pose[:3, 3], pw, v_, d_, m_), None

                out, _ = jax.lax.scan(body, state, (ts, poses, pts, val, desc, mask))
                return out

            self._scan_steps[sig] = steps
        return self._scan_steps[sig]

    def update_batch(self, times, poses, points, points_valid, descriptors,
                     obs_mask, frame_descriptors=None):
        """Batched Mapper.update over B frames in ONE device dispatch.

        times (B,); poses (B, 4, 4); points (B, O, Q, 3) CAMERA-frame;
        points_valid (B, O, Q); descriptors (B, O, D); obs_mask (B, O).
        """
        B = len(times)
        self.poses += [np.asarray(p) for p in poses]
        self.times += [float(t) for t in times]
        if frame_descriptors is not None:
            self.frame_descriptors += [np.asarray(f) for f in frame_descriptors]
        D = descriptors.shape[-1]
        if D > self.desc_dim:
            # widen the pool instead of silently truncating — cutting
            # 768-d CLIP embeddings to a small placeholder width makes
            # semantic cosine scores meaningless (ensure_desc_dim
            # docstring names this exact failure)
            self.ensure_desc_dim(D)
        if D != self.desc_dim:
            fixed = np.zeros(descriptors.shape[:-1] + (self.desc_dim,), np.float32)
            fixed[..., :D] = np.asarray(descriptors)
            descriptors = fixed
        fn = self._get_scan_step((B,) + tuple(np.shape(points)[1:3]))
        self.state = fn(
            self.state, jnp.asarray(times, jnp.float32),
            jnp.asarray(poses, jnp.float32),
            jnp.asarray(points, jnp.float32), jnp.asarray(points_valid),
            jnp.asarray(descriptors, jnp.float32), jnp.asarray(obs_mask))
        self.maybe_spill()

    def _fit_points(self, pts: np.ndarray) -> np.ndarray:
        """Reduce an observation's cloud to <= max_points_per_segment
        without spatial bias. pts arrive in mask-pixel order, so keeping
        the FIRST Q would keep the top image rows of a large segment and
        skew its center/extent/voxel keys vs the host mapper (whose
        Segment creation voxel-downsamples the full cloud,
        segment.py _cleanup_points). Voxel-downsample first (host-parity
        density normalization); if the footprint still exceeds Q, take
        an even stride across the remaining points."""
        Q = self.params.max_points_per_segment
        if len(pts) <= Q:
            return pts
        from roman_tpu.ops.voxel import voxel_downsample_np

        down = voxel_downsample_np(pts, self.params.segment_voxel_size)
        if len(down) > Q:
            down = down[np.linspace(0, len(down) - 1, Q).astype(int)]
        return down.astype(np.float32)

    def _widen_for(self, observations):
        """Widen the descriptor pool to the widest incoming descriptor —
        the Observation-list entry points must not silently truncate
        768-d embeddings to a placeholder width any more than
        update_batch does."""
        wid = max((np.asarray(o.semantic_descriptor).reshape(-1).size
                   for o in observations
                   if o.semantic_descriptor is not None), default=0)
        if wid > self.desc_dim:
            self.ensure_desc_dim(wid)

    def pack_observations(self, observations):
        """Pack an Observation list into padded arrays (camera frame)."""
        self._widen_for(observations)
        O = self.obs_capacity
        Q = self.params.max_points_per_segment
        obs_pts = np.zeros((O, Q, 3), np.float32)
        obs_val = np.zeros((O, Q), bool)
        obs_desc = np.zeros((O, self.desc_dim), np.float32)
        obs_mask = np.zeros((O,), bool)
        for k, obs in enumerate(observations[:O]):
            pts = self._fit_points(np.asarray(obs.point_cloud))
            n = min(len(pts), Q)
            obs_pts[k, :n] = pts[:n]
            obs_val[k, :n] = True
            if obs.semantic_descriptor is not None:
                d = np.asarray(obs.semantic_descriptor).reshape(-1)[: self.desc_dim]
                obs_desc[k, : len(d)] = d
            obs_mask[k] = n > 0
        return obs_pts, obs_val, obs_desc, obs_mask

    def update(self, t: float, pose: np.ndarray, observations,
               frame_descriptor: Optional[np.ndarray] = None):
        """Same call contract as Mapper.update (mapper.py:47); observations
        carry camera-frame point clouds + descriptors."""
        self.poses.append(np.asarray(pose))
        self.times.append(float(t))
        if frame_descriptor is not None:
            self.frame_descriptors.append(np.asarray(frame_descriptor))
        if len(observations) == 0:
            # reference parity (mapper.py:56-57): empty frames are
            # no-ops beyond history — and skipping the dispatch also
            # saves a ~1 s tunnel round trip per empty frame here
            return
        self._widen_for(observations)
        O = self.obs_capacity
        Q = self.params.max_points_per_segment
        obs_pts = np.zeros((O, Q, 3), np.float32)
        obs_val = np.zeros((O, Q), bool)
        obs_desc = np.zeros((O, self.desc_dim), np.float32)
        obs_mask = np.zeros((O,), bool)
        for k, obs in enumerate(observations[:O]):
            pts = self._fit_points(np.asarray(obs.transformed_points))
            n = min(len(pts), Q)
            obs_pts[k, :n] = pts[:n]
            obs_val[k, :n] = True
            if obs.semantic_descriptor is not None:
                d = np.asarray(obs.semantic_descriptor).reshape(-1)[: self.desc_dim]
                obs_desc[k, : len(d)] = d
            obs_mask[k] = n > 0
        self.state = self._step(
            self.state, jnp.float32(t),
            jnp.asarray(np.asarray(pose)[:3, 3], jnp.float32),
            jnp.asarray(obs_pts), jnp.asarray(obs_val),
            jnp.asarray(obs_desc), jnp.asarray(obs_mask))
        self.maybe_spill()

    def _export_packed(self):
        """ONE device program + TWO packed fetches for the whole export:
        geometry (OBB volume/extent, Weinmann attrs) is computed on
        device from the resident pools and everything ships as one f32 +
        one i32 buffer — a field-by-field tree fetch plus a re-upload
        for the geometry pass costs ~15 transfers at ~1 s each through
        the tunnel (CLAUDE.md: single fetch per result field)."""
        if getattr(self, "_export_fn", None) is None:
            eps = self.params.clustering_epsilon

            @jax.jit
            def export(state: MapState):
                # retirement cleanup (reference mapper.py:101 /
                # segment.py:195-220): DBSCAN-equivalent largest-cluster
                # filter per segment. Retired segments are never updated
                # again in the reference, so applying the filter once at
                # export is semantically equivalent to applying it at the
                # retirement transition — and it runs batched over all
                # segments in the one export program.
                # adaptive_spacing_factor: pools stored at a coarsened
                # resolution (overflowed voxel budget) have inter-point
                # spacing > the reference eps; scale eps to the actual
                # spacing so straggler removal still fires there
                keep = largest_cluster_mask(
                    state.points, state.points_valid, eps=eps,
                    adaptive_spacing_factor=1.6)
                state = state.replace(points_valid=keep)
                vol, extent = obb_volume_extent(state.points, state.points_valid)
                attrs = shape_attributes(state.points, state.points_valid)
                f32 = jnp.concatenate([
                    state.points.reshape(-1),
                    state.descriptors.reshape(-1).astype(jnp.float32),
                    state.desc_count, state.first_seen, state.last_seen,
                    vol, extent.reshape(-1), attrs.reshape(-1),
                ]).astype(jnp.float32)
                i32 = jnp.concatenate([
                    state.points_valid.reshape(-1).astype(jnp.int32),
                    state.status, state.num_sightings, state.seg_id,
                ]).astype(jnp.int32)
                return f32, i32

            self._export_fn = export
        f32, i32 = self._export_fn(self.state)
        f32 = np.asarray(f32)
        i32 = np.asarray(i32)
        S = self.params.max_segments
        P = self.params.max_points_per_segment
        D = self.desc_dim

        def take(buf, pos, size, shape):
            return buf[pos: pos + size].reshape(shape), pos + size

        pos = 0
        points, pos = take(f32, pos, S * P * 3, (S, P, 3))
        desc, pos = take(f32, pos, S * D, (S, D))
        desc_count, pos = take(f32, pos, S, (S,))
        first_seen, pos = take(f32, pos, S, (S,))
        last_seen, pos = take(f32, pos, S, (S,))
        vol, pos = take(f32, pos, S, (S,))
        extent, pos = take(f32, pos, S * 3, (S, 3))
        attrs, pos = take(f32, pos, S * 3, (S, 3))
        pos = 0
        points_valid, pos = take(i32, pos, S * P, (S, P))
        status, pos = take(i32, pos, S, (S,))
        num_sightings, pos = take(i32, pos, S, (S,))
        seg_id, pos = take(i32, pos, S, (S,))
        return (points, points_valid.astype(bool), desc, desc_count,
                first_seen, last_seen, vol, extent, attrs, status,
                num_sightings, seg_id)

    def _export_segments(self, statuses, include_mature_nursery=False):
        """SegmentData records (+ their slot indices) for pool slots whose
        status is in `statuses`, via the one-dispatch packed export.

        include_mature_nursery additionally exports NURSERY slots with
        num_sightings >= min_sightings: the host mapper promotes those
        within the SAME update (mapper.py:122-127), while the pooled step
        promotes on the NEXT step — so at export such slots are exactly
        the segments the host map would already contain."""
        (points, points_valid, desc, desc_count, first_seen, last_seen,
         vol, extent, attrs, status, num_sightings,
         seg_id) = self._export_packed()
        export_mask = np.isin(status, list(statuses))
        if include_mature_nursery:
            export_mask |= (status == NURSERY) & (
                num_sightings >= self.params.min_sightings)
        segments, slots = [], []
        for i in np.flatnonzero(export_mask):
            pv = points_valid[i]
            if not pv.any():
                continue
            pts = points[i][pv]
            segments.append(SegmentData(
                id=int(seg_id[i]),
                center=pts.mean(axis=0),
                volume=float(vol[i]),
                linearity=float(attrs[i, 0]),
                planarity=float(attrs[i, 1]),
                scattering=float(attrs[i, 2]),
                extent=extent[i],
                semantic_descriptor=desc[i] if desc_count[i] > 0 else None,
                first_seen=float(first_seen[i]),
                last_seen=float(last_seen[i]),
                points=pts.astype(np.float32),
            ))
            slots.append(i)
        return segments, slots

    def maybe_spill(self, force: bool = False):
        """Move RETIRED segments off-device when the pool fills up.

        Retired segments are graveyard state — never associated, merged
        or updated again (reference mapper.py:93-127) — so they only
        occupy pool slots for export's sake. Spilling them to the host
        list (through the same cleanup-applying export program) and
        freeing their slots keeps max_segments a LIVE-segment capacity,
        so long trajectories don't exhaust the pool (which would
        silently drop every new observation)."""
        self._updates_since_spill_check += 1
        if not force and self._updates_since_spill_check < self.spill_check_every:
            return
        self._updates_since_spill_check = 0
        status = np.asarray(self.state.status)
        if not force and (status > EMPTY).mean() < self.spill_threshold:
            return
        if not (status == RETIRED).any():
            return
        segs, slots = self._export_segments((RETIRED,))
        self._spilled += segs
        if not slots:
            return
        mask = np.zeros(len(status), bool)
        mask[slots] = True
        if getattr(self, "_free_fn", None) is None:
            @jax.jit
            def free(state: MapState, m):
                return state.replace(
                    status=jnp.where(m, EMPTY, state.status),
                    seg_id=jnp.where(m, -1, state.seg_id),
                    points_valid=state.points_valid & ~m[:, None],
                    desc_count=jnp.where(m, 0.0, state.desc_count),
                    num_sightings=jnp.where(m, 0, state.num_sightings),
                    last_seen=jnp.where(m, -1e9, state.last_seen),
                    # drop the cached association keys with the row:
                    # association/merge are status-gated so stale keys
                    # can't match, but EMPTY rows must score 0 like their
                    # zeroed points_valid always did
                    vox_keys=jnp.where(m[:, None], _INVALID, state.vox_keys),
                    vox_n=jnp.where(m, 0, state.vox_n),
                )

            self._free_fn = free
        self.state = self._free_fn(self.state, jnp.asarray(mask))

    def get_roman_map(self) -> RomanMap:
        """Fetch the pooled map once and export SegmentData records
        (spilled retired segments + the current pool).

        Sub-min_sightings NURSERY slots are excluded: the host/reference
        map artifact is graveyard + inactive + graduated segments only
        (mapper.py:335-349 via get_segment_map) — a segment below
        min_sightings never enters the map. Exporting them shipped
        end-of-run single-frame fragments that crowded informative far
        segments out of the submap max_size under nearest-first pruning
        (the device-mapper e2e world lost 6 of 11 cross-robot LC cells
        to this). Mature nursery slots (>= min_sightings, promoted by
        the host within the same update) ARE exported."""
        segments, _ = self._export_segments(
            (ACTIVE, INACTIVE, GRAVEYARD), include_mature_nursery=True)
        segments = list(self._spilled) + segments
        return RomanMap(
            segments=segments,
            trajectory=(np.stack(self.poses) @ self._T_camera_flu
                        if self.poses else np.zeros((0, 4, 4))),
            times=np.asarray(self.times),
            descriptors=(np.stack(self.frame_descriptors)
                         if self.frame_descriptors else None),
        )
