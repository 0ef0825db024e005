"""Voxel-grid occupancy and IOU/IOM, batched and static-shape.

TPU-native equivalent of the reference VoxelGrid (roman/map/voxel_grid.py),
which builds a dense per-segment occupancy array via open3d and intersects
integer-aligned sub-grids one pair at a time. Dense variable-shape grids
don't map to XLA, so occupancy is represented as *sorted integer voxel
keys* over padded point sets; intersections are computed with
searchsorted — all fixed-shape, vmappable over segment x observation pairs.

Conventions match the reference: a voxel's index is floor(p / voxel_size)
(integer-aligned world grid), occupancy is binary, volume = count * vs^3,
iou = |I| / |U|, iom = |I| / min(|A|,|B|) (voxel_grid.py:75-83).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INVALID = np.int32(2**31 - 1)


def _mix32(h: jax.Array) -> jax.Array:
    """murmur3 fmix32 — bijective avalanche on uint32."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def voxel_keys(points: jax.Array, mask: jax.Array,
               voxel_size: float | jax.Array) -> jax.Array:
    """Spatially-hashed int32 voxel keys for valid points; _INVALID for
    padding.

    Chained murmur mixing of the integer voxel coords (tuple-hash style:
    mix(x ^ mix(y ^ mix(z)))) instead of dense packing: key equality ==
    voxel equality up to birthday-bound collision odds (~1e-5 for a
    300-voxel set), with NO bounded coordinate span — a dense SPAN^3
    int32 packing caps the grid at ~205 m at the 0.2 m association voxel
    and either clips (spurious matches at the edge) or drops far voxels
    on bigger maps. The per-coordinate chaining matters: XOR/sum of
    per-axis prime products is linear in the coordinate deltas, so
    structured grids collide at 30%+ rates (XOR variant, measured) or on
    a sparse delta lattice regardless of any bijective finalizer. The
    IOU/downsample users only ever compare keys for equality, so hashing
    is exact for their purposes modulo the negligible collision odds.
    The hash is clamped out of _INVALID so padding never aliases a real
    voxel."""
    v = jnp.floor(points / voxel_size).astype(jnp.int32)
    vu = jax.lax.bitcast_convert_type(v, jnp.uint32)
    h = _mix32(vu[..., 2])
    h = _mix32(h ^ vu[..., 1])
    h = _mix32(h ^ vu[..., 0])
    key = jax.lax.bitcast_convert_type(h, jnp.int32)
    key = jnp.where(key == _INVALID, np.int32(0), key)
    return jnp.where(mask, key, _INVALID)


def _sorted_unique(keys: jax.Array):
    """Sort keys; return (sorted_keys_with_dups_invalidated, n_unique).

    Duplicate occurrences are replaced by _INVALID and re-sorted so unique
    keys occupy the prefix.
    """
    s = jnp.sort(keys, axis=-1)
    first = jnp.concatenate(
        [jnp.ones_like(s[..., :1], dtype=bool), s[..., 1:] != s[..., :-1]], axis=-1
    )
    first = first & (s != _INVALID)
    uniq = jnp.where(first, s, _INVALID)
    uniq = jnp.sort(uniq, axis=-1)
    return uniq, jnp.sum(first, axis=-1)


def voxel_iou_points(
    points1: jax.Array,
    mask1: jax.Array,
    points2: jax.Array,
    mask2: jax.Array,
    voxel_size: float,
    iom_as_iou: bool = False,
) -> jax.Array:
    """Voxel IOU (or IOM) between two padded point sets.

    Shapes: points* (..., n, 3); mask* (..., n). Returns (...,).
    Equivalent to reference Segment.get_voxel_grid(vs).iou(other)
    (mapper.py:188-195 + voxel_grid.py:75-83).
    """
    k1, n1 = _sorted_unique(voxel_keys(points1, mask1, voxel_size))
    k2, n2 = _sorted_unique(voxel_keys(points2, mask2, voxel_size))

    # membership of k1's uniques in k2's uniques — broadcast compare
    # (batches over arbitrary leading dims, unlike jnp.searchsorted; at the
    # point capacities used here the O(n*m) compare is cheap VPU work)
    hit = jnp.any(
        (k1[..., :, None] == k2[..., None, :]) & (k1[..., :, None] != _INVALID),
        axis=-1,
    )
    inter = jnp.sum(hit, axis=-1)

    inter = inter.astype(jnp.float32)
    n1 = n1.astype(jnp.float32)
    n2 = n2.astype(jnp.float32)
    if iom_as_iou:
        denom = jnp.minimum(n1, n2)
    else:
        denom = n1 + n2 - inter
    return jnp.where(denom > 0, inter / jnp.maximum(denom, 1.0), 0.0)


def voxel_downsample(points: jax.Array, mask: jax.Array, voxel_size: float,
                     capacity: int | None = None,
                     max_coarsen_levels: int = 0):
    """Voxel-grid downsample: average the points in each occupied voxel.

    Static-shape equivalent of o3d voxel_down_sample (segment.py:181).
    Output has the same capacity as the input (or `capacity`); slots beyond
    the number of occupied voxels are masked out. Output ordering is by
    voxel key (deterministic), not o3d's ordering.

    max_coarsen_levels > 0 enables per-row ADAPTIVE COARSENING: when a
    row's occupied-voxel count exceeds `capacity`, the voxel size is
    doubled (up to that many times, picking the finest level that fits)
    before downsampling. Without it, overflow keeps the `capacity`
    lowest-hash voxels — an unbiased random spatial subsample whose
    bounding box is systematically SMALLER than the footprint (extreme
    voxels are each likely dropped), which shrank device-mapper OBB
    volumes to a median 0.74x of the host mapper's unbounded pools on a
    noisy test world. Coarsening preserves the footprint at reduced
    resolution instead (median ratio 1.03x, tests/test_batch_mapper.py).
    Each extra level costs one voxel_keys pass + one key sort.
    """
    n = points.shape[-2]
    cap = capacity or n
    keys = voxel_keys(points, mask, voxel_size)
    if max_coarsen_levels > 0:
        key_levels = [keys] + [
            voxel_keys(points, mask, voxel_size * (2.0 ** lvl))
            for lvl in range(1, max_coarsen_levels + 1)
        ]
        occs = []
        for k in key_levels:
            sk = jnp.sort(k, axis=-1)
            uniq = jnp.concatenate(
                [jnp.ones_like(sk[..., :1], dtype=bool),
                 sk[..., 1:] != sk[..., :-1]], axis=-1) & (sk != _INVALID)
            occs.append(jnp.sum(uniq, axis=-1))
        occ = jnp.stack(occs, axis=-1)                  # (..., L+1)
        fits = occ <= cap
        lvl = jnp.argmax(fits, axis=-1)                 # finest fitting level
        lvl = jnp.where(jnp.any(fits, axis=-1), lvl, max_coarsen_levels)
        stacked = jnp.stack(key_levels, axis=-1)        # (..., n, L+1)
        keys = jnp.take_along_axis(
            stacked, lvl[..., None, None], axis=-1)[..., 0]

    order = jnp.argsort(keys, axis=-1)
    skeys = jnp.take_along_axis(keys, order, axis=-1)
    spts = jnp.take_along_axis(points, order[..., None], axis=-2)
    first = jnp.concatenate(
        [jnp.ones_like(skeys[..., :1], dtype=bool), skeys[..., 1:] != skeys[..., :-1]],
        axis=-1,
    ) & (skeys != _INVALID)
    gid = jnp.cumsum(first.astype(jnp.int32), axis=-1) - 1  # unique voxel rank
    gid = jnp.where(skeys != _INVALID, gid, cap)  # padding -> overflow bucket

    def scatter_one(g, p, valid):
        sums = jnp.zeros((cap + 1, 3), dtype=points.dtype).at[g].add(
            p * valid[..., None].astype(points.dtype)
        )
        cnts = jnp.zeros((cap + 1,), dtype=jnp.float32).at[g].add(valid.astype(jnp.float32))
        return sums[:cap], cnts[:cap]

    valid = skeys != _INVALID
    if points.ndim == 2:
        sums, cnts = scatter_one(gid, spts, valid)
    else:
        flat_shape = (-1,) + points.shape[-2:]
        gids = gid.reshape(-1, n)
        ps = spts.reshape(flat_shape)
        vs = valid.reshape(-1, n)
        sums, cnts = jax.vmap(scatter_one)(gids, ps, vs)
        sums = sums.reshape(points.shape[:-2] + (cap, 3))
        cnts = cnts.reshape(points.shape[:-2] + (cap,))
    out_mask = cnts > 0
    out = sums / jnp.maximum(cnts, 1.0)[..., None]
    return out, out_mask


# ---------------------------------------------------------------------------
# Host (numpy) reference implementations — used by the host-side mapper and
# as test oracles for the device kernels.
# ---------------------------------------------------------------------------

def voxel_set(points: np.ndarray, voxel_size: float) -> set:
    v = np.floor(np.asarray(points) / voxel_size).astype(np.int64)
    return set(map(tuple, v))


def voxel_iou_np(points1: np.ndarray, points2: np.ndarray, voxel_size: float,
                 iom_as_iou: bool = False) -> float:
    s1 = voxel_set(points1, voxel_size)
    s2 = voxel_set(points2, voxel_size)
    inter = len(s1 & s2)
    if iom_as_iou:
        denom = min(len(s1), len(s2))
    else:
        denom = len(s1) + len(s2) - inter
    return inter / denom if denom > 0 else 0.0


def voxel_downsample_np(points: np.ndarray, voxel_size: float) -> np.ndarray:
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) == 0:
        return pts
    keys = np.floor(pts / voxel_size).astype(np.int64)
    _, inv, cnt = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    sums = np.zeros((len(cnt), 3))
    np.add.at(sums, inv, pts)
    return sums / cnt[:, None]


def sorted_unique_keys(points: jax.Array, mask: jax.Array,
                       voxel_size: float):
    """(sorted-unique voxel keys (..., n), occupied count (...,)) — the
    cacheable occupancy representation consumed by voxel_iou_cross_keys.
    The device mapper stores these per segment pool row and refreshes
    only rows whose points changed, so per-frame association/merge
    scoring skips re-keying + re-sorting the whole pool."""
    return _sorted_unique(voxel_keys(points, mask, voxel_size))


def voxel_iou_cross(
    points1: jax.Array,
    mask1: jax.Array,
    points2: jax.Array,
    mask2: jax.Array,
    voxel_size: float,
    iom_as_iou: bool = False,
) -> jax.Array:
    """All-pairs voxel IOU between two collections of point sets.

    points1 (S, P, 3), points2 (O, Q, 3) -> (S, O). Unlike broadcasting
    voxel_iou_points over the pair grid (which would re-key per pair,
    S*O key sorts), the hashed voxel keys are computed ONCE per set —
    the integer-aligned world-grid semantics of the reference VoxelGrid
    (voxel_grid.py:32-83) with no bounded coordinate span. This is the
    mapper's association/merge scoring hot path (S^2 pairs per frame).
    """
    k1, n1 = _sorted_unique(voxel_keys(points1, mask1, voxel_size))
    k2, n2 = _sorted_unique(voxel_keys(points2, mask2, voxel_size))
    return voxel_iou_cross_keys(k1, n1, k2, n2, iom_as_iou=iom_as_iou)


def voxel_iou_cross_keys(k1, n1, k2, n2, iom_as_iou: bool = False,
                         method: str | None = None):
    """voxel_iou_cross over precomputed sorted_unique_keys outputs.

    Two membership backends, bit-identical counts (each row's keys are
    unique, so |A ∩ B| = number of equal (p, q) key pairs):

    - "compare": blocked broadcast equality + reduction — pure vectorized
      VPU work. On TPU this is the only sane choice: jnp.searchsorted
      lowers to a serial gather loop per query, and the measured cost was
      the device mapper's ENTIRE frame budget (3.3 vs ~100 frames/s with
      scoring removed).
    - "searchsorted": O(S*O*Q*logP) binary search — wins on CPU where
      gathers are cheap and the O(S*O*P*Q) compare is not vectorized
      across one core.

    method=None picks by backend (TPU -> compare).
    """
    S, P = k1.shape
    O, Q = k2.shape
    if method is None:
        try:
            method = ("compare" if jax.default_backend() == "tpu"
                      else "searchsorted")
        except Exception:
            method = "searchsorted"

    if method == "compare":
        valid1 = k1 != _INVALID
        # block the (S, P, O, Q) equality tensor over the O axis to bound
        # the live intermediate to ~32M elements
        blk = max(1, min(O, int(32_000_000 // max(S * P * Q, 1))))
        nb = (O + blk - 1) // blk
        O_pad = nb * blk
        k2p = (jnp.concatenate(
            [k2, jnp.full((O_pad - O, Q), _INVALID, k2.dtype)], axis=0)
            if O_pad != O else k2)

        def one(k2_blk):  # (blk, Q) -> (S, blk)
            eq = ((k1[:, :, None, None] == k2_blk[None, None, :, :])
                  & valid1[:, :, None, None])
            return jnp.sum(eq, axis=(1, 3), dtype=jnp.int32)

        inter = jax.lax.map(one, k2p.reshape(nb, blk, Q))  # (nb, S, blk)
        inter = jnp.moveaxis(inter, 0, 1).reshape(S, O_pad)[:, :O]
        inter = inter.astype(jnp.float32)
    else:
        flat2 = k2.reshape(-1)  # (O*Q,)

        def row_counts(row):
            # row: sorted, per-row-unique, _INVALID (int32 max) padded at
            # the end, so membership == equality at the insertion point
            idx = jnp.searchsorted(row, flat2)
            got = ((row[jnp.clip(idx, 0, P - 1)] == flat2)
                   & (flat2 != _INVALID))
            return jnp.sum(got.reshape(O, Q), axis=-1)

        inter = jax.vmap(row_counts)(k1).astype(jnp.float32)  # (S, O)
    n1 = n1.astype(jnp.float32)[:, None]
    n2 = n2.astype(jnp.float32)[None, :]
    if iom_as_iou:
        denom = jnp.minimum(n1, n2)
    else:
        denom = n1 + n2 - inter
    return jnp.where(denom > 0, inter / jnp.maximum(denom, 1.0), 0.0)
