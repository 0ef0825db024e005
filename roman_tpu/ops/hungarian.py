"""Linear assignment: host Hungarian (scipy) + a batched on-device
auction solver.

The reference solves GNN data association with scipy's
linear_sum_assignment over a cost matrix augmented with "no association"
columns (roman/map/global_nearest_neighbor.py:39-42). The same augmented
scheme is reproduced here; the device variant (auction algorithm, fixed
iteration count, vmappable) exists so a whole batch of frames can be
associated on-chip without host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

_M = 1e9  # "no match" cost, same spirit as reference's M = 1e9


def assignment_with_rejection_np(scores: np.ndarray) -> list[tuple[int, int]]:
    """Minimize cost with per-item rejection, reference scheme
    (global_nearest_neighbor.py:39-48): augment [scores | 1] blocks so any
    row/col can opt out at cost 1.0, then keep only real-real pairs.

    scores: (n1, n2) cost matrix (lower = better; rejected pairs = M).
    """
    n1, n2 = scores.shape
    if n1 == 0 or n2 == 0:
        return []
    cost = np.concatenate(
        [
            np.concatenate([scores, np.ones((n1, n2))], axis=1),
            np.ones((n1, 2 * n2)),
        ],
        axis=0,
    )
    rows, cols = linear_sum_assignment(cost)
    return [
        (int(r), int(c))
        for r, c in zip(rows, cols)
        if r < n1 and c < n2 and scores[r, c] < _M / 2
    ]


def auction_assignment(
    benefit: jax.Array,
    row_mask: jax.Array,
    col_mask: jax.Array,
    n_iters: int = 200,
    eps: float = 1e-3,
):
    """Batched auction algorithm maximizing total benefit with rejection.

    Args:
      benefit: (..., n, m); entries <= 0 are treated as "prefer no match".
      row_mask/col_mask: validity of rows/cols (padding).
      n_iters: fixed sweep count (static shape; each sweep lets every
        unassigned row bid simultaneously, conflicts resolved by max bid).

    Returns:
      match: (..., n) int32 column index per row, -1 when unassigned.
    """
    n, m = benefit.shape[-2], benefit.shape[-1]
    neg = -_M
    b = jnp.where(row_mask[..., :, None] & col_mask[..., None, :], benefit, neg)

    def body(state, _):
        price, owner = state  # price (..., m); owner (..., m) int32 row or -1
        # current assignment per row
        assigned = jnp.any(
            owner[..., None, :] == jnp.arange(n)[:, None], axis=-1
        )  # (..., n)
        value = b - price[..., None, :]
        top2, idx2 = jax.lax.top_k(value, 2)
        best_j = idx2[..., 0]
        bid = top2[..., 0] - top2[..., 1] + eps
        want = (~assigned) & (top2[..., 0] > 0)  # only bid if positive value
        # resolve conflicts: for each column, the max bid among bidders wins
        bid_mat = jnp.where(
            want[..., :, None] & (best_j[..., :, None] == jnp.arange(m)),
            bid[..., :, None],
            neg,
        )  # (..., n, m)
        win_bid = jnp.max(bid_mat, axis=-2)
        win_row = jnp.argmax(bid_mat, axis=-2).astype(jnp.int32)
        has_bid = win_bid > neg / 2
        price = jnp.where(has_bid, price + win_bid, price)
        owner = jnp.where(has_bid, win_row, owner)
        return (price, owner), None

    price0 = jnp.zeros(benefit.shape[:-2] + (m,), benefit.dtype)
    owner0 = jnp.full(benefit.shape[:-2] + (m,), -1, jnp.int32)
    (price, owner), _ = jax.lax.scan(body, (price0, owner0), None, length=n_iters)

    # row -> col from col -> row via broadcast compare (a `.at[...,
    # row_ids].set` scatter would be numpy OUTER indexing across batch
    # dims — cross-batch garbage for any leading batch shape). A row
    # owns at most one column (assigned rows never bid; losing a column
    # unassigns the row), so argmax over the boolean ownership row is
    # exact.
    owner_eq = owner[..., None, :] == jnp.arange(n)[:, None]  # (..., n, m)
    match = jnp.argmax(owner_eq, axis=-1).astype(jnp.int32)
    return jnp.where(jnp.any(owner_eq, axis=-1), match, -1)
