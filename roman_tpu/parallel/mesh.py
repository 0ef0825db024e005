"""Device mesh / sharding utilities.

The reference is a single-process serial pipeline (SURVEY §2.4); its only
parallelizable hot loop is the all-pairs submap registration grid
(submap_align.py:93-201). Here that grid is the unit of data parallelism:
submap feature tensors are tiny (≤ max_size objects × ~780 features), so
they are replicated, and the pair axis is sharded across the mesh — every
collective rides ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, axis_name: str = "pairs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_pairs(tree, mesh: Mesh, axis_name: str = "pairs"):
    """Place a pytree of (P, ...) arrays sharded along the leading pair axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicated(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
