"""Class-surface parity with reference roman/align/object_registration.py.

The reference exposes registration as classes solving ONE submap pair at
a time through C++ clipperpy (object_registration.py:17-159). The TPU
engine is functional and batched (roman_tpu.align.registration registers
a whole pair grid in one jit'd program) — these classes adapt that engine
onto the reference's per-pair surface so migrating code keeps working:

    reg = ROMANRegistration(params)          # roman_registration.py:38
    A   = reg.register(segs1, segs2)         # (k, 2) association indices
    T   = reg.T_align(segs1, segs2, A)       # 4x4 aligning map2 -> map1

For throughput use the batched engine / PairGridRegistrar directly — the
per-pair adapter pays one device dispatch per call.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from roman_tpu.align.registration import (RegistrationConfig, build_features,
                                          get_MCA as _get_MCA_fn,
                                          mno_clipper as _mno_clipper_fn,
                                          register_clipper)
from roman_tpu.ops.se3_np import arun_np


class InsufficientAssociationsException(Exception):
    """Raised by T_align when < dim correspondences are available
    (reference object_registration.py:8-15, :106-108)."""

    def __init__(self, map1_len, map2_len, n_associations=None):
        self.map1_len = map1_len
        self.map2_len = map2_len
        self.n_associations = n_associations
        super().__init__(
            f"Insufficient associations. Map 1 length: {map1_len}. "
            f"Map 2 length: {map2_len}. Associations: {n_associations}"
        )


def _center_of(obj) -> np.ndarray:
    return np.asarray(obj.center).reshape(-1)[:3]


def segments_to_features(objs: Sequence, cfg: RegistrationConfig,
                         capacity: Optional[int] = None):
    """Pack one object list (SegmentData / reference-like objects exposing
    center, volume, extent, linearity/planarity/scattering or pca_attrs,
    semantic_descriptor) into unbatched SubmapFeatures — the feature
    layout of ROMANRegistration._object_to_clipper_list
    (roman_registration.py:98-108)."""
    import jax.numpy as jnp

    cap = capacity or max(len(objs), 1)
    centers = np.zeros((cap, 3), np.float32)
    pca = np.zeros((cap, 3), np.float32)
    volume = np.zeros((cap,), np.float32)
    extent = np.zeros((cap, 3), np.float32)
    valid = np.zeros((cap,), bool)
    desc_dim = 0
    for s in objs:
        d = getattr(s, "semantic_descriptor", None)
        if d is not None:
            desc_dim = np.asarray(d).reshape(-1).shape[0]
            break
    desc = np.zeros((cap, desc_dim), np.float32)
    for j, s in enumerate(objs[:cap]):
        centers[j] = _center_of(s)
        if hasattr(s, "pca_attrs"):
            pca[j] = np.asarray(s.pca_attrs).reshape(3)
        elif hasattr(s, "linearity"):
            pca[j] = (s.linearity, s.planarity, s.scattering)
        volume[j] = getattr(s, "volume", 0.0)
        e = getattr(s, "extent", None)
        if e is not None:
            extent[j] = np.asarray(e).reshape(3)
        d = getattr(s, "semantic_descriptor", None)
        if desc_dim and d is not None:
            d = np.asarray(d).reshape(-1)
            desc[j] = d / max(np.linalg.norm(d), 1e-9)
        valid[j] = True
    return build_features(
        jnp.asarray(centers), jnp.asarray(valid), cfg,
        pca_attrs=jnp.asarray(pca), volume=jnp.asarray(volume),
        extent=jnp.asarray(extent), descriptors=jnp.asarray(desc),
    )


class ObjectRegistration:
    """Per-pair adapter over the batched engine. Subclasses pick the
    method via their RegistrationConfig (reference template:
    object_registration.py:17-86)."""

    def __init__(self, cfg: Optional[RegistrationConfig] = None, dim: int = 3):
        self.cfg = cfg if cfg is not None else RegistrationConfig(dim=dim)
        self.dim = self.cfg.dim

    def _features(self, map1: List, map2: List):
        from roman_tpu.align.invariants import SubmapFeatures

        if isinstance(map1, SubmapFeatures):
            return map1, map2
        return (segments_to_features(map1, self.cfg),
                segments_to_features(map2, self.cfg))

    @staticmethod
    def _size(m) -> int:
        """Object count of a list or an (unbatched) SubmapFeatures."""
        from roman_tpu.align.invariants import SubmapFeatures

        if isinstance(m, SubmapFeatures):
            return int(np.asarray(m.valid).sum())
        return len(m)

    def register(self, map1: List, map2: List) -> np.ndarray:
        """Solve the pair, return the (k, 2) selected association index
        array — the reference's return contract (:22-29)."""
        if self._size(map1) == 0 or self._size(map2) == 0:
            return np.array([[]])
        f1, f2 = self._features(map1, map2)
        res = register_clipper(f1, f2, self.cfg)
        sel = np.asarray(res.sel)
        return np.argwhere(sel)

    def T_align(self, map1: List, map2: List,
                correspondences: Optional[np.ndarray] = None) -> np.ndarray:
        """4x4 aligning map2 -> map1 via weighted Arun SVD (:88-129)."""
        from roman_tpu.align.invariants import SubmapFeatures

        n1, n2 = self._size(map1), self._size(map2)
        if n1 == 0 or n2 == 0:
            raise InsufficientAssociationsException(n1, n2)
        if correspondences is None:
            correspondences = self.register(map1, map2)
        correspondences = np.asarray(correspondences).reshape(-1, 2)
        if len(correspondences) < self.dim:
            raise InsufficientAssociationsException(
                n1, n2, len(correspondences))

        def centers(m, idx):
            if isinstance(m, SubmapFeatures):
                return np.asarray(m.centers)[idx]
            return np.stack([_center_of(m[k]) for k in idx])

        pts1 = centers(map1, correspondences[:, 0])
        pts2 = centers(map2, correspondences[:, 1])
        return arun_np(pts1, pts2)

    def get_MCA(self, map1: List, map2: List):
        """Affinity M, constraint C, all-to-all association list A
        (:50-55). N = len(map1) * len(map2) — unpadded, matching the
        reference shapes."""
        f1, f2 = self._features(map1, map2)
        M, C, A = _get_MCA_fn(f1, f2, self.cfg)
        n, m = self._size(map1), self._size(map2)
        keep = np.array([a * f2.capacity + b for a in range(n) for b in range(m)])
        M = np.asarray(M)[np.ix_(keep, keep)]
        C = np.asarray(C)[np.ix_(keep, keep)]
        A = np.stack([keep // f2.capacity, keep % f2.capacity], axis=-1)
        return M, C, A

    def mno_clipper(self, map1: List, map2: List, num_solutions: int = 2):
        """Multiple non-overlapping solutions (:57-86): list of
        ((k,2) associations, score) per solution."""
        f1, f2 = self._features(map1, map2)
        sols = _mno_clipper_fn(f1, f2, self.cfg, num_solutions=num_solutions)
        return [(np.argwhere(np.asarray(sel)), float(F))
                for sel, count, F in sols]
