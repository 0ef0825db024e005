"""Alias module mirroring reference roman/align/dist_reg_with_pruning.py.

The "clipper+prune" baseline: Euclidean-distance CLIPPER over candidate
associations pre-pruned by semantic cosine and shape-ratio thresholds,
with a post-hoc gravity (roll/pitch) check
(dist_reg_with_pruning.py:15-99). The batched equivalent is
roman_tpu.align.registration.register_clipper_prune; this class gives the
reference's per-pair surface.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from roman_tpu.align.object_registration import (ObjectRegistration,
                                                 segments_to_features)
from roman_tpu.align.registration import (RegistrationConfig,
                                          register_clipper_prune)
from roman_tpu.ops.se3_np import T_to_xyzrpy


class GravityConstraintError(Exception):
    """Estimated alignment violates the roll/pitch bound
    (dist_reg_with_pruning.py:12, :37-44)."""


class DistRegWithPruning(ObjectRegistration):
    """Constructor signature mirrors reference
    dist_reg_with_pruning.py:17-18 exactly:
    (sigma, epsilon, mindist=0.0, shape_epsilon=0.0, cos_min=0.85,
     dim=3, use_gravity=False, roll_pitch_thresh=np.deg2rad(5))."""

    def __init__(self, sigma: float, epsilon: float,
                 mindist: float = 0.0, shape_epsilon: float = 0.0,
                 cos_min: float = 0.85, dim: int = 3,
                 use_gravity: bool = False,
                 roll_pitch_thresh: float = float(np.deg2rad(5))):
        assert not use_gravity or dim == 3, \
            "Gravity can only be used with 3D points"
        cfg = RegistrationConfig(
            method="clipper+prune", dim=dim, sigma=sigma, epsilon=epsilon,
            mindist=mindist, cos_min=cos_min, epsilon_shape=shape_epsilon,
            roll_pitch_thresh=roll_pitch_thresh,
        )
        super().__init__(cfg)
        self.use_gravity = use_gravity
        # cos_min <= -1 / shape_epsilon <= 0 prune nothing (reference
        # semantics: thresholds always applied; these values are no-ops)
        self.prune_semantics = cos_min > -1.0
        self.prune_shape = shape_epsilon > 0.0

    def _prune_kwargs(self, map1: List, map2: List, f1, f2):
        import jax.numpy as jnp

        kw = {}
        if self.prune_shape:
            # clipper+prune features are centers-only, so the shape
            # attrs used for pruning are packed from the raw objects
            def attrs(objs, cap):
                pca = np.zeros((cap, 3), np.float32)
                vol = np.zeros((cap,), np.float32)
                for j, o in enumerate(objs[:cap]):
                    if hasattr(o, "pca_attrs"):
                        pca[j] = np.asarray(o.pca_attrs).reshape(3)
                    elif hasattr(o, "linearity"):
                        pca[j] = (o.linearity, o.planarity, o.scattering)
                    vol[j] = getattr(o, "volume", 0.0)
                return jnp.asarray(pca), jnp.asarray(vol)

            kw["pca_attrs1"], kw["volume1"] = attrs(map1, f1.capacity)
            kw["pca_attrs2"], kw["volume2"] = attrs(map2, f2.capacity)
        if self.prune_semantics:
            def descs(objs, cap):
                d0 = next((np.asarray(o.semantic_descriptor).reshape(-1)
                           for o in objs
                           if getattr(o, "semantic_descriptor", None) is not None),
                          None)
                if d0 is None:
                    return None
                out = np.zeros((cap, d0.shape[0]), np.float32)
                for j, o in enumerate(objs[:cap]):
                    d = getattr(o, "semantic_descriptor", None)
                    if d is not None:
                        d = np.asarray(d).reshape(-1)
                        out[j] = d / max(np.linalg.norm(d), 1e-9)
                return jnp.asarray(out)

            d1 = descs(map1, f1.capacity)
            d2 = descs(map2, f2.capacity)
            if d1 is not None and d2 is not None:
                kw["descriptors1"], kw["descriptors2"] = d1, d2
        return kw

    def register(self, map1: List, map2: List) -> np.ndarray:
        if len(map1) == 0 or len(map2) == 0:
            return np.array([[]])
        f1 = segments_to_features(map1, self.cfg)
        f2 = segments_to_features(map2, self.cfg)
        # clipper+prune builds shape/semantic prune masks from raw attrs
        # (the features themselves are centers-only for this method)
        res = register_clipper_prune(f1, f2, self.cfg,
                                     **self._prune_kwargs(map1, map2, f1, f2))
        return np.argwhere(np.asarray(res.sel))

    def T_align(self, map1: List, map2: List,
                correspondences: Optional[np.ndarray] = None) -> np.ndarray:
        T = super().T_align(map1, map2, correspondences)
        if self.use_gravity:
            _, _, _, roll, pitch, _ = T_to_xyzrpy(T)
            if (abs(roll) > self.cfg.roll_pitch_thresh
                    or abs(pitch) > self.cfg.roll_pitch_thresh):
                raise GravityConstraintError(
                    f"roll={roll:.3f} pitch={pitch:.3f} exceed "
                    f"{self.cfg.roll_pitch_thresh:.3f} rad")
        return T
