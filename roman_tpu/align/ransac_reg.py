"""Alias module mirroring reference roman/align/ransac_reg.py.

The reference wraps open3d correspondence-based RANSAC over object
centers (ransac_reg.py:9-54); here the batched-hypothesis RANSAC in
roman_tpu.align.registration.register_ransac does the same job on
device, exposed through the per-pair class surface.
"""

from __future__ import annotations

from typing import List

import numpy as np

from roman_tpu.align.object_registration import (ObjectRegistration,
                                                 segments_to_features)
from roman_tpu.align.registration import RegistrationConfig, register_ransac


class RansacReg(ObjectRegistration):
    def __init__(self, max_correspondence_distance: float = 0.5,
                 num_iterations: int = 4096, dim: int = 3):
        cfg = RegistrationConfig(method="ransac", dim=dim,
                                 epsilon=max_correspondence_distance,
                                 ransac_iter=num_iterations)
        super().__init__(cfg)

    def register(self, map1: List, map2: List, seed: int = 0) -> np.ndarray:
        import jax

        if len(map1) == 0 or len(map2) == 0:
            return np.array([[]])
        f1 = segments_to_features(map1, self.cfg)
        f2 = segments_to_features(map2, self.cfg)
        res = register_ransac(f1, f2, self.cfg, jax.random.key(seed),
                              max_corr_dist=self.cfg.epsilon)
        return np.argwhere(np.asarray(res.sel))
