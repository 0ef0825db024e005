"""Alias module mirroring reference roman/align/roman_registration.py.

The reference configures the C++ ROMAN invariant through ROMANParams and
solves with CLIPPERPairwiseAndSingle (roman_registration.py:38-96); here
the same parameter surface configures the batched JAX/pallas engine
(roman_tpu.align.invariants / fused_register).
"""

from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Optional

from roman_tpu.align.object_registration import ObjectRegistration
from roman_tpu.align.registration import RegistrationConfig


class FusionMethod(Enum):
    """Consistency-fusion modes (roman_registration.py:11-14)."""

    GEOMETRIC_MEAN = "geometric_mean"
    ARITHMETIC_MEAN = "arithmetic_mean"
    PRODUCT = "product"


@dataclasses.dataclass
class ROMANParams:
    """Field-parity with reference ROMANParams (roman_registration.py:17-36)."""

    point_dim: int = 3
    fusion_method: FusionMethod = FusionMethod.GEOMETRIC_MEAN

    sigma: float = 0.4
    epsilon: float = 0.6
    mindist: float = 0.2

    gravity: bool = False
    volume: bool = False
    pca: bool = False
    extent: bool = False
    semantics_dim: int = 0
    gravity_unc_ang_rad: float = 0.0872665

    cos_min: float = 0.85
    cos_max: float = 1.0
    epsilon_shape: Optional[float] = None


def _method_for(p: ROMANParams) -> str:
    """Map the feature-flag combination onto the engine's method table
    (submap_align_params.py:98-116 semantics). Combinations outside the
    table keep method='roman' for naming but the config carries the
    EXACT flags via feature_overrides — the reference supports arbitrary
    combinations additively (roman_registration.py:55-70), so no
    combination is silently coerced."""
    flags = (p.gravity, p.volume, p.extent, p.pca, p.semantics_dim > 0)
    table = {
        (True, True, False, True, True): "roman",
        (True, True, True, False, True): "sevg",
        (False, True, False, True, True): "spv",
        (True, False, False, False, True): "semanticgrav",
        (True, True, False, True, False): "pcavolgrav",
        (True, True, True, False, False): "extentvolgrav",
        (True, False, False, False, False): "gravity",
        (False, False, False, False, False): "clipper",
    }
    return table.get(flags, "roman")


class ROMANRegistration(ObjectRegistration):
    """The paper's method with the reference's constructor surface."""

    def __init__(self, params: ROMANParams):
        fusion = (params.fusion_method.value
                  if isinstance(params.fusion_method, FusionMethod)
                  else str(params.fusion_method))
        cfg = RegistrationConfig(
            method=_method_for(params),
            feature_overrides=(params.gravity, params.volume, params.extent,
                               params.pca, params.semantics_dim > 0),
            dim=params.point_dim,
            fusion=fusion,
            sigma=params.sigma,
            epsilon=params.epsilon,
            mindist=params.mindist,
            epsilon_shape=(0.0 if params.epsilon_shape is None
                           else params.epsilon_shape),
            cos_min=params.cos_min,
            cos_max=params.cos_max,
            gravity_unc_ang_rad=params.gravity_unc_ang_rad,
        )
        super().__init__(cfg)
        self.params = params
