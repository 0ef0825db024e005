"""Frame descriptors from DINOv2 patch features.

Parity with reference FastSAMWrapper.get_frame_descriptor
(fastsam_wrapper.py:650-666): gap (global average pool), gmp (global max
pool), gem (generalized mean, p=3) over the patch grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_descriptor(patches: jax.Array, kind: str = "dino-gem", gem_p: float = 3.0):
    """patches: (..., gh, gw, D) -> (..., D)."""
    flat = patches.reshape(patches.shape[:-3] + (-1, patches.shape[-1]))
    kind = kind.split("-")[-1]
    if kind == "gap":
        return jnp.mean(flat, axis=-2)
    if kind == "gmp":
        return jnp.max(flat, axis=-2)
    if kind == "gem":
        x = jnp.clip(flat, 1e-6, None)
        return jnp.mean(x**gem_p, axis=-2) ** (1.0 / gem_p)
    raise ValueError(f"unknown frame descriptor {kind!r}")


def masked_mean_embedding(pixel_features: jax.Array, masks: jax.Array):
    """Per-mask mean of per-pixel features.

    pixel_features: (H, W, D); masks: (M, H, W) bool ->  (M, D).
    Batched equivalent of the reference's mean-DINO-per-pixel mask
    embedding (fastsam_wrapper.py:407-414).
    """
    m = masks.astype(pixel_features.dtype)
    num = jnp.einsum("mhw,hwd->md", m, pixel_features)
    den = jnp.maximum(jnp.sum(m, axis=(-2, -1)), 1.0)
    return num / den[..., None]
