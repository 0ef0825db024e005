"""Frame descriptors from DINOv2 patch features.

Parity with reference FastSAMWrapper.get_frame_descriptor
(fastsam_wrapper.py:650-666): gap (global average pool), gmp (global max
pool), gem (generalized mean, p=3) over the patch grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_descriptor(patches: jax.Array, kind: str = "dino-gem", gem_p: float = 3.0):
    """patches: (..., gh, gw, D) -> (..., D), L2-normalized.

    gem is the reference's SIGNED generalized mean: mean(x^3) per
    channel then sign(.)*|.|^(1/3) (fastsam_wrapper.py:658-661) — DINO
    patch features are ~zero-mean, so clipping negatives (an earlier
    bug here) collapsed roughly half the channels to a constant. gap
    uses mean where the reference sums; after the reference's own final
    L2 normalization (fastsam_wrapper.py:664, applied to every kind)
    the two differ only by a positive scale, i.e. not at all."""
    flat = patches.reshape(patches.shape[:-3] + (-1, patches.shape[-1]))
    kind = kind.split("-")[-1]
    if kind == "gap":
        d = jnp.mean(flat, axis=-2)
    elif kind == "gmp":
        d = jnp.max(flat, axis=-2)
    elif kind == "gem":
        cubed = jnp.mean(flat**gem_p, axis=-2)
        d = jnp.sign(cubed) * jnp.maximum(jnp.abs(cubed), 1e-12) ** (
            1.0 / gem_p)
    else:
        raise ValueError(f"unknown frame descriptor {kind!r}")
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


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
