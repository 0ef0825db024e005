"""Vision Transformer backbone in flax — shared by the DINOv2 and CLIP
image encoders that replace the reference's torch models
(fastsam_wrapper.py:181-188 loads CLIP ViT-L/14 + DINOv2-base).

Design: one configurable encoder covering both families —
- DINOv2: conv patch embed, learned pos embed (+cls), pre-norm blocks with
  LayerScale, GELU MLP, final LayerNorm; outputs cls + patch tokens.
- CLIP vision: conv patch embed (no bias), cls token, pre-LN transformer
  with quickGELU, post-LN + linear projection.

Everything is batched over frames and runs in bfloat16 on the MXU with
f32 layer norms / softmax accumulation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    width: int = 768
    depth: int = 12
    heads: int = 12
    patch: int = 14
    img_size: int = 518
    mlp_ratio: float = 4.0
    layerscale: bool = True         # DINOv2 LayerScale
    quick_gelu: bool = False        # CLIP uses x*sigmoid(1.702x)
    pre_ln: bool = False            # CLIP applies LN before the blocks
    proj_dim: Optional[int] = None  # CLIP output projection
    patch_bias: bool = True
    ln_eps: float = 1e-6            # CLIP uses 1e-5
    dtype: jnp.dtype = jnp.float32

    @property
    def grid(self) -> int:
        return self.img_size // self.patch


def _gelu(x, quick: bool):
    if quick:
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        hidden = int(self.cfg.width * self.cfg.mlp_ratio)
        x = nn.Dense(hidden, dtype=self.cfg.dtype, name="fc1")(x)
        x = _gelu(x, self.cfg.quick_gelu)
        return nn.Dense(self.cfg.width, dtype=self.cfg.dtype, name="fc2")(x)


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, N, D = x.shape
        qkv = nn.Dense(3 * D, dtype=c.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, N, c.heads, D // c.heads).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scale = (D // c.heads) ** -0.5
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(D, dtype=c.dtype, name="proj")(out)


class LayerScale(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(1e-5), (self.dim,))
        return x * gamma


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32, name="norm1")(x)
        h = Attention(c, name="attn")(h)
        if c.layerscale:
            h = LayerScale(c.width, name="ls1")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32, name="norm2")(x)
        h = Mlp(c, name="mlp")(h)
        if c.layerscale:
            h = LayerScale(c.width, name="ls2")(h)
        return x + h


class ViT(nn.Module):
    """Returns (cls_token (B, D[proj]), patch_tokens (B, H', W', D))."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3), already normalized."""
        c = self.cfg
        B, H, W, _ = images.shape
        gh, gw = H // c.patch, W // c.patch
        x = nn.Conv(c.width, (c.patch, c.patch), strides=(c.patch, c.patch),
                    use_bias=c.patch_bias, dtype=c.dtype, name="patch_embed")(images)
        x = x.reshape(B, gh * gw, c.width)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.width))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, c.width)).astype(c.dtype), x],
                            axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, c.grid * c.grid + 1, c.width),
        )
        x = x + interpolate_pos_embed(pos, gh, gw, c.grid).astype(c.dtype)

        if c.pre_ln:
            x = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32, name="ln_pre")(x)
        for i in range(c.depth):
            x = Block(c, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32, name="norm")(x)

        cls_out = x[:, 0]
        patches = x[:, 1:].reshape(B, gh, gw, c.width)
        if c.proj_dim is not None:
            proj = self.param("proj", nn.initializers.normal(0.02),
                              (c.width, c.proj_dim))
            cls_out = cls_out @ proj
        return cls_out, patches


def interpolate_pos_embed(pos: jax.Array, gh: int, gw: int, grid: int) -> jax.Array:
    """Bicubic-ish (bilinear) interpolation of the learned position
    embedding to the input grid (DINOv2 interpolate_pos_encoding)."""
    if gh == grid and gw == grid:
        return pos
    cls_pos = pos[:, :1]
    patch_pos = pos[:, 1:].reshape(1, grid, grid, -1)
    patch_pos = jax.image.resize(patch_pos, (1, gh, gw, patch_pos.shape[-1]),
                                 method="bilinear")
    return jnp.concatenate([cls_pos, patch_pos.reshape(1, gh * gw, -1)], axis=1)


def upsample_patch_features(patches: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear per-pixel upsample of (B, gh, gw, D) patch features to
    (B, out_h, out_w, D) — reference fastsam_wrapper.py:602-648 does this
    per image with cv2; here it's one batched resize."""
    B, gh, gw, D = patches.shape
    return jax.image.resize(patches, (B, out_h, out_w, D), method="bilinear")
