"""DINOv2 image encoder (flax) + torch/transformers weight converter.

Replaces the reference's DINOv2-base usage (fastsam_wrapper.py:184-188):
per-pixel patch features for mask embeddings and gap/gmp/gem-pooled frame
descriptors (fastsam_wrapper.py:650-666). Weights convert from a
transformers ``Dinov2Model`` state_dict (facebook/dinov2-base layout).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from roman_tpu.perception.vit import ViT, ViTConfig

DINOV2_BASE = ViTConfig(width=768, depth=12, heads=12, patch=14, img_size=518,
                        layerscale=True, dtype=jnp.bfloat16)
DINOV2_SMALL = ViTConfig(width=384, depth=12, heads=6, patch=14, img_size=518,
                         layerscale=True, dtype=jnp.bfloat16)

# ImageNet normalization used by DINOv2 preprocessing
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def make_model(cfg: ViTConfig = DINOV2_BASE) -> ViT:
    return ViT(cfg)


def preprocess(images_uint8: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) uint8 RGB -> normalized float."""
    x = images_uint8.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def convert_torch_state_dict(sd: Dict[str, "object"], cfg: ViTConfig) -> dict:
    """transformers Dinov2Model state_dict -> flax params for ViT.

    Key layout (transformers>=4.31 Dinov2Model):
      embeddings.cls_token, embeddings.mask_token, embeddings.position_embeddings,
      embeddings.patch_embeddings.projection.{weight,bias},
      encoder.layer.{i}.norm1.{weight,bias}
      encoder.layer.{i}.attention.attention.{query,key,value}.{weight,bias}
      encoder.layer.{i}.attention.output.dense.{weight,bias}
      encoder.layer.{i}.layer_scale1.lambda1
      encoder.layer.{i}.norm2..., .mlp.fc1/.fc2..., .layer_scale2.lambda1
      layernorm.{weight,bias}
    """
    def t(key):
        v = sd[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    p: dict = {}
    # patch embed: torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
    w = t("embeddings.patch_embeddings.projection.weight").transpose(2, 3, 1, 0)
    p["patch_embed"] = {"kernel": w, "bias": t("embeddings.patch_embeddings.projection.bias")}
    p["cls_token"] = t("embeddings.cls_token")
    p["pos_embed"] = t("embeddings.position_embeddings")
    for i in range(cfg.depth):
        pre = f"encoder.layer.{i}"
        q_w = t(f"{pre}.attention.attention.query.weight")
        k_w = t(f"{pre}.attention.attention.key.weight")
        v_w = t(f"{pre}.attention.attention.value.weight")
        qkv_w = np.concatenate([q_w, k_w, v_w], axis=0).T  # (D, 3D)
        qkv_b = np.concatenate(
            [t(f"{pre}.attention.attention.query.bias"),
             t(f"{pre}.attention.attention.key.bias"),
             t(f"{pre}.attention.attention.value.bias")]
        )
        p[f"block{i}"] = {
            "norm1": {"scale": t(f"{pre}.norm1.weight"), "bias": t(f"{pre}.norm1.bias")},
            "attn": {
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                "proj": {"kernel": t(f"{pre}.attention.output.dense.weight").T,
                         "bias": t(f"{pre}.attention.output.dense.bias")},
            },
            "ls1": {"gamma": t(f"{pre}.layer_scale1.lambda1")},
            "norm2": {"scale": t(f"{pre}.norm2.weight"), "bias": t(f"{pre}.norm2.bias")},
            "mlp": {
                "fc1": {"kernel": t(f"{pre}.mlp.fc1.weight").T, "bias": t(f"{pre}.mlp.fc1.bias")},
                "fc2": {"kernel": t(f"{pre}.mlp.fc2.weight").T, "bias": t(f"{pre}.mlp.fc2.bias")},
            },
            "ls2": {"gamma": t(f"{pre}.layer_scale2.lambda1")},
        }
    p["norm"] = {"scale": t("layernorm.weight"), "bias": t("layernorm.bias")}
    return {"params": p}


def load_from_torch_file(path: str, cfg: ViTConfig = DINOV2_BASE) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_torch_state_dict(sd, cfg)
