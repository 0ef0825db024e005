"""CLIP image encoder (flax) + torch/transformers weight converter.

Replaces the reference's OpenAI CLIP ViT-L/14 usage for per-mask bbox
embeddings (fastsam_wrapper.py:181-183, :393-406). Weights convert from a
transformers ``CLIPVisionModelWithProjection`` state_dict.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from roman_tpu.perception.vit import ViT, ViTConfig

CLIP_VIT_L14 = ViTConfig(width=1024, depth=24, heads=16, patch=14, img_size=224,
                         layerscale=False, quick_gelu=True, pre_ln=True,
                         proj_dim=768, patch_bias=False, ln_eps=1e-5,
                         dtype=jnp.bfloat16)
CLIP_VIT_B32 = ViTConfig(width=768, depth=12, heads=12, patch=32, img_size=224,
                         layerscale=False, quick_gelu=True, pre_ln=True,
                         proj_dim=512, patch_bias=False, ln_eps=1e-5,
                         dtype=jnp.bfloat16)

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def make_model(cfg: ViTConfig = CLIP_VIT_L14) -> ViT:
    return ViT(cfg)


def preprocess(images_uint8: jnp.ndarray) -> jnp.ndarray:
    x = images_uint8.astype(jnp.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


def convert_torch_state_dict(sd: Dict[str, "object"], cfg: ViTConfig) -> dict:
    """transformers CLIPVisionModel(.vision_model) layout -> flax ViT params."""
    def t(key):
        v = sd[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    pre = "vision_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    p: dict = {}
    w = t(f"{pre}embeddings.patch_embedding.weight").transpose(2, 3, 1, 0)
    p["patch_embed"] = {"kernel": w}
    p["cls_token"] = t(f"{pre}embeddings.class_embedding").reshape(1, 1, -1)
    p["pos_embed"] = t(f"{pre}embeddings.position_embedding.weight")[None]
    p["ln_pre"] = {"scale": t(f"{pre}pre_layrnorm.weight"),
                   "bias": t(f"{pre}pre_layrnorm.bias")}
    for i in range(cfg.depth):
        b = f"{pre}encoder.layers.{i}"
        qkv_w = np.concatenate(
            [t(f"{b}.self_attn.q_proj.weight"), t(f"{b}.self_attn.k_proj.weight"),
             t(f"{b}.self_attn.v_proj.weight")], axis=0).T
        qkv_b = np.concatenate(
            [t(f"{b}.self_attn.q_proj.bias"), t(f"{b}.self_attn.k_proj.bias"),
             t(f"{b}.self_attn.v_proj.bias")])
        p[f"block{i}"] = {
            "norm1": {"scale": t(f"{b}.layer_norm1.weight"), "bias": t(f"{b}.layer_norm1.bias")},
            "attn": {
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                "proj": {"kernel": t(f"{b}.self_attn.out_proj.weight").T,
                         "bias": t(f"{b}.self_attn.out_proj.bias")},
            },
            "norm2": {"scale": t(f"{b}.layer_norm2.weight"), "bias": t(f"{b}.layer_norm2.bias")},
            "mlp": {
                "fc1": {"kernel": t(f"{b}.mlp.fc1.weight").T, "bias": t(f"{b}.mlp.fc1.bias")},
                "fc2": {"kernel": t(f"{b}.mlp.fc2.weight").T, "bias": t(f"{b}.mlp.fc2.bias")},
            },
        }
    p["norm"] = {"scale": t(f"{pre}post_layernorm.weight"),
                 "bias": t(f"{pre}post_layernorm.bias")}
    if "visual_projection.weight" in sd:
        p["proj"] = t("visual_projection.weight").T
    return {"params": p}
