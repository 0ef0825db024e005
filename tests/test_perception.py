import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

_GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures",
                       "perception_golden.npz")


def _golden(prefix):
    """(state_dict, image, expected) from the committed torch-activation
    fixture (tests/fixtures/gen_perception_golden.py) — converter parity
    is regression-tested without a live torch install (the converters
    accept plain numpy dicts)."""
    data = np.load(_GOLDEN)
    sd = {k[len(prefix) + 4:]: data[k] for k in data.files
          if k.startswith(prefix + ".sd.")}
    return sd, data["image"], data[[k for k in data.files
                                    if k.startswith(prefix + ".expected")][0]]


def test_dinov2_matches_golden():
    """Converter + flax forward vs frozen torch activations — runs in any
    environment (no torch needed; protects the contract of reference
    roman/map/fastsam_wrapper.py:184-188)."""
    from roman_tpu.perception import dinov2
    from roman_tpu.perception.vit import ViT, ViTConfig

    sd, img, expected = _golden("dinov2")
    jcfg = ViTConfig(width=32, depth=2, heads=4, patch=14, img_size=56,
                     layerscale=True, dtype=jnp.float32)
    params = dinov2.convert_torch_state_dict(sd, jcfg)
    cls_out, patches = ViT(jcfg).apply(params, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(cls_out), expected[:, 0], atol=2e-4)
    got_patches = np.asarray(patches).reshape(2, -1, 32)
    np.testing.assert_allclose(got_patches, expected[:, 1:], atol=2e-4)


def test_clip_matches_golden():
    from roman_tpu.perception import clip as clip_mod
    from roman_tpu.perception.vit import ViT, ViTConfig

    sd, img, expected = _golden("clip")
    jcfg = ViTConfig(width=32, depth=2, heads=4, patch=14, img_size=56,
                     layerscale=False, quick_gelu=True, pre_ln=True,
                     proj_dim=16, patch_bias=False, ln_eps=1e-5,
                     dtype=jnp.float32)
    params = clip_mod.convert_torch_state_dict(sd, jcfg)
    cls_out, _ = ViT(jcfg).apply(params, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(cls_out), expected, atol=2e-4)


def test_dinov2_matches_transformers(rng):
    """Numerical parity of the flax ViT + converter against transformers'
    Dinov2Model on a tiny random-weight config (no downloads needed)."""
    torch = pytest.importorskip("torch")
    from transformers import Dinov2Config, Dinov2Model

    from roman_tpu.perception import dinov2
    from roman_tpu.perception.vit import ViT, ViTConfig

    tcfg = Dinov2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, patch_size=14, image_size=56,
        layerscale_value=0.5,
    )
    torch.manual_seed(0)
    tmodel = Dinov2Model(tcfg).eval()

    jcfg = ViTConfig(width=32, depth=2, heads=4, patch=14, img_size=56,
                     layerscale=True, dtype=jnp.float32)
    params = dinov2.convert_torch_state_dict(tmodel.state_dict(), jcfg)

    img = rng.uniform(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.tensor(img.transpose(0, 3, 1, 2))).last_hidden_state.numpy()

    cls_out, patches = ViT(jcfg).apply(params, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(cls_out), tout[:, 0], atol=2e-4)
    got_patches = np.asarray(patches).reshape(2, -1, 32)
    np.testing.assert_allclose(got_patches, tout[:, 1:], atol=2e-4)


def test_clip_matches_transformers(rng):
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from roman_tpu.perception import clip as clip_mod
    from roman_tpu.perception.vit import ViT, ViTConfig

    tcfg = CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, patch_size=14, image_size=56,
        projection_dim=16, hidden_act="quick_gelu",
    )
    torch.manual_seed(1)
    tmodel = CLIPVisionModelWithProjection(tcfg).eval()

    jcfg = ViTConfig(width=32, depth=2, heads=4, patch=14, img_size=56,
                     layerscale=False, quick_gelu=True, pre_ln=True,
                     proj_dim=16, patch_bias=False, ln_eps=1e-5, dtype=jnp.float32)
    params = clip_mod.convert_torch_state_dict(tmodel.state_dict(), jcfg)

    img = rng.uniform(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.tensor(img.transpose(0, 3, 1, 2))).image_embeds.numpy()
    cls_out, _ = ViT(jcfg).apply(params, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(cls_out), tout, atol=2e-4)


def test_pos_embed_interpolation(rng):
    from roman_tpu.perception.vit import ViT, ViTConfig

    cfg = ViTConfig(width=32, depth=1, heads=4, patch=14, img_size=56,
                    dtype=jnp.float32)
    model = ViT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))
    # different input resolution than the pos-embed grid
    cls_out, patches = model.apply(params, jnp.zeros((1, 112, 84, 3)))
    assert patches.shape == (1, 8, 6, 32)


def test_frame_descriptor_pooling(rng):
    from roman_tpu.perception.frame_descriptor import frame_descriptor

    # ZERO-MEAN features (like DINO patches): the reference's signed
    # cube-root gem keeps negative channels; clipping them (an earlier
    # bug) collapsed ~half the signal. Every kind is L2-normalized like
    # the reference (fastsam_wrapper.py:658-664).
    patches = jnp.asarray(
        rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    gap = np.asarray(frame_descriptor(patches, "dino-gap"))
    gmp = np.asarray(frame_descriptor(patches, "dino-gmp"))
    gem = np.asarray(frame_descriptor(patches, "dino-gem"))
    p = np.asarray(patches).reshape(2, -1, 16)

    def unit(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    np.testing.assert_allclose(gap, unit(p.mean(axis=1)), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(gmp, unit(p.max(axis=1)), rtol=1e-5,
                               atol=1e-6)
    cubed = (p ** 3).mean(axis=1)
    ref_gem = unit(np.sign(cubed) * np.abs(cubed) ** (1 / 3))
    np.testing.assert_allclose(gem, ref_gem, rtol=1e-3, atol=1e-6)
    # negative channels survive (the torch reference keeps their sign)
    assert (gem < 0).any()
    np.testing.assert_allclose(np.linalg.norm(gem, axis=-1), 1.0, rtol=1e-5)


def test_orbax_checkpoint_roundtrip(tmp_path, rng):
    import jax
    from roman_tpu.perception.checkpoints import save_params, load_params
    from roman_tpu.perception.vit import ViT, ViTConfig

    cfg = ViTConfig(width=32, depth=1, heads=4, patch=14, img_size=56,
                    dtype=jnp.float32)
    model = ViT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))
    path = str(tmp_path / "ckpt")
    save_params(params, path)
    restored = load_params(path, like=params)
    a = model.apply(params, jnp.ones((1, 56, 56, 3)))[0]
    b = model.apply(restored, jnp.ones((1, 56, 56, 3)))[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_clip_bbox_embeddings(rng):
    import jax
    from roman_tpu.perception.wrapper import clip_bbox_embeddings
    from roman_tpu.perception.vit import ViT, ViTConfig

    cfg = ViTConfig(width=32, depth=1, heads=4, patch=14, img_size=56,
                    quick_gelu=True, pre_ln=True, proj_dim=16,
                    patch_bias=False, ln_eps=1e-5, dtype=jnp.float32,
                    layerscale=False)
    model = ViT(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))
    images = jnp.asarray(rng.uniform(size=(2, 96, 128, 3)).astype(np.float32))
    boxes = jnp.asarray([[[10.0, 10.0, 60.0, 50.0], [0.0, 0.0, 128.0, 96.0]],
                         [[30.0, 5.0, 90.0, 80.0], [20.0, 20.0, 40.0, 40.0]]])
    emb = clip_bbox_embeddings(images, boxes, model, variables, out_size=56)
    assert emb.shape == (2, 2, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0,
                               atol=1e-4)
    # different boxes on the same frame give different embeddings
    assert not np.allclose(np.asarray(emb[0, 0]), np.asarray(emb[0, 1]))
