"""FastSAMParams feature wiring through PerceptionFrontend: rotation,
erosion-gated lifting, triangle ignore regions, YOLO label filters, CLIP
bbox semantics (reference fastsam_wrapper.py:393-484, :420-438,
:331-335, :196-204)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from roman_tpu.data.camera import CameraParams
from roman_tpu.params.fastsam_params import FastSAMParams
from roman_tpu.perception import fastsam
from roman_tpu.perception.dinov2 import DINOV2_SMALL
from roman_tpu.perception.wrapper import (
    PerceptionFrontend,
    _mask_bboxes,
    rotate_images,
)

_CAM = CameraParams.simple(width=128, height=96, f=100.0)
_VIT = dataclasses.replace(DINOV2_SMALL, width=64, depth=2, heads=4,
                           img_size=84, dtype=jnp.float32)


def _base_params(**kw):
    defaults = dict(imgsz=(96, 128), max_masks_per_frame=8,
                    max_points_per_mask=64, max_depth=7.5,
                    min_mask_len_div=30, max_mask_len_div=2,
                    erosion_size=0, ignore_people=False,
                    conf=0.0)  # random seg weights: keep all proposals
    defaults.update(kw)
    return FastSAMParams(**defaults)


def _scene(rng, B=2):
    imgs = rng.uniform(size=(B, 96, 128, 3)).astype(np.float32)
    depths = np.full((B, 96, 128), 3.0, np.float32)
    return imgs, depths


def _fe(params, **kw):
    return PerceptionFrontend(params, _CAM, seg_cfg=fastsam.TINY_TEST,
                              vit_cfg=_VIT, **kw)


def test_mask_bboxes():
    """Reference mask_bounding_box semantics (fastsam_wrapper.py:577-600):
    a width x height box RE-CENTERED on the pixel centroid, not the
    tight min/max box."""
    masks = np.zeros((1, 3, 10, 12), bool)
    masks[0, 0, 2:5, 3:9] = True  # y in [2,4], x in [3,8]
    # L-shape: column x=0 y=0..7 plus row y=0 x=0..7 — centroid pulls
    # the window toward the corner, clipping the far lobes like the
    # reference does
    masks[0, 1, 0:8, 0] = True
    masks[0, 1, 0, 0:8] = True
    boxes = np.asarray(_mask_bboxes(jnp.asarray(masks)))
    # rect: centroid (3.0, 5.5), h=3 (hh=1), w=6 (hw=3) ->
    # rows int(2)..int(4), cols int(2.5)..int(8.5) -> (2,2,8,4) incl.
    np.testing.assert_allclose(boxes[0, 0], [2.0, 2.0, 9.0, 5.0])
    # L: centroid (28/15, 28/15)~1.87, h=w=8 (half 4) ->
    # rows/cols int(0)..int(5.87) -> (0,0,5,5) incl., NOT the tight 0..7
    np.testing.assert_allclose(boxes[0, 1], [0.0, 0.0, 6.0, 6.0])
    np.testing.assert_allclose(boxes[0, 2], [0.0, 0.0, 1.0, 1.0])  # empty


def test_rotate_images_roundtrip(rng):
    imgs = jnp.asarray(rng.uniform(size=(2, 6, 8, 3)).astype(np.float32))
    for how, inv in [("CW", "CCW"), ("CCW", "CW"), ("180", "180")]:
        back = rotate_images(rotate_images(imgs, how), inv)
        np.testing.assert_allclose(np.asarray(back), np.asarray(imgs))


def test_erosion_gates_lifted_points(rng):
    imgs, depths = _scene(rng, B=1)
    # point capacity above the full pixel budget so counts aren't clipped
    kw = dict(max_points_per_mask=4096)
    out_plain = _fe(_base_params(**kw)).run_batch(imgs, depths)
    out_eroded = _fe(_base_params(erosion_size=3, **kw)).run_batch(
        imgs, depths)
    # erosion shrinks the depth-lifting region, never grows it; the stored
    # masks stay un-eroded (erosion only gates lifting, reference
    # fastsam_wrapper.py:331-335)
    assert np.array_equal(out_plain.masks, out_eroded.masks)
    n_plain = out_plain.points_valid.sum(axis=-1)
    n_eroded = out_eroded.points_valid.sum(axis=-1)
    assert (n_eroded <= n_plain).all()
    assert n_plain.sum() > 0
    assert n_eroded.sum() < n_plain.sum()


def test_triangle_ignore_drops_overlapping_masks(rng):
    imgs, depths = _scene(rng)
    # triangle covering the central region of the image
    tri = [[[30, 20], [100, 20], [64, 90]]]
    out_plain = _fe(_base_params()).run_batch(imgs, depths)
    out_tri = _fe(_base_params(triangle_ignore_masks=tri)).run_batch(
        imgs, depths)
    assert (out_tri.valid <= out_plain.valid).all()
    # every surviving mask must avoid the triangle region entirely
    from roman_tpu.perception.wrapper import triangle_ignore_mask

    tri_px = triangle_ignore_mask(tri, 96, 128)
    f = _base_params().mask_downsample_factor
    tri_ds = tri_px[::f, ::f]
    for b, k in zip(*np.nonzero(out_tri.valid)):
        assert not (out_tri.masks[b, k] & tri_ds).any()


def test_yolo_label_filter_only_removes(rng):
    imgs, depths = _scene(rng)
    out_plain = _fe(_base_params()).run_batch(imgs, depths)
    fe = _fe(_base_params(ignore_people=True))
    assert fe.run_yolo and fe.yolo_model is not None
    out_yolo = fe.run_batch(imgs, depths)
    # label filtering only ANDs into validity; masks are unchanged
    assert np.array_equal(out_plain.masks, out_yolo.masks)
    assert (out_yolo.valid <= out_plain.valid).all()


def test_clip_semantics_path(rng):
    from roman_tpu.perception.clip import CLIP_VIT_B32

    clip_cfg = dataclasses.replace(CLIP_VIT_B32, width=64, depth=2, heads=4,
                                   img_size=64, proj_dim=32,
                                   dtype=jnp.float32)
    imgs, depths = _scene(rng, B=1)
    fe = _fe(_base_params(semantics="clip"), clip_cfg=clip_cfg)
    out = fe.run_batch(imgs, depths)
    assert out.embeddings.shape == (1, 8, 32)
    for b, k in zip(*np.nonzero(out.valid)):
        np.testing.assert_allclose(
            np.linalg.norm(out.embeddings[b, k]), 1.0, atol=1e-3)


def test_rotation_pipeline_runs(rng):
    """CW rotation swaps the working resolution; outputs must come back in
    the camera frame (same mask dims as the unrotated path)."""
    imgs, depths = _scene(rng, B=1)
    out = _fe(_base_params(rotate_img="CW")).run_batch(imgs, depths)
    f = _base_params().mask_downsample_factor
    assert out.masks.shape == (1, 8, 96 // f, 128 // f)
    obs = _fe(_base_params(rotate_img="CW")).observations(
        out, times=[0.0], poses=[np.eye(4)])
    assert isinstance(obs, list)


def test_label_filter_ignores_padding_boxes():
    """Regression: all-padding (0,0,0,0) ignore boxes contain pixel
    (0,0) and, at the any-overlap threshold, dropped every mask touching
    the top-left corner."""
    from roman_tpu.perception.wrapper import apply_label_filters

    masks = np.zeros((1, 2, 16, 16), bool)
    masks[0, 0, 0:10, 0:10] = True   # touches (0, 0)
    masks[0, 1, 4:8, 4:8] = True
    valid = np.ones((1, 2), bool)
    pad_boxes = np.zeros((1, 3, 4), np.float32)
    ok = apply_label_filters(jnp.asarray(masks), jnp.asarray(valid),
                             ignore_boxes=jnp.asarray(pad_boxes),
                             ignore_frac=1e-9)
    assert bool(ok[0, 0]) and bool(ok[0, 1])
    # a real box still filters
    real = np.array([[[0.0, 0.0, 12.0, 12.0], [0, 0, 0, 0],
                      [0, 0, 0, 0]]], np.float32)
    ok2 = apply_label_filters(jnp.asarray(masks), jnp.asarray(valid),
                              ignore_boxes=jnp.asarray(real),
                              ignore_frac=1e-9)
    assert not bool(ok2[0, 0])
