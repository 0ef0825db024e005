"""FastSAM-style everything-mode segmentation network in flax.

The reference runs FastSAM-x (a YOLOv8x-seg trained for class-agnostic
"segment everything", CASIA-IVA-Lab/FastSAM) through ultralytics/torch
(fastsam_wrapper.py:90, :517-525). This module implements the YOLOv8-seg
architecture natively in flax/XLA — CSP backbone (Conv-BN-SiLU, C2f,
SPPF), PAN-FPN neck, decoupled detect head with DFL box regression, mask
coefficient head and prototype net — plus batched, static-shape
postprocessing (DFL decode, class-agnostic NMS, prototype-mask assembly)
so whole frame batches segment in one jit'd program.

A converter maps ultralytics state_dicts (model.{idx}.* layout of the
yolov8x-seg config) onto these modules; with no weights available the
architecture still runs (random init) for shape/pipeline testing.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class YoloSegConfig:
    """yolov8{n,s,m,l,x}-seg scaling. FastSAM-x == x scale, nc=1."""

    width_mult: float = 1.25     # x
    depth_mult: float = 1.0      # x
    max_channels: int = 512
    nc: int = 1                  # FastSAM: single "object" class
    reg_max: int = 16
    nm: int = 32                 # mask coefficients
    dtype: jnp.dtype = jnp.bfloat16

    def ch(self, c: int) -> int:
        return int(min(c, self.max_channels) * self.width_mult)

    def n(self, n: int) -> int:
        return max(round(n * self.depth_mult), 1)


FASTSAM_X = YoloSegConfig(width_mult=1.25, depth_mult=1.0)
# yolov8 scale table: s = (depth 0.33, width 0.50, max_channels 1024) —
# the x-scale 512 cap would build the P5 trunk half-width (ch(1024) =
# 256 instead of the real yolov8s-seg's 512) and real FastSAM-s
# checkpoints would shape-mismatch at model.7+
FASTSAM_S = YoloSegConfig(width_mult=0.5, depth_mult=0.33,
                          max_channels=1024)
TINY_TEST = YoloSegConfig(width_mult=0.125, depth_mult=0.33, nm=8)


class ConvBnSiLU(nn.Module):
    out: int
    k: int = 1
    s: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.k // 2
        x = nn.Conv(self.out, (self.k, self.k), strides=(self.s, self.s),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=jnp.float32, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = ConvBnSiLU(self.out, 3, dtype=self.dtype, name="cv1")(x)
        h = ConvBnSiLU(self.out, 3, dtype=self.dtype, name="cv2")(h)
        return x + h if (self.shortcut and x.shape[-1] == self.out) else h


class C2f(nn.Module):
    out: int
    n: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = self.out // 2
        y = ConvBnSiLU(2 * c, 1, dtype=self.dtype, name="cv1")(x)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(c, self.shortcut, dtype=self.dtype, name=f"m{i}")(parts[-1])
            )
        return ConvBnSiLU(self.out, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1)
        )


class SPPF(nn.Module):
    out: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 2
        x = ConvBnSiLU(c, 1, dtype=self.dtype, name="cv1")(x)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))
        return ConvBnSiLU(self.out, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([x, p1, p2, p3], axis=-1)
        )


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")


class DetectSegHead(nn.Module):
    """Per-level decoupled heads: box DFL (4*reg_max), class (nc), mask
    coefficients (nm)."""

    cfg: YoloSegConfig
    level: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dt = c.dtype
        # hidden widths follow ultralytics Detect/Segment: computed ONCE
        # from ch[0] (the P3 channel count) and shared by all levels —
        # c2 = max(16, ch[0]//4, reg_max*4), c3 = max(ch[0], min(nc,100)),
        # c4 = max(ch[0]//4, nm). Per-level input widths here would make
        # real checkpoint kernels shape-mismatch at P4/P5.
        ch0 = c.ch(256)
        cb = max(16, ch0 // 4, c.reg_max * 4)
        cc = max(ch0, min(c.nc, 100))
        c4 = max(ch0 // 4, c.nm)
        box = ConvBnSiLU(cb, 3, dtype=dt, name="cv2_0")(x)
        box = ConvBnSiLU(cb, 3, dtype=dt, name="cv2_1")(box)
        box = nn.Conv(4 * c.reg_max, (1, 1), dtype=dt, name="cv2_2")(box)
        cls = ConvBnSiLU(cc, 3, dtype=dt, name="cv3_0")(x)
        cls = ConvBnSiLU(cc, 3, dtype=dt, name="cv3_1")(cls)
        cls = nn.Conv(c.nc, (1, 1), dtype=dt, name="cv3_2")(cls)
        mc = ConvBnSiLU(c4, 3, dtype=dt, name="cv4_0")(x)
        mc = ConvBnSiLU(c4, 3, dtype=dt, name="cv4_1")(mc)
        mc = nn.Conv(c.nm, (1, 1), dtype=dt, name="cv4_2")(mc)
        return box, cls, mc


class Proto(nn.Module):
    """Mask prototype net — module layout matches ultralytics Proto
    exactly (cv1 Conv3x3 -> LEARNED 2x2/2 ConvTranspose -> cv2 Conv3x3 ->
    cv3 Conv-BN-SiLU 1x1): real yolov8-seg/FastSAM-x checkpoints carry
    proto.upsample.{weight,bias} and proto.cv3.bn.* keys, so a nearest
    upsample + plain cv3 conv cannot load them."""

    cfg: YoloSegConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        cp = max(c.ch(256), c.nm)
        x = ConvBnSiLU(cp, 3, dtype=c.dtype, name="cv1")(x)
        x = nn.ConvTranspose(cp, (2, 2), strides=(2, 2), padding="VALID",
                             dtype=c.dtype, name="upsample")(x)
        x = ConvBnSiLU(cp, 3, dtype=c.dtype, name="cv2")(x)
        return ConvBnSiLU(c.nm, 1, dtype=c.dtype, name="cv3")(x)


class YoloSeg(nn.Module):
    cfg: YoloSegConfig

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) float in [0,1]. H, W divisible by 32.

        Returns dict with per-level raw head outputs + prototypes.
        """
        c = self.cfg
        dt = c.dtype
        x = images.astype(dt)
        x = ConvBnSiLU(c.ch(64), 3, 2, dtype=dt, name="b0")(x)          # P1
        x = ConvBnSiLU(c.ch(128), 3, 2, dtype=dt, name="b1")(x)         # P2
        x = C2f(c.ch(128), c.n(3), dtype=dt, name="b2")(x)
        x = ConvBnSiLU(c.ch(256), 3, 2, dtype=dt, name="b3")(x)         # P3
        p3 = C2f(c.ch(256), c.n(6), dtype=dt, name="b4")(x)
        x = ConvBnSiLU(c.ch(512), 3, 2, dtype=dt, name="b5")(p3)        # P4
        p4 = C2f(c.ch(512), c.n(6), dtype=dt, name="b6")(x)
        x = ConvBnSiLU(c.ch(1024), 3, 2, dtype=dt, name="b7")(p4)       # P5
        x = C2f(c.ch(1024), c.n(3), dtype=dt, name="b8")(x)
        p5 = SPPF(c.ch(1024), dtype=dt, name="b9")(x)

        # PAN-FPN neck
        u = jnp.concatenate([_upsample2(p5), p4], axis=-1)
        n4 = C2f(c.ch(512), c.n(3), shortcut=False, dtype=dt, name="n12")(u)
        u = jnp.concatenate([_upsample2(n4), p3], axis=-1)
        n3 = C2f(c.ch(256), c.n(3), shortcut=False, dtype=dt, name="n15")(u)   # P3 out
        d = ConvBnSiLU(c.ch(256), 3, 2, dtype=dt, name="n16")(n3)
        n4b = C2f(c.ch(512), c.n(3), shortcut=False, dtype=dt, name="n18")(
            jnp.concatenate([d, n4], axis=-1)
        )                                                                # P4 out
        d = ConvBnSiLU(c.ch(512), 3, 2, dtype=dt, name="n19")(n4b)
        n5 = C2f(c.ch(1024), c.n(3), shortcut=False, dtype=dt, name="n21")(
            jnp.concatenate([d, p5], axis=-1)
        )                                                                # P5 out

        proto = Proto(c, name="proto")(n3)
        outs = []
        for lvl, feat in enumerate([n3, n4b, n5]):
            outs.append(DetectSegHead(c, lvl, name=f"head{lvl}")(feat))
        return {
            "levels": outs,            # [(box, cls, mc)] strides 8/16/32
            "proto": proto.astype(jnp.float32),  # (B, H/4, W/4, nm)
        }


# ---------------------------------------------------------------------------
# decode + postprocess (batched, static shapes)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# ultralytics weight conversion
# ---------------------------------------------------------------------------

# module-index layout of the ultralytics yolov8*-seg config (FastSAM uses it
# unchanged): backbone 0-9, neck 12/15/16/18/19/21, Segment head 22
_UL_BACKBONE = {0: "b0", 1: "b1", 2: "b2", 3: "b3", 4: "b4", 5: "b5",
                6: "b6", 7: "b7", 8: "b8", 9: "b9"}
_UL_NECK = {12: "n12", 15: "n15", 16: "n16", 18: "n18", 19: "n19", 21: "n21"}


def _conv_bn(sd, prefix):
    w = sd[f"{prefix}.conv.weight"]
    return {
        "conv": {"kernel": np.transpose(np.asarray(w), (2, 3, 1, 0))},
        "bn": {
            "scale": np.asarray(sd[f"{prefix}.bn.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bn.bias"]),
            "mean": np.asarray(sd[f"{prefix}.bn.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.bn.running_var"]),
        },
    }


def _split_params_stats(tree):
    """Split {'conv','bn'} dicts into flax params / batch_stats trees."""
    params, stats = {}, {}
    for name, sub in tree.items():
        if set(sub) == {"conv", "bn"}:
            params[name] = {"conv": sub["conv"],
                            "bn": {"scale": sub["bn"]["scale"], "bias": sub["bn"]["bias"]}}
            stats[name] = {"bn": {"mean": sub["bn"]["mean"], "var": sub["bn"]["var"]}}
        elif isinstance(sub, dict) and ("kernel" in sub or "bias" in sub):
            params[name] = sub
        else:
            p, s = _split_params_stats(sub)
            params[name] = p
            if s:
                stats[name] = s
    return params, stats


def convert_ultralytics_state_dict(sd, cfg: YoloSegConfig) -> dict:
    """ultralytics yolov8-seg 'model.{idx}.*' state_dict -> flax variables
    for YoloSeg ({'params': ..., 'batch_stats': ...}).

    Works on the raw tensor dict (torch tensors or numpy arrays); loading
    an ultralytics .pt requires only torch (weights_only=False pickles are
    rejected — export the state_dict first when using official FastSAM-x
    checkpoints)."""
    # strip the leading 'model.' that ultralytics uses
    sd = { (k[6:] if k.startswith("model.") else k): v for k, v in sd.items() }

    def c2f(prefix, n):
        out = {"cv1": _conv_bn(sd, f"{prefix}.cv1"),
               "cv2": _conv_bn(sd, f"{prefix}.cv2")}
        for i in range(n):
            out[f"m{i}"] = {
                "cv1": _conv_bn(sd, f"{prefix}.m.{i}.cv1"),
                "cv2": _conv_bn(sd, f"{prefix}.m.{i}.cv2"),
            }
        return out

    tree = {}
    for idx, name in _UL_BACKBONE.items():
        if name in ("b2", "b4", "b6", "b8"):
            n = {"b2": cfg.n(3), "b4": cfg.n(6), "b6": cfg.n(6), "b8": cfg.n(3)}[name]
            tree[name] = c2f(str(idx), n)
        elif name == "b9":
            tree[name] = {"cv1": _conv_bn(sd, "9.cv1"), "cv2": _conv_bn(sd, "9.cv2")}
        else:
            tree[name] = _conv_bn(sd, str(idx))
    for idx, name in _UL_NECK.items():
        if name in ("n16", "n19"):
            tree[name] = _conv_bn(sd, str(idx))
        else:
            tree[name] = c2f(str(idx), cfg.n(3))
    # Segment head (module 22): proto + per-level cv2/cv3/cv4 lists.
    # proto.upsample is torch ConvTranspose2d weight (in, out, kh, kw);
    # flax ConvTranspose wants (kh, kw, in, out) with the SPATIAL TAPS
    # FLIPPED (verified exact against torch on random weights).
    up_w = np.asarray(sd["22.proto.upsample.weight"])
    tree["proto"] = {
        "cv1": _conv_bn(sd, "22.proto.cv1"),
        "upsample": {
            "kernel": np.ascontiguousarray(
                np.transpose(up_w[:, :, ::-1, ::-1], (2, 3, 0, 1))),
            "bias": np.asarray(sd["22.proto.upsample.bias"]),
        },
        "cv2": _conv_bn(sd, "22.proto.cv2"),
        "cv3": _conv_bn(sd, "22.proto.cv3"),
    }
    for lvl in range(3):
        head = {}
        for branch, ours in [("cv2", "cv2"), ("cv3", "cv3"), ("cv4", "cv4")]:
            for k in range(2):
                head[f"{ours}_{k}"] = _conv_bn(sd, f"22.{branch}.{lvl}.{k}")
            wkey = f"22.{branch}.{lvl}.2"
            head[f"{ours}_2"] = {
                "kernel": np.transpose(np.asarray(sd[f"{wkey}.weight"]), (2, 3, 1, 0)),
                "bias": np.asarray(sd[f"{wkey}.bias"]),
            }
        tree[f"head{lvl}"] = head
    params, stats = _split_params_stats(tree)
    return {"params": params, "batch_stats": stats}


def dfl_decode(box_logits: jax.Array, reg_max: int) -> jax.Array:
    """(..., 4*reg_max) -> (..., 4) expected ltrb distances (in stride units)."""
    x = box_logits.reshape(box_logits.shape[:-1] + (4, reg_max)).astype(jnp.float32)
    p = jax.nn.softmax(x, axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(p * bins, axis=-1)


def decode_predictions(outputs: dict, cfg: YoloSegConfig, img_hw: Tuple[int, int],
                       strides: Sequence[int] = (8, 16, 32),
                       with_cls: bool = False):
    """Raw head outputs -> flat per-anchor (boxes xyxy, scores, mask
    coeffs[, argmax class when with_cls]). boxes are in input-image pixel
    coordinates. The ONE per-level DFL/anchor decode — detect_labeled
    consumes the with_cls variant so an anchor/stride convention fix can
    never land in only one of the two paths."""
    H, W = img_hw
    all_boxes, all_scores, all_mc, all_cls = [], [], [], []
    for (box, cls, mc), stride in zip(outputs["levels"], strides):
        B, h, w, _ = box.shape
        ltrb = dfl_decode(box.reshape(B, h * w, -1), cfg.reg_max) * stride
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
        cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
        centers = jnp.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1)  # (hw, 2)
        # ltrb = (left, top, right, bottom)
        x1 = centers[None, :, 0] - ltrb[..., 0]
        y1 = centers[None, :, 1] - ltrb[..., 1]
        x2 = centers[None, :, 0] + ltrb[..., 2]
        y2 = centers[None, :, 1] + ltrb[..., 3]
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
        probs = jax.nn.sigmoid(cls.reshape(B, h * w, cfg.nc).astype(jnp.float32))
        all_boxes.append(boxes)
        all_scores.append(jnp.max(probs, axis=-1))  # class-agnostic
        all_mc.append(mc.reshape(B, h * w, cfg.nm).astype(jnp.float32))
        if with_cls:
            all_cls.append(jnp.argmax(probs, axis=-1).astype(jnp.int32))
    res = (jnp.concatenate(all_boxes, axis=1),
           jnp.concatenate(all_scores, axis=1),
           jnp.concatenate(all_mc, axis=1))
    if with_cls:
        return res + (jnp.concatenate(all_cls, axis=1),)
    return res


def nms_topk(boxes, scores, conf: float, iou_thresh: float, max_out: int):
    """Batched class-agnostic NMS with static output size.

    boxes (B, A, 4), scores (B, A) -> (idx (B, K), keep (B, K) bool).
    Greedy over the top-K2 candidates (K2 = 4*max_out) via lax.scan.
    """
    B, A, _ = boxes.shape
    K2 = min(4 * max_out, A)
    scores = jnp.where(scores >= conf, scores, 0.0)
    top_s, top_i = jax.lax.top_k(scores, K2)
    tb = jnp.take_along_axis(boxes, top_i[..., None], axis=1)  # (B, K2, 4)

    area = jnp.maximum(tb[..., 2] - tb[..., 0], 0) * jnp.maximum(tb[..., 3] - tb[..., 1], 0)
    lt = jnp.maximum(tb[..., :, None, :2], tb[..., None, :, :2])
    rb = jnp.minimum(tb[..., :, None, 2:], tb[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    iou = inter / jnp.maximum(area[..., :, None] + area[..., None, :] - inter, 1e-9)

    def body(carry, k):
        alive = carry
        is_alive = alive[..., k] & (top_s[..., k] > 0)
        suppress = (iou[..., k, :] > iou_thresh) & (jnp.arange(K2) > k)
        alive = alive & ~(suppress & is_alive[..., None])
        return alive, is_alive

    alive0 = jnp.ones((B, K2), bool)
    _, kept = jax.lax.scan(body, alive0, jnp.arange(K2))
    kept = jnp.moveaxis(kept, 0, -1)  # (B, K2)
    # compact the first max_out kept entries
    order = jnp.argsort(~kept, axis=-1, stable=True)[..., :max_out]
    keep = jnp.take_along_axis(kept, order, axis=-1)
    idx = jnp.take_along_axis(top_i, order, axis=-1)
    return idx, keep


def assemble_masks(proto, mask_coeffs, boxes, out_hw: Tuple[int, int]):
    """proto (B, Hp, Wp, nm) + coeffs (B, K, nm) -> (B, K, H, W) bool masks
    cropped to their boxes (ultralytics process_mask semantics)."""
    B, Hp, Wp, nm = proto.shape
    H, W = out_hw
    logits = jnp.einsum("bhwn,bkn->bkhw", proto, mask_coeffs)
    m = jax.image.resize(logits, (B, logits.shape[1], H, W), method="bilinear")
    ys = jnp.arange(H, dtype=jnp.float32)[None, None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, None, :]
    x1 = boxes[..., 0][..., None, None]
    y1 = boxes[..., 1][..., None, None]
    x2 = boxes[..., 2][..., None, None]
    y2 = boxes[..., 3][..., None, None]
    inbox = (xs >= x1) & (xs <= x2) & (ys >= y1) & (ys <= y2)
    # >= : logits of a randomly-initialized net are ~1e-8 and sigmoid
    # rounds to exactly 0.5 — a strict > yields all-empty masks (ties are
    # measure-zero with trained weights)
    return (jax.nn.sigmoid(m) >= 0.5) & inbox


def segment_everything(model: YoloSeg, variables, images, cfg: YoloSegConfig,
                       conf: float = 0.5, iou: float = 0.9, max_masks: int = 64):
    """Full batched inference: images (B, H, W, 3) in [0,1] ->
    (masks (B, K, H, W) bool, boxes (B, K, 4), scores (B, K), valid (B, K)).
    Mirrors FastSAM everything-mode + the reference's conf/iou params
    (fastsam_params.py conf=.5 iou=.9)."""
    H, W = images.shape[1:3]
    out = model.apply(variables, images)
    boxes, scores, mcs = decode_predictions(out, cfg, (H, W))
    idx, keep = nms_topk(boxes, scores, conf, iou, max_masks)
    kb = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    ks = jnp.take_along_axis(scores, idx, axis=1)
    km = jnp.take_along_axis(mcs, idx[..., None], axis=1)
    masks = assemble_masks(out["proto"], km, kb, (H, W))
    masks = masks & keep[..., None, None]
    return masks, kb, ks * keep, keep


def detect_labeled(model: YoloSeg, variables, images, cfg: YoloSegConfig,
                   conf: float = 0.25, iou: float = 0.45, max_out: int = 32):
    """Labeled object detection: the YOLOv7 stand-in for the reference's
    ignore/keep label filtering (fastsam_wrapper.py:440-484), served by a
    YoloSeg detect head with nc > 1.

    images (B, H, W, 3) in [0,1] -> (boxes (B, K, 4) xyxy pixels,
    cls (B, K) int32, scores (B, K), valid (B, K) bool).
    """
    H, W = images.shape[1:3]
    out = model.apply(variables, images)
    boxes, scores, _, cls = decode_predictions(out, cfg, (H, W),
                                               with_cls=True)
    idx, keep = nms_topk(boxes, scores, conf, iou, max_out)
    kb = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    ks = jnp.take_along_axis(scores, idx, axis=1)
    kc = jnp.take_along_axis(cls, idx, axis=1)
    return kb, kc, ks * keep, keep
