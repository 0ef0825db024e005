"""Batched perception front-end: RGB-D frames -> per-mask Observations +
frame descriptors.

Parity with reference FastSAMWrapper.run (fastsam_wrapper.py:254-418):
segmentation masks -> filtering (area bounds by min/max_mask_len_div, image
edge contact, keep/ignore label boxes, triangle ignore regions) -> 3D
point-cloud lifting from the depth image with max_depth rejection (a mask
is dropped when <25% of its points are within max_depth,
fastsam_wrapper.py:323,352) -> voxel downsample -> plane filter by OBB
extents (:373-384) -> per-mask semantic embedding (mean per-pixel DINOv2
feature, :407-414, or CLIP bbox crop, :393-406) -> frame descriptor
pooling (:650-666).

TPU design: everything up to Observation construction is one jit'd,
static-shape program over a batch of frames with capacity-padded masks —
segmentation, embedding, lifting and filtering run per BATCH of frames
instead of per mask (the reference loops masks in python).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from roman_tpu.data.camera import CameraParams, depth_image_to_points
from roman_tpu.map.observation import Observation
from roman_tpu.ops.geometry import obb_volume_extent
from roman_tpu.ops.voxel import voxel_downsample
from roman_tpu.params.fastsam_params import FastSAMParams
from roman_tpu.perception import dinov2, fastsam
from roman_tpu.perception.frame_descriptor import frame_descriptor, masked_mean_embedding
from roman_tpu.perception.vit import upsample_patch_features


@dataclasses.dataclass
class PerceptionOutput:
    """Padded device outputs for a batch of frames. Masks are returned at
    mask_downsample_factor resolution — full-resolution masks are consumed
    on device (embedding + lifting) and never shipped to the host (the
    fetch would dominate: 8 frames x 64 masks x 480x640 bool is ~160 MB
    over a ~1 s-latency link)."""

    masks: np.ndarray          # (B, K, H/f, W/f) bool (downsampled)
    valid: np.ndarray          # (B, K)
    points: np.ndarray         # (B, K, P, 3) camera-frame object points
    points_valid: np.ndarray   # (B, K, P)
    embeddings: np.ndarray     # (B, K, D)
    frame_descriptors: np.ndarray  # (B, D)


class PerceptionFrontend:
    """Wires the segmentation net + DINOv2 (or CLIP) into one batched
    program, honoring the FastSAMParams filtering pipeline:
    rotate_img -> YOLO ignore/keep label boxes -> triangle ignore regions
    -> area bounds / edge filter -> erosion-gated depth lifting -> plane
    filter -> per-mask semantics (mean-DINO or CLIP bbox crop).

    Divergence from the reference: YOLO label filtering runs only when
    `ignore_people` or `use_keep_labels` is set AND a detector is
    available (the reference always runs YOLOv7 when ignore_labels is
    nonempty, fastsam_wrapper.py:176; a randomly-initialized stand-in
    would inject noise, so it must be opted into)."""

    def __init__(self, params: FastSAMParams, camera: CameraParams,
                 seg_cfg: Optional[fastsam.YoloSegConfig] = None,
                 vit_cfg=None,
                 seg_variables=None, vit_variables=None,
                 yolo_cfg: Optional[fastsam.YoloSegConfig] = None,
                 yolo_variables=None,
                 yolo_label_names: Optional[tuple] = None,
                 clip_cfg=None, clip_variables=None,
                 seed: int = 0):
        self.params = params
        self.camera = camera
        self.seg_cfg = seg_cfg if seg_cfg is not None else {
            "fastsam-x": fastsam.FASTSAM_X,
            "fastsam-s": fastsam.FASTSAM_S,
            "tiny": fastsam.TINY_TEST,
        }[params.seg_arch]
        self.vit_cfg = vit_cfg if vit_cfg is not None else {
            "dinov2-base": dinov2.DINOV2_BASE,
            "dinov2-small": dinov2.DINOV2_SMALL,
            "tiny": dataclasses.replace(
                dinov2.DINOV2_SMALL, width=64, depth=2, heads=4,
                img_size=84, dtype=jnp.float32),
        }[params.vit_arch]
        seg_cfg = self.seg_cfg
        vit_cfg = self.vit_cfg
        self.seg_model = fastsam.YoloSeg(seg_cfg)
        self.vit_model = dinov2.make_model(vit_cfg)
        key = jax.random.PRNGKey(seed)
        H, W = params.imgsz
        if seg_variables is None:
            seg_variables = self.seg_model.init(
                key, jnp.zeros((1, _r32(H), _r32(W), 3)))
        if vit_variables is None:
            gh = (H // vit_cfg.patch) * vit_cfg.patch
            gw = (W // vit_cfg.patch) * vit_cfg.patch
            vit_variables = self.vit_model.init(key, jnp.zeros((1, gh, gw, 3)))
        self.seg_variables = seg_variables
        self.vit_variables = vit_variables

        # --- YOLO label-filter stand-in (reference fastsam_wrapper.py:171,
        # :440-484): a YoloSeg detect head with nc>1 ---
        self.run_yolo = bool(
            (params.ignore_people and len(params.ignore_labels) > 0)
            or params.use_keep_labels
        )
        self.yolo_model = None
        self.yolo_variables = None
        self.yolo_label_names = yolo_label_names or COCO_NAMES
        if self.run_yolo:
            self.yolo_cfg = yolo_cfg or dataclasses.replace(
                fastsam.FASTSAM_X, nc=len(self.yolo_label_names),
                depth_mult=0.33, width_mult=0.25)
            self.yolo_model = fastsam.YoloSeg(self.yolo_cfg)
            if yolo_variables is None:
                yh, yw = params.yolo_imgsz
                yolo_variables = self.yolo_model.init(
                    key, jnp.zeros((1, _r32(yh), _r32(yw), 3)))
            self.yolo_variables = yolo_variables

        # --- CLIP bbox-crop semantics (reference fastsam_wrapper.py:393-406)
        self.clip_model = None
        self.clip_variables = None
        if params.semantics == "clip":
            from roman_tpu.perception import clip as clip_mod

            # reference parity: fastsam_wrapper.py:182 hardcodes
            # clip.load('ViT-L/14') (768-d projected embeddings) — a
            # ViT-B/32 default would silently embed into a different,
            # lower-capacity space and shape-mismatch real L/14 weights
            self.clip_cfg = clip_cfg or clip_mod.CLIP_VIT_L14
            self.clip_model = clip_mod.make_model(self.clip_cfg)
            if clip_variables is None:
                s = self.clip_cfg.img_size
                clip_variables = self.clip_model.init(
                    key, jnp.zeros((1, s, s, 3)))
            self.clip_variables = clip_variables

        self._jitted = None
        self._tri_cache = {}

    # ------------------------------------------------------------------ #
    def _ignore_keep_ids(self):
        names = list(self.yolo_label_names)
        ignore = [names.index(l) for l in self.params.ignore_labels
                  if l in names]
        keep = [names.index(l) for l in self.params.keep_labels if l in names]
        return tuple(ignore), tuple(keep)

    def _build(self):
        p = self.params
        cam = self.camera
        K = jnp.asarray(cam.K, jnp.float32)
        seg_model, seg_cfg = self.seg_model, self.seg_cfg
        vit_model, vit_cfg = self.vit_model, self.vit_cfg
        yolo_model = self.yolo_model
        clip_model = self.clip_model
        max_masks = p.max_masks_per_frame
        n_pts = p.max_points_per_mask
        run_yolo = self.run_yolo
        use_clip = clip_model is not None
        if run_yolo:
            ignore_ids, keep_ids = self._ignore_keep_ids()
        rot = p.rotate_img
        unrot = {None: None, "CW": "CCW", "CCW": "CW", "180": "180"}[rot]

        def fn(variables, images, depths, tri_ignore):
            B, H, W, _ = images.shape
            # --- rotation pre-processing (fastsam_wrapper.py:420-438):
            # segmentation/YOLO/semantics run on the rotated image; masks
            # are un-rotated before depth lifting ---
            imgs_p = rotate_images(images, rot)
            Hr, Wr = imgs_p.shape[1], imgs_p.shape[2]

            # --- segmentation (FastSAM everything mode) ---
            seg_in = jax.image.resize(
                imgs_p, (B, _r32(p.imgsz[0]), _r32(p.imgsz[1]), 3), "bilinear")
            masks_s, _, _, keep = fastsam.segment_everything(
                seg_model, variables["seg"], seg_in, seg_cfg,
                conf=p.conf, iou=p.iou, max_masks=max_masks)
            # resize masks to full (rotated) image resolution
            masks_r = jax.image.resize(
                masks_s.astype(jnp.float32), (B, max_masks, Hr, Wr),
                "nearest") > 0.5
            ok = keep

            # --- YOLO ignore/keep label boxes (fastsam_wrapper.py:440-484):
            # drop masks overlapping any ignore-label box; with
            # use_keep_labels require >=keep_mask_minimal_intersection of
            # the mask inside some keep-label box ---
            if run_yolo:
                yolo_in = jax.image.resize(
                    imgs_p, (B, _r32(p.yolo_imgsz[0]), _r32(p.yolo_imgsz[1]), 3),
                    "bilinear")
                ybox, ycls, yscore, yvalid = fastsam.detect_labeled(
                    yolo_model, variables["yolo"], yolo_in, self.yolo_cfg)
                # scale boxes from yolo input resolution to (Hr, Wr)
                sx = Wr / _r32(p.yolo_imgsz[1])
                sy = Hr / _r32(p.yolo_imgsz[0])
                ybox = ybox * jnp.asarray([sx, sy, sx, sy])
                is_ignore = yvalid & jnp.isin(ycls, jnp.asarray(ignore_ids,
                                                                jnp.int32))
                ignore_boxes = jnp.where(is_ignore[..., None], ybox, 0.0)
                keep_boxes = None
                if p.use_keep_labels:
                    is_keep = yvalid & jnp.isin(ycls, jnp.asarray(keep_ids,
                                                                  jnp.int32))
                    keep_boxes = jnp.where(is_keep[..., None], ybox, 0.0)
                # reference drops on ANY ignore overlap (:551-553)
                ok = apply_label_filters(
                    masks_r, ok, ignore_boxes=ignore_boxes,
                    keep_boxes=keep_boxes, ignore_frac=1e-9,
                    keep_frac=p.keep_mask_minimal_intersection)

            # --- per-mask semantics on the rotated image ---
            if use_clip:
                # CLIP bbox crops (fastsam_wrapper.py:393-406)
                bboxes = _mask_bboxes(masks_r)
                emb = clip_bbox_embeddings(
                    imgs_p, bboxes, clip_model, variables["clip"],
                    out_size=self.clip_cfg.img_size)
            gh = (Hr // vit_cfg.patch) * vit_cfg.patch
            gw = (Wr // vit_cfg.patch) * vit_cfg.patch
            vit_in = jax.image.resize(imgs_p, (B, gh, gw, 3), "bilinear")
            vit_in = (vit_in - jnp.asarray(dinov2.IMAGENET_MEAN)) / jnp.asarray(
                dinov2.IMAGENET_STD)
            _, patches = vit_model.apply(variables["vit"], vit_in)
            if not use_clip:
                # mean per-pixel DINO embedding (fastsam_wrapper.py:407-414)
                # computed as mask-weighted PATCH pooling: weight each patch
                # token by the fraction of mask pixels it covers — identical
                # to the per-pixel mean over nearest-upsampled features, but
                # it never materializes the (B, H, W, 768) pixel-feature
                # tensor (0.9 GB/frame of HBM traffic at 480x640).
                # rotation-invariant: the mean runs over the same pixel set
                p14 = vit_cfg.patch
                tg_h, tg_w = gh // p14, gw // p14
                mg = jax.image.resize(
                    masks_r.astype(jnp.float32), (B, max_masks, gh, gw),
                    "nearest")
                w = mg.reshape(B, max_masks, tg_h, p14, tg_w, p14).mean(
                    axis=(3, 5)).reshape(B, max_masks, tg_h * tg_w)
                tok = patches.astype(jnp.float32).reshape(
                    B, tg_h * tg_w, -1)  # (B, gh_t, gw_t, D) -> (B, T, D)
                emb = jnp.einsum("bkt,btd->bkd", w, tok)
                emb = emb / jnp.maximum(
                    jnp.sum(w, axis=-1, keepdims=True), 1e-9)
                emb = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-9)
            fdesc = frame_descriptor(patches.astype(jnp.float32),
                                     p.frame_descriptor or "dino-gem")

            # --- un-rotate masks back to the camera frame ---
            if unrot is not None:
                k = {"CCW": 1, "180": 2, "CW": 3}[unrot]
                masks = jnp.rot90(masks_r, k=k, axes=(2, 3))
            else:
                masks = masks_r

            # --- triangle ignore regions (constant_ignore_mask,
            # fastsam_wrapper.py:196-204): any overlap drops the mask ---
            tri_hit = jnp.any(masks & tri_ignore[None, None], axis=(-2, -1))
            ok = ok & ~tri_hit

            # --- area bounds (from_params: img_area / div^2,
            # fastsam_wrapper.py:129) ---
            area = jnp.sum(masks, axis=(-2, -1))
            min_area = H * W / (p.min_mask_len_div ** 2)
            max_area = H * W / (p.max_mask_len_div ** 2)
            ok = ok & (area >= min_area) & (area <= max_area)
            # edge contact (5 px, per-side allow flags; reference
            # _delete_edge_masks :486-495, default all-allowed). The
            # reference filters the ROTATED image, so its t/b/l/r flags
            # name the rotated frame's sides; these masks are already
            # un-rotated, so permute the flags onto the camera-frame
            # edges they correspond to (e.g. under CCW pre-rotation the
            # rotated top edge is the camera right edge).
            perm = {None: (0, 1, 2, 3), "CCW": (2, 3, 1, 0),
                    "CW": (3, 2, 0, 1), "180": (1, 0, 3, 2)}[rot]
            allow = tuple(p.allow_tblr_edges[i] for i in perm)
            if not all(allow):
                edges = [
                    jnp.any(masks[..., :5, :], axis=(-2, -1)),    # top
                    jnp.any(masks[..., -5:, :], axis=(-2, -1)),   # bottom
                    jnp.any(masks[..., :, :5], axis=(-2, -1)),    # left
                    jnp.any(masks[..., :, -5:], axis=(-2, -1)),   # right
                ]
                for e_hit, allowed in zip(edges, allow):
                    if not allowed:
                        ok = ok & ~e_hit

            # --- depth -> object point clouds (fastsam_wrapper.py:340-384);
            # erosion gates ONLY the depth pixels (:331-335), the stored
            # mask stays un-eroded ---
            lift_masks = masks
            if p.erosion_size > 0:
                lift_masks = erode_masks(masks, 2 * p.erosion_size + 1)
            pts_img = depth_image_to_points(depths, K)  # (B, H, W, 3)
            # pixel stride for lifting (reference pcd_stride, :215 — the
            # o3d create_from_depth_image stride); also bounds the top_k
            s = max(p.pcd_stride, 1)
            lift_masks = lift_masks[..., ::s, ::s]
            pts_img = pts_img[:, ::s, ::s]
            depth_ok = (depths[:, ::s, ::s] > 1e-3)
            near_ok = depths[:, ::s, ::s] <= p.max_depth

            def lift_one(masks_k, pts, d_ok, n_ok):
                def lift_mask(m):
                    sel = m & d_ok
                    # max_depth rejection: <25% of points within max_depth
                    n_all = jnp.sum(sel)
                    n_near = jnp.sum(sel & n_ok)
                    frac_ok = n_near >= 0.25 * jnp.maximum(n_all, 1)
                    sel = sel & n_ok
                    # subsample to fixed capacity via top_k on masked score
                    flat = sel.reshape(-1)
                    k_eff = min(n_pts, flat.shape[0])
                    scores = flat.astype(jnp.float32) * (
                        1.0 + 0.5 * _hash01(jnp.arange(flat.shape[0])))
                    _, idx = jax.lax.top_k(scores, k_eff)
                    pv = flat[idx] & (n_all > 0) & frac_ok
                    out_p = pts.reshape(-1, 3)[idx]
                    if k_eff < n_pts:  # strided image smaller than capacity
                        out_p = jnp.concatenate(
                            [out_p, jnp.zeros((n_pts - k_eff, 3), out_p.dtype)])
                        pv = jnp.concatenate(
                            [pv, jnp.zeros((n_pts - k_eff,), bool)])
                    return out_p, pv

                return jax.vmap(lift_mask)(masks_k)

            pts_k, pts_v = jax.vmap(lift_one)(lift_masks, pts_img, depth_ok,
                                              near_ok)
            # voxel downsample each mask's points (fastsam_wrapper.py:367)
            pts_k, pts_v = voxel_downsample(pts_k, pts_v, p.voxel_size)

            # plane filter via OBB extents (fastsam_wrapper.py:373-384):
            # reject if extents look like [big, big, thin]
            vol, extent = obb_volume_extent(pts_k, pts_v)
            e = jnp.sort(extent, axis=-1)  # ascending
            a, b, c = p.plane_filter_params
            plane = (e[..., 2] > a) & (e[..., 1] > b) & (e[..., 0] < c)
            n_valid_pts = jnp.sum(pts_v, axis=-1)
            ok = ok & ~plane & (n_valid_pts > 0)

            f = p.mask_downsample_factor
            masks_ds = masks[:, :, ::f, ::f]
            return dict(masks=masks_ds, valid=ok, points=pts_k, points_valid=pts_v,
                        embeddings=emb, frame_descriptors=fdesc)

        def packed(variables, images_u8, depths_f16, tri_ignore):
            """Transfer-optimized wrapper: uint8 images + f16 depths in,
            TWO flat output buffers out (one uint8, one f32). The
            host<->device link on this deployment is ~30 MB/s with
            per-transfer latency, so transfer bytes and transfer COUNT both
            matter more than device flops."""
            images = images_u8.astype(jnp.float32) / 255.0
            depths = depths_f16.astype(jnp.float32)
            out = fn(variables, images, depths, tri_ignore)
            u8 = jnp.concatenate([
                out["masks"].astype(jnp.uint8).reshape(-1),
                out["valid"].astype(jnp.uint8).reshape(-1),
                out["points_valid"].astype(jnp.uint8).reshape(-1),
            ])
            f32 = jnp.concatenate([
                out["points"].reshape(-1),
                out["embeddings"].reshape(-1),
                out["frame_descriptors"].reshape(-1),
            ])
            return u8, f32

        return jax.jit(packed)

    def _variables(self):
        v = {"seg": self.seg_variables, "vit": self.vit_variables}
        if self.run_yolo:
            v["yolo"] = self.yolo_variables
        if self.clip_model is not None:
            v["clip"] = self.clip_variables
        return v

    def _tri_mask(self, H: int, W: int) -> np.ndarray:
        key = (H, W)
        if key not in self._tri_cache:
            self._tri_cache[key] = triangle_ignore_mask(
                self.params.triangle_ignore_masks, H, W)
        return self._tri_cache[key]

    def run_batch(self, images: np.ndarray, depths: np.ndarray) -> PerceptionOutput:
        """images (B, H, W, 3) float [0,1] or uint8; depths (B, H, W) m."""
        if self._jitted is None:
            self._jitted = self._build()
        B, H, W = images.shape[:3]
        if images.dtype != np.uint8:
            images = np.clip(np.asarray(images) * 255.0, 0, 255).astype(
                np.uint8)
        u8, f32 = self._jitted(self._variables(),
                               jnp.asarray(images),
                               jnp.asarray(depths, np.float16),
                               jnp.asarray(self._tri_mask(H, W)))
        u8 = np.asarray(u8)
        f32 = np.asarray(f32)
        # unpack by static layout
        p = self.params
        K = p.max_masks_per_frame
        f = p.mask_downsample_factor
        P = p.max_points_per_mask
        if self.clip_model is not None:
            D = self.clip_cfg.proj_dim or self.clip_cfg.width
        else:
            D = self.vit_cfg.width
        mh, mw = len(range(0, H, f)), len(range(0, W, f))
        sizes_u8 = [B * K * mh * mw, B * K, B * K * P]
        m_end = sizes_u8[0]
        v_end = m_end + sizes_u8[1]
        masks = u8[:m_end].reshape(B, K, mh, mw).astype(bool)
        valid = u8[m_end:v_end].reshape(B, K).astype(bool)
        pv = u8[v_end:v_end + sizes_u8[2]].reshape(B, K, P).astype(bool)
        p_end = B * K * P * 3
        e_end = p_end + B * K * D
        points = f32[:p_end].reshape(B, K, P, 3)
        emb = f32[p_end:e_end].reshape(B, K, D)
        fdesc = f32[e_end:].reshape(B, -1)
        return PerceptionOutput(masks=masks, valid=valid, points=points,
                                points_valid=pv, embeddings=emb,
                                frame_descriptors=fdesc)

    def observations(self, out: PerceptionOutput, times, poses) -> List[List[Observation]]:
        """Unpack padded device outputs into per-frame Observation lists
        (the Mapper's input contract, mapper.py:47)."""
        all_obs: List[List[Observation]] = []
        for b in range(len(out.valid)):
            frame_obs = []
            for k in np.flatnonzero(out.valid[b]):
                pv = out.points_valid[b, k].astype(bool)
                if not pv.any():
                    continue
                frame_obs.append(
                    Observation(
                        time=float(times[b]),
                        pose=np.asarray(poses[b]),
                        mask=None,
                        mask_downsampled=out.masks[b, k],
                        point_cloud=out.points[b, k][pv],
                        semantic_descriptor=out.embeddings[b, k],
                    )
                )
            all_obs.append(frame_obs)
        return all_obs


def clip_bbox_embeddings(images: jax.Array, boxes: jax.Array, clip_model,
                         clip_vars, out_size: int = 224):
    """Per-mask CLIP embeddings from bbox crops (reference
    fastsam_wrapper.py:393-406): crop each mask's box, resize to the CLIP
    input size, encode, normalize. Batched over (B frames x K masks) via a
    per-crop scale_and_translate (no dynamic shapes).

    images: (B, H, W, 3) float [0,1]; boxes: (B, K, 4) xyxy pixels.
    Returns (B, K, D) unit embeddings.
    """
    from roman_tpu.perception.clip import CLIP_MEAN, CLIP_STD

    B, H, W, _ = images.shape
    K = boxes.shape[1]

    def crop_one(img, box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        w = jnp.maximum(x2 - x1, 1.0)
        h = jnp.maximum(y2 - y1, 1.0)
        scale = jnp.stack([out_size / h, out_size / w, 1.0])
        translation = jnp.stack([-y1 * out_size / h, -x1 * out_size / w, 0.0])
        return jax.image.scale_and_translate(
            img, (out_size, out_size, 3), (0, 1, 2), scale, translation,
            method="linear")

    crops = jax.vmap(lambda img, bxs: jax.vmap(lambda b: crop_one(img, b))(bxs))(
        images, boxes)  # (B, K, S, S, 3)
    crops = (crops - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    flat = crops.reshape(B * K, out_size, out_size, 3)
    cls_out, _ = clip_model.apply(clip_vars, flat)
    emb = cls_out.reshape(B, K, -1).astype(jnp.float32)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-9)


def apply_label_filters(masks: jax.Array, valid: jax.Array,
                        ignore_boxes: Optional[jax.Array] = None,
                        keep_boxes: Optional[jax.Array] = None,
                        ignore_frac: float = 0.5,
                        keep_frac: float = 0.5):
    """Label-box mask filtering (reference fastsam_wrapper.py:440-484).

    A detector (e.g. the YOLO head with nc>1, standing in for the
    reference's YOLOv7) supplies per-frame boxes:
    - ignore_boxes (B, I, 4) xyxy (zero rows = padding): a mask is dropped
      when more than ignore_frac of its area falls inside any ignore box
      (the 'person' filter).
    - keep_boxes (B, K2, 4): with use_keep_labels, a mask must have at
      least keep_frac of its area inside some keep box
      (keep-mask intersection fraction, fastsam_wrapper.py:560).
    """
    B, K, H, W = masks.shape
    # per-mask summed-area table: each box's mask-pixel intersection is 4
    # corner lookups instead of an O(nb*H*W) elementwise reduction per
    # mask (~30x less work at detection-filter scales)
    m = masks.astype(jnp.float32)
    sat = jnp.pad(m, ((0, 0), (0, 0), (1, 0), (1, 0)))
    sat = jnp.cumsum(jnp.cumsum(sat, axis=-2), axis=-1)  # (B, K, H+1, W+1)
    sat_flat = sat.reshape(B, K, (H + 1) * (W + 1))
    area = jnp.maximum(jnp.sum(m, axis=(-2, -1)), 1.0)  # (B, K)

    def box_corners(boxes):
        # reference pixel semantics (fastsam_wrapper.py:455-480): boxes
        # truncate to int (np .astype int64 truncates toward zero), the
        # covered range is the EXCLUSIVE slice [x0:x1), clipped to the
        # image. Degenerate (zero-extent) rows are the padding
        # convention for "no detection" and become empty slices.
        b = jnp.trunc(boxes).astype(jnp.int32)
        x1 = jnp.clip(b[..., 0], 0, W)
        y1 = jnp.clip(b[..., 1], 0, H)
        x2 = jnp.clip(b[..., 2], 0, W)
        y2 = jnp.clip(b[..., 3], 0, H)
        return x1, y1, x2, y2, (x2 > x1) & (y2 > y1)

    def frac_in_boxes(boxes):
        # (B, nb, 4) xyxy -> (B, K) max per-box fraction of mask inside.
        # For the ANY-OVERLAP ignore rule, max-over-boxes is equivalent
        # to overlap with the union mask the reference rasterizes.
        x1, y1, x2, y2, box_valid = box_corners(boxes)

        def corner(yy, xx):  # (B, nb) each -> (B, K, nb)
            idx = (yy * (W + 1) + xx)[:, None, :]
            return jnp.take_along_axis(
                sat_flat, jnp.broadcast_to(idx, (B, K, idx.shape[-1])),
                axis=-1)

        inter = (corner(y2, x2) - corner(y1, x2)
                 - corner(y2, x1) + corner(y1, x1))
        inter = jnp.where(box_valid[:, None, :], inter, 0.0)
        return jnp.max(inter / area[:, :, None], axis=-1)  # (B, K)

    def frac_in_union(boxes):
        # (B, nb, 4) -> (B, K) fraction of mask inside the UNION of the
        # boxes — the reference's keep rule intersects the mask with one
        # rasterized union keep_mask (fastsam_wrapper.py:472-480, :560),
        # so a mask spanning two adjacent keep boxes counts their union,
        # not the best single box.
        x1, y1, x2, y2, box_valid = box_corners(boxes)
        xs = jnp.arange(W)
        ys = jnp.arange(H)
        inx = ((xs[None, None, :] >= x1[..., None])
               & (xs[None, None, :] < x2[..., None]))       # (B, nb, W)
        iny = ((ys[None, None, :] >= y1[..., None])
               & (ys[None, None, :] < y2[..., None]))       # (B, nb, H)
        cell = (iny[..., :, None] & inx[..., None, :]
                & box_valid[..., None, None])
        union = jnp.any(cell, axis=1)                       # (B, H, W)
        inter = jnp.sum(m * union[:, None].astype(jnp.float32),
                        axis=(-2, -1))                      # (B, K)
        return inter / area

    ok = valid
    if ignore_boxes is not None:
        ok = ok & (frac_in_boxes(ignore_boxes) < ignore_frac)
    if keep_boxes is not None:
        ok = ok & (frac_in_union(keep_boxes) >= keep_frac)
    return ok


def _ellipse_footprint(ksize: int) -> np.ndarray:
    """cv.getStructuringElement(cv.MORPH_ELLIPSE, (ksize, ksize)) —
    OpenCV's per-row ellipse fill with saturate_cast (round-to-nearest)
    half-widths (a (7,7) ellipse is rows of 1,5,7,7,7,5,1 pixels),
    reproduced exactly so erosion keeps the corner pixels a square
    kernel would strip (pinned against cv2 in
    test_erosion_matches_cv2_ellipse)."""
    r = ksize // 2
    fp = np.zeros((ksize, ksize), bool)
    for i in range(ksize):
        dy = i - r
        if abs(dy) <= r:
            dx = int(np.rint(r * np.sqrt(max(r * r - dy * dy, 0)
                                         / max(r * r, 1))))
            fp[i, r - dx:r + dx + 1] = True
    return fp


def erode_masks(masks: jax.Array, size: int) -> jax.Array:
    """Binary erosion with the reference's (size, size) MORPH_ELLIPSE
    structuring element (fastsam_wrapper.py:246-249 + cv.erode): a mask
    pixel survives iff every footprint pixel under the ellipse is set.
    Border pixels follow cv.erode's default border (treated as
    foreground), implemented by padding with ones; the footprint test is
    one small fixed convolution, which XLA maps onto the conv units."""
    if size <= 1:
        return masks
    B, K, H, W = masks.shape
    fp = _ellipse_footprint(size)
    e = size // 2
    x = jnp.pad(masks.astype(jnp.float32).reshape(B * K, H, W, 1),
                ((0, 0), (e, e), (e, e), (0, 0)), constant_values=1.0)
    kern = jnp.asarray(fp, jnp.float32)[:, :, None, None]
    hits = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (hits[..., 0] >= fp.sum() - 0.5).reshape(B, K, H, W)


def triangle_ignore_mask(triangles, H: int, W: int) -> np.ndarray:
    """Static pixel mask from triangle regions (reference
    fastsam_params.triangle_ignore_masks, applied at
    fastsam_wrapper.py:426-438); True = ignored pixel."""
    import cv2 as cv

    mask = np.zeros((H, W), np.uint8)
    for tri in triangles or []:
        pts = np.asarray(tri, np.int32).reshape(-1, 1, 2)
        cv.fillPoly(mask, [pts], 1)
    return mask.astype(bool)


def rotate_images(images: jax.Array, how: Optional[str]):
    """Image rotation pre-processing ('CW', 'CCW', '180'; reference
    fastsam_wrapper.py:420-438)."""
    if how is None:
        return images
    k = {"CCW": 1, "180": 2, "CW": 3}[how]
    return jnp.rot90(images, k=k, axes=(1, 2))


def _mask_bboxes(masks: jax.Array) -> jax.Array:
    """(B, K, H, W) bool -> (B, K, 4) xyxy pixel boxes (reference
    mask_bounding_box, fastsam_wrapper.py:577-600): a width x height box
    (from the mask's min/max extents) RE-CENTERED on the mask's pixel
    centroid and clipped to the image — for an asymmetric (e.g.
    L-shaped) mask this is shifted from the tight box, and the CLIP crop
    must see the same pixels the reference crops. x2/y2 are exclusive
    (reference values are inclusive; +1 here). Empty masks get a
    degenerate 1px box at the origin (callers gate on validity)."""
    B, K, H, W = masks.shape
    any_row = jnp.any(masks, axis=-1)                      # (B, K, H)
    any_col = jnp.any(masks, axis=-2)                      # (B, K, W)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    big = jnp.float32(1e9)
    y1 = jnp.min(jnp.where(any_row, ys, big), axis=-1)
    y2 = jnp.max(jnp.where(any_row, ys, -big), axis=-1)    # inclusive
    x1 = jnp.min(jnp.where(any_col, xs, big), axis=-1)
    x2 = jnp.max(jnp.where(any_col, xs, -big), axis=-1)
    mf = masks.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mf, axis=(-2, -1)), 1.0)       # (B, K)
    cy = jnp.sum(jnp.sum(mf, axis=-1) * ys, axis=-1) / n   # centroid row
    cx = jnp.sum(jnp.sum(mf, axis=-2) * xs, axis=-1) / n   # centroid col
    hh = jnp.floor((y2 - y1 + 1.0) / 2.0)                  # height // 2
    hw = jnp.floor((x2 - x1 + 1.0) / 2.0)                  # width // 2
    # int(max(c - h//2, 0)) / int(min(c + h//2, dim - 1)): floor == int
    # truncation for these non-negative values
    y1n = jnp.floor(jnp.maximum(cy - hh, 0.0))
    y2n = jnp.floor(jnp.minimum(cy + hh, H - 1.0))
    x1n = jnp.floor(jnp.maximum(cx - hw, 0.0))
    x2n = jnp.floor(jnp.minimum(cx + hw, W - 1.0))
    empty = ~jnp.any(any_row, axis=-1)
    box = jnp.stack([x1n, y1n, x2n + 1.0, y2n + 1.0], axis=-1)
    return jnp.where(empty[..., None], jnp.asarray([0.0, 0.0, 1.0, 1.0]), box)


# COCO-80 class names: the label vocabulary of the reference's YOLOv7
# detector (yolov7_package names; ignore_labels/keep_labels entries are
# looked up here).
COCO_NAMES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
)


def _r32(x: int) -> int:
    return max(32, (int(x) // 32) * 32)


def _hash01(i: jnp.ndarray) -> jnp.ndarray:
    """Cheap deterministic per-index jitter in [0,1) for subsampling."""
    h = (i * 48271) % 65536
    return h.astype(jnp.float32) / 65536.0
