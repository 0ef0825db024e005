import numpy as np
import jax
import jax.numpy as jnp

from roman_tpu.perception import fastsam


def test_dfl_decode():
    # put all probability mass at bin 5 -> expected distance 5
    logits = np.full((1, 4 * 8), -20.0, np.float32)
    for k in range(4):
        logits[0, k * 8 + 5] = 20.0
    out = np.asarray(fastsam.dfl_decode(jnp.asarray(logits), 8))
    np.testing.assert_allclose(out, np.full((1, 4), 5.0), atol=1e-4)


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [[[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 0, 0]]],
        jnp.float32,
    )
    scores = jnp.asarray([[0.9, 0.8, 0.7, 0.0]])
    idx, keep = fastsam.nms_topk(boxes, scores, conf=0.5, iou_thresh=0.5, max_out=4)
    kept_boxes = np.asarray(jnp.take_along_axis(boxes, idx[..., None], axis=1))[0][
        np.asarray(keep)[0]
    ]
    assert len(kept_boxes) == 2
    assert (kept_boxes[0] == [0, 0, 10, 10]).all()
    assert (kept_boxes[1] == [50, 50, 60, 60]).all()


def test_mask_assembly_crops_to_box():
    B, Hp, Wp, nm = 1, 8, 8, 4
    proto = jnp.ones((B, Hp, Wp, nm), jnp.float32)
    coeffs = jnp.ones((B, 1, nm), jnp.float32) * 2  # sigmoid(8) ~ 1
    boxes = jnp.asarray([[[4.0, 4.0, 12.0, 12.0]]])
    masks = np.asarray(fastsam.assemble_masks(proto, coeffs, boxes, (16, 16)))[0, 0]
    assert masks[5, 5] and masks[11, 11]
    assert not masks[0, 0] and not masks[15, 15]


def test_yolo_seg_shapes_and_jit(rng):
    cfg = fastsam.TINY_TEST
    model = fastsam.YoloSeg(cfg)
    x = jnp.asarray(rng.uniform(size=(2, 96, 128, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    masks, boxes, scores, keep = jax.jit(
        lambda v, im: fastsam.segment_everything(model, v, im, cfg, conf=0.0,
                                                 iou=0.9, max_masks=8)
    )(variables, x)
    assert masks.shape == (2, 8, 96, 128)
    assert boxes.shape == (2, 8, 4)
    assert scores.shape == (2, 8)


def test_perception_frontend_end_to_end(rng):
    """Synthetic RGB-D scene through the full batched front-end (random
    segmentation weights: checks shapes, filtering and lifting logic)."""
    from roman_tpu.data.camera import CameraParams
    from roman_tpu.params.fastsam_params import FastSAMParams
    from roman_tpu.perception.dinov2 import DINOV2_SMALL
    from roman_tpu.perception.wrapper import PerceptionFrontend
    import dataclasses

    cam = CameraParams.simple(width=128, height=96, f=100.0)
    params = FastSAMParams(imgsz=(96, 128), max_masks_per_frame=8,
                           max_points_per_mask=64, max_depth=7.5,
                           min_mask_len_div=30, max_mask_len_div=2)
    vit_cfg = dataclasses.replace(DINOV2_SMALL, width=64, depth=2, heads=4,
                                  img_size=84, dtype=jnp.float32)
    fe = PerceptionFrontend(params, cam, seg_cfg=fastsam.TINY_TEST, vit_cfg=vit_cfg)
    imgs = rng.uniform(size=(2, 96, 128, 3)).astype(np.float32)
    depths = np.full((2, 96, 128), 3.0, np.float32)
    out = fe.run_batch(imgs, depths)
    f = params.mask_downsample_factor
    assert out.masks.shape == (2, 8, 96 // f, 128 // f)
    assert out.embeddings.shape == (2, 8, 64)
    assert out.frame_descriptors.shape == (2, 64)
    # embeddings of valid masks are unit norm
    for b, k in zip(*np.nonzero(out.valid)):
        np.testing.assert_allclose(np.linalg.norm(out.embeddings[b, k]), 1.0, atol=1e-3)
    obs = fe.observations(out, times=[0.0, 0.1], poses=[np.eye(4)] * 2)
    assert len(obs) == 2
    for frame in obs:
        for o in frame:
            assert o.point_cloud.shape[1] == 3
            # lifted points respect max_depth
            assert (o.point_cloud[:, 2] <= params.max_depth + 1e-3).all()


def test_ultralytics_converter_structure(rng):
    """Build a synthetic ultralytics-layout state_dict with the right
    shapes (derived by inverting the converter's transforms against our
    init tree) and check the converter reproduces the exact flax variable
    structure + shapes."""
    import jax

    cfg = fastsam.TINY_TEST
    model = fastsam.YoloSeg(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    # invert: flax tree -> ultralytics key/value dict
    inv_backbone = {v: k for k, v in fastsam._UL_BACKBONE.items()}
    inv_neck = {v: k for k, v in fastsam._UL_NECK.items()}

    sd = {}

    def emit_conv_bn(prefix, p, s):
        sd[f"model.{prefix}.conv.weight"] = np.transpose(
            np.asarray(p["conv"]["kernel"]), (3, 2, 0, 1))
        sd[f"model.{prefix}.bn.weight"] = np.asarray(p["bn"]["scale"])
        sd[f"model.{prefix}.bn.bias"] = np.asarray(p["bn"]["bias"])
        sd[f"model.{prefix}.bn.running_mean"] = np.asarray(s["bn"]["mean"])
        sd[f"model.{prefix}.bn.running_var"] = np.asarray(s["bn"]["var"])

    def emit(prefix, ptree, stree):
        if set(ptree) == {"conv", "bn"}:
            emit_conv_bn(prefix, ptree, stree)
            return
        if "kernel" in ptree:
            sd[f"model.{prefix}.weight"] = np.transpose(
                np.asarray(ptree["kernel"]), (3, 2, 0, 1))
            if "bias" in ptree:
                sd[f"model.{prefix}.bias"] = np.asarray(ptree["bias"])
            return
        for name, sub in ptree.items():
            child = name
            if name.startswith("m") and name[1:].isdigit():
                child = f"m.{name[1:]}"
            emit(f"{prefix}.{child}", sub, stree.get(name, {}))

    params = variables["params"]
    stats = variables["batch_stats"]
    for name, p in params.items():
        if name in inv_backbone:
            emit(str(inv_backbone[name]), p, stats.get(name, {}))
        elif name in inv_neck:
            emit(str(inv_neck[name]), p, stats.get(name, {}))
        elif name == "proto":
            emit("22.proto", p, stats.get(name, {}))
        elif name.startswith("head"):
            lvl = name[-1]
            for branch in ("cv2", "cv3", "cv4"):
                for k in range(3):
                    emit(f"22.{branch}.{lvl}.{k}", p[f"{branch}_{k}"],
                         stats.get(name, {}).get(f"{branch}_{k}", {}))

    converted = fastsam.convert_ultralytics_state_dict(sd, cfg)
    matches = jax.tree.map(lambda a, b: tuple(a.shape) == tuple(b.shape),
                           variables, converted)
    assert jax.tree.all(matches)
    # converted weights actually run
    out = model.apply(converted, jnp.zeros((1, 64, 64, 3)))
    assert out["proto"].shape[0] == 1


def test_real_scale_parameter_counts():
    """The full-size architectures must be at the published weight scales
    (FastSAM-x == YOLOv8x-seg ~72M params, DINOv2-base ~86M) — guards
    against silent scale regressions in the configs the converters target
    (reference loads FastSAM-x.pt / dinov2-base, fastsam_wrapper.py:90,
    :184-188)."""
    import jax

    def n_params(tree):
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

    model = fastsam.YoloSeg(fastsam.FASTSAM_X)
    v = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                          jnp.zeros((1, 64, 64, 3))))
    n = n_params(v["params"])
    assert 6.0e7 < n < 8.5e7, n

    from roman_tpu.perception import dinov2

    vit = dinov2.make_model(dinov2.DINOV2_BASE)
    vv = jax.eval_shape(lambda: vit.init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 518, 518, 3))))
    nv = n_params(vv["params"])
    assert 8.0e7 < nv < 9.5e7, nv


def test_head_hidden_widths_match_ultralytics():
    """Regression: head hidden widths must follow ultralytics (computed
    once from the P3 channel count, shared by all levels) or real
    checkpoint kernels shape-mismatch at P4/P5: c2 = max(16, ch0//4,
    reg_max*4), c3 = max(ch0, min(nc, 100)), c4 = max(ch0//4, nm)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from roman_tpu.perception.fastsam import FASTSAM_X, DetectSegHead

    c = FASTSAM_X
    ch0 = c.ch(256)  # 320 at x scale
    want_cb = max(16, ch0 // 4, c.reg_max * 4)   # 80
    want_cc = max(ch0, min(c.nc, 100))           # 320
    want_c4 = max(ch0 // 4, c.nm)                # 80
    # instantiate each level head with its level's input width — the
    # HIDDEN widths must not vary across levels
    for lvl, in_ch in enumerate((c.ch(256), c.ch(512), c.ch(512))):
        head = DetectSegHead(c, lvl)
        params = head.init(jax.random.key(0),
                           jnp.zeros((1, 8, 8, in_ch), jnp.float32))
        p = params["params"]
        assert p["cv2_0"]["conv"]["kernel"].shape[-1] == want_cb, lvl
        assert p["cv3_0"]["conv"]["kernel"].shape[-1] == want_cc, lvl
        assert p["cv4_0"]["conv"]["kernel"].shape[-1] == want_c4, lvl
        assert p["cv2_2"]["kernel"].shape[-1] == 4 * c.reg_max


def test_yolov8_converter_matches_golden():
    """Converter + flax forward vs a frozen independent torch
    implementation of the ultralytics yolov8-seg module graph
    (tests/fixtures/gen_perception_golden.py, exact ultralytics
    state_dict naming incl. Proto's learned ConvTranspose upsample and
    Conv-BN-SiLU cv3; perturbed BN running stats so dropped stats can't
    pass silently). Protects the reference's FastSAM-x checkpoint
    loading contract (roman/map/fastsam_wrapper.py:90, :517-525) without
    torch at test time."""
    import dataclasses
    import os

    golden = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                                  "perception_golden.npz"))
    sd = {k[len("yolo.sd."):]: golden[k] for k in golden.files
          if k.startswith("yolo.sd.")}
    cfg = dataclasses.replace(fastsam.TINY_TEST, dtype=jnp.float32)
    variables = fastsam.convert_ultralytics_state_dict(sd, cfg)
    out = fastsam.YoloSeg(cfg).apply(variables,
                                     jnp.asarray(golden["yolo.image"]))
    for lvl in range(3):
        box, cls, mc = out["levels"][lvl]
        np.testing.assert_allclose(
            np.asarray(box, np.float32), golden[f"yolo.expected_box{lvl}"],
            atol=3e-4, err_msg=f"box level {lvl}")
        np.testing.assert_allclose(
            np.asarray(cls, np.float32), golden[f"yolo.expected_cls{lvl}"],
            atol=3e-4, err_msg=f"cls level {lvl}")
        np.testing.assert_allclose(
            np.asarray(mc, np.float32), golden[f"yolo.expected_mc{lvl}"],
            atol=3e-4, err_msg=f"mc level {lvl}")
    np.testing.assert_allclose(np.asarray(out["proto"], np.float32),
                               golden["yolo.expected_proto"], atol=3e-4)


def test_dfl_and_mask_assembly_match_golden():
    """dfl_decode and prototype-mask assembly vs frozen torch math."""
    import os

    golden = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                                  "perception_golden.npz"))
    dfl = np.asarray(fastsam.dfl_decode(jnp.asarray(golden["yolo.dfl_logits"]),
                                        16))
    np.testing.assert_allclose(dfl, golden["yolo.expected_dfl"], atol=1e-5)
    masks = np.asarray(jax.nn.sigmoid(jnp.einsum(
        "kc,hwc->khw", jnp.asarray(golden["yolo.mask_coefs"]),
        jnp.asarray(golden["yolo.mask_proto"]))))
    np.testing.assert_allclose(masks, golden["yolo.expected_masks"],
                               atol=1e-5)
