import numpy as np
import jax.numpy as jnp

from roman_tpu.map.objects import Ellipsoid, MeshObject, PointCloudObject, Polytope
from roman_tpu.perception.wrapper import (
    apply_label_filters,
    erode_masks,
    rotate_images,
    triangle_ignore_mask,
)
from roman_tpu.sim.world import yaw_T


def test_ellipsoid(rng):
    e = Ellipsoid.random(rng, id=1)
    v0 = e.volume
    pts = e.sample_surface(rng, 200)
    assert pts.shape == (200, 3)
    T = yaw_T(0.5, np.array([1.0, 2.0, 0.0]))
    c0 = e.center.copy()
    e.transform(T)
    np.testing.assert_allclose(e.center, T[:3, :3] @ c0 + T[:3, 3], atol=1e-9)
    assert e.volume == v0


def test_polytope_and_mesh(rng):
    p = Polytope.random(rng, n_points=20, scale=1.0)
    assert p.volume > 0
    # unit cube mesh
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
                  [1, 2, 6], [1, 6, 5], [2, 3, 7], [2, 7, 6], [3, 0, 4], [3, 4, 7]])
    m = MeshObject(centroid=np.zeros(3), vertices=v, faces=f)
    np.testing.assert_allclose(m.volume, 1.0, atol=1e-9)
    s = m.sample_surface(rng, 100)
    assert s.min() >= -1e-9 and s.max() <= 1 + 1e-9


def test_pointcloud_object(rng):
    pts = rng.normal(size=(300, 3))
    o = PointCloudObject(pts, id=3)
    assert o.volume > 0
    pv = o.partial_view(np.array([10.0, 0, 0]), keep_frac=0.5)
    assert len(pv.points) == 150


def test_label_filters():
    B, K, H, W = 1, 2, 16, 16
    masks = np.zeros((B, K, H, W), bool)
    masks[0, 0, 2:6, 2:6] = True      # inside ignore box
    masks[0, 1, 10:14, 10:14] = True  # outside
    valid = np.ones((B, K), bool)
    ignore = jnp.asarray([[[0.0, 0.0, 8.0, 8.0]]])
    ok = np.asarray(apply_label_filters(jnp.asarray(masks), jnp.asarray(valid),
                                        ignore_boxes=ignore))
    assert not ok[0, 0] and ok[0, 1]
    keep = jnp.asarray([[[8.0, 8.0, 16.0, 16.0]]])
    ok = np.asarray(apply_label_filters(jnp.asarray(masks), jnp.asarray(valid),
                                        keep_boxes=keep))
    assert not ok[0, 0] and ok[0, 1]


def _reference_mask_decisions(masks, ignore_boxes, keep_boxes,
                              use_keep, keep_frac):
    """Literal numpy twin of the reference's ignore/keep filtering
    (fastsam_wrapper.py:440-484 box rasterization + :544-563 decisions):
    union pixel masks from int-truncated exclusive box slices; drop on
    ANY ignore overlap; with keep labels, require intersection with the
    keep UNION >= keep_frac * mask area. Returns the keep decision per
    mask."""
    K, H, W = masks.shape
    ignore_mask = np.zeros((H, W), np.int8)
    for box in ignore_boxes:
        x0, y0, x1, y1 = np.array(box).astype(np.int64).reshape(-1).tolist()
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, W), min(y1, H)
        if x1 > x0 and y1 > y0:
            ignore_mask[y0:y1, x0:x1] = 1
    keep_mask = None
    if use_keep:
        keep_mask = np.zeros((H, W), np.int8)
        for box in keep_boxes:
            x0, y0, x1, y1 = np.array(box).astype(np.int64).reshape(-1).tolist()
            x0, y0 = max(x0, 0), max(y0, 0)
            x1, y1 = min(x1, W), min(y1, H)
            if x1 > x0 and y1 > y0:
                keep_mask[y0:y1, x0:x1] = 1
    decisions = np.ones(K, bool)
    for k in range(K):
        mk = masks[k].astype(np.int8)
        if np.any(np.bitwise_and(mk, ignore_mask)):
            decisions[k] = False
            continue
        if keep_mask is not None and (
                np.bitwise_and(mk, keep_mask).sum() < keep_frac * mk.sum()):
            decisions[k] = False
    return decisions


def test_label_filter_matches_reference_rules(rng):
    """Identical mask-drop decisions as the reference's YOLOv7-driven
    filtering for identical boxes (VERDICT r2 item 7): random masks vs
    random ignore/keep boxes, including fractional/negative/out-of-range
    box coordinates and masks spanning two adjacent keep boxes (which
    only a UNION keep rule accepts)."""
    import jax.numpy as jnp

    H, W, K = 32, 48, 12
    keep_frac = 0.5
    for trial in range(8):
        masks = np.zeros((K, H, W), bool)
        for k in range(K):
            y = rng.integers(0, H - 6)
            x = rng.integers(0, W - 6)
            h = rng.integers(3, 7)
            w = rng.integers(3, 7)
            masks[k, y:y + h, x:x + w] = True
        nb = 4
        def rand_boxes():
            out = []
            for _ in range(nb):
                x0 = rng.uniform(-4, W - 2)
                y0 = rng.uniform(-4, H - 2)
                out.append([x0, y0, x0 + rng.uniform(0, W / 2 + 4),
                            y0 + rng.uniform(0, H / 2 + 4)])
            return np.array(out)
        ignore = rand_boxes()
        keep = rand_boxes()
        ref = _reference_mask_decisions(masks, ignore, keep, True, keep_frac)
        got = np.asarray(apply_label_filters(
            jnp.asarray(masks[None]), jnp.ones((1, K), bool),
            ignore_boxes=jnp.asarray(ignore[None], jnp.float32),
            keep_boxes=jnp.asarray(keep[None], jnp.float32),
            ignore_frac=1e-9, keep_frac=keep_frac))[0]
        np.testing.assert_array_equal(got, ref, err_msg=f"trial {trial}")

    # mask spanning two adjacent keep boxes: union rule keeps it
    masks = np.zeros((1, 1, H, W), bool)
    masks[0, 0, 4:8, 4:20] = True
    keep = np.array([[[4.0, 0.0, 12.0, H], [12.0, 0.0, 20.0, H]]])
    got = np.asarray(apply_label_filters(
        jnp.asarray(masks), jnp.ones((1, 1), bool),
        keep_boxes=jnp.asarray(keep, jnp.float32), keep_frac=0.9))[0, 0]
    ref = _reference_mask_decisions(masks[0], np.zeros((0, 4)), keep[0],
                                    True, 0.9)[0]
    assert bool(got) is True and bool(ref) is True


def test_erosion_and_rotation(rng):
    masks = np.zeros((1, 1, 10, 10), bool)
    masks[0, 0, 3:7, 3:7] = True
    er = np.asarray(erode_masks(jnp.asarray(masks), 3))
    assert er.sum() < masks.sum() and er[0, 0, 4:6, 4:6].all()

    img = jnp.asarray(rng.uniform(size=(1, 4, 6, 3)))
    assert rotate_images(img, "CW").shape == (1, 6, 4, 3)
    assert rotate_images(img, "180").shape == (1, 4, 6, 3)
    tri = triangle_ignore_mask([[(0, 0), (4, 0), (0, 4)]], 8, 8)
    assert tri[1, 1] and not tri[7, 7]


def test_erosion_matches_cv2_ellipse(rng):
    import pytest
    """erode_masks must reproduce cv.erode with the reference's
    MORPH_ELLIPSE element exactly (footprint shape incl. the integer-
    truncated row fills, and the default foreground border)."""
    cv = pytest.importorskip("cv2")
    from roman_tpu.perception.wrapper import _ellipse_footprint

    m = np.random.default_rng(3).uniform(size=(32, 40)) > 0.35
    for e in (1, 2, 3):
        k = 2 * e + 1
        el = cv.getStructuringElement(cv.MORPH_ELLIPSE, (k, k), (e, e))
        np.testing.assert_array_equal(_ellipse_footprint(k),
                                      el.astype(bool), err_msg=f"k={k}")
        ref = cv.erode(m.astype(np.uint8), el).astype(bool)
        got = np.asarray(erode_masks(jnp.asarray(m[None, None]), k))[0, 0]
        np.testing.assert_array_equal(got, ref, err_msg=f"k={k}")
