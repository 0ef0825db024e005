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
