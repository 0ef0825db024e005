"""The reference-layout alias packages (roman.object / roman.offline_rpgo
spelled roman_tpu.object / roman_tpu.offline_rpgo) must expose the
reference's public names so migrating code only swaps the package root."""


def test_object_package_aliases():
    from roman_tpu.map.objects import ObjectBase
    from roman_tpu.map.roman_map import SegmentData
    from roman_tpu.object import (Ellipsoid, MeshObject, Object,  # noqa
                                  PointCloudObject, Polytope, Segment,
                                  SegmentMinimalData)
    from roman_tpu.object.object import Object as O2
    from roman_tpu.object.segment import SegmentMinimalData as SMD
    from roman_tpu.object.similiarity_metrics import (ChamferDistance,
                                                      Wasserstein)

    assert Object is ObjectBase and O2 is ObjectBase
    assert SegmentMinimalData is SegmentData and SMD is SegmentData
    assert callable(ChamferDistance) and callable(Wasserstein)


def test_offline_rpgo_package_aliases():
    import roman_tpu.offline_rpgo as orp
    from roman_tpu.offline_rpgo.combine_loop_closures import (
        LoopClosure, combine_loop_closures)
    from roman_tpu.offline_rpgo.edit_g2o_edge_information import (
        edit_g2o_edge_information)
    from roman_tpu.offline_rpgo.extract_odom_g2o import (
        extract_odom_g2o, roman_map_pkl_to_g2o)
    from roman_tpu.offline_rpgo.g2o_and_time_to_pose_data import (
        g2o_and_time_to_pose_data)
    from roman_tpu.offline_rpgo.g2o_file_fusion import (create_config,
                                                        g2o_file_fusion)
    from roman_tpu.offline_rpgo.plot_g2o import plot_g2o
    from roman_tpu.rpgo import fusion

    # (orp.g2o_file_fusion may be shadowed by the submodule of the same
    # name depending on import order — same as in the reference package)
    assert g2o_file_fusion is fusion.g2o_file_fusion
    for fn in (combine_loop_closures, edit_g2o_edge_information,
               extract_odom_g2o, roman_map_pkl_to_g2o,
               g2o_and_time_to_pose_data, create_config, plot_g2o):
        assert callable(fn)
    assert LoopClosure is not None


def test_map_layer_aliases():
    import numpy as np

    from roman_tpu.map.fastsam_wrapper import FastSAMWrapper
    from roman_tpu.map.global_nearest_neighbor import global_nearest_neighbor
    from roman_tpu.map.voxel_grid import VoxelGrid
    from roman_tpu.perception.wrapper import PerceptionFrontend

    assert issubclass(FastSAMWrapper, PerceptionFrontend)
    assert hasattr(FastSAMWrapper, "from_params")

    scores = np.array([[0.9, 0.0], [0.0, 0.8], [0.0, 0.0]])
    sel = dict(global_nearest_neighbor(scores))
    assert sel[0] == 0 and sel[1] == 1 and 2 not in sel

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (200, 3))
    g1 = VoxelGrid.from_points(pts, 0.2)
    g2 = VoxelGrid.from_points(pts + 0.05, 0.2)
    assert 0.3 < g1.iou(g2) <= 1.0
    assert g1.iou(g1) == 1.0 and g1.iom(g2) >= g1.iou(g2)


def test_align_layer_aliases():
    import numpy as np

    from roman_tpu.align.dist_reg_with_pruning import (DistRegWithPruning,
                                                       GravityConstraintError)
    from roman_tpu.align.object_registration import (
        InsufficientAssociationsException, ObjectRegistration)
    from roman_tpu.align.ransac_reg import RansacReg
    from roman_tpu.align.roman_registration import (FusionMethod, ROMANParams,
                                                    ROMANRegistration)
    from roman_tpu.align.submap import Submap, submaps_from_roman_map  # noqa
    from roman_tpu.align.submap_viz import (generate_bright_color_palette,
                                            random_bright_color, submap_viz)
    from roman_tpu.map.roman_map import SegmentData

    assert GravityConstraintError is not None and callable(submap_viz)
    pal = generate_bright_color_palette(5)
    assert len(pal) == 5 and all(len(c) == 3 for c in pal)
    assert len(random_bright_color(pal)) == 3

    # two identical 6-object maps, second one shifted by a rigid transform
    rng = np.random.default_rng(3)
    centers = rng.uniform(-5, 5, (6, 3))
    th = 0.6
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    t = np.array([2.0, -1.0, 0.5])
    descs = np.eye(6, 8)

    def seg(i, c, d):
        return SegmentData(id=i, center=c, volume=1.0 + 0.1 * i,
                           linearity=0.5, planarity=0.3, scattering=0.2,
                           extent=np.array([1.0, 0.5, 0.2]),
                           semantic_descriptor=d)

    map1 = [seg(i, centers[i], descs[i]) for i in range(6)]
    map2 = [seg(i + 10, R.T @ (centers[i] - t), descs[i]) for i in range(6)]

    reg = ROMANRegistration(ROMANParams(gravity=True, volume=True, pca=True,
                                        semantics_dim=8))
    assert reg.params.fusion_method is FusionMethod.GEOMETRIC_MEAN
    A = reg.register(map1, map2)
    assert A.shape[1] == 2 and len(A) >= 4
    assert all(i == j for i, j in A)  # identity association recovered
    T = reg.T_align(map1, map2, A)
    assert np.allclose(T[:3, :3], R, atol=1e-5)
    assert np.allclose(T[:3, 3], t, atol=1e-4)

    M, C, A_all = reg.get_MCA(map1, map2)
    assert M.shape == (36, 36) and C.shape == (36, 36) and A_all.shape == (36, 2)
    sols = reg.mno_clipper(map1, map2, num_solutions=2)
    assert len(sols) == 2 and sols[0][0].shape[1] == 2

    with np.testing.assert_raises(InsufficientAssociationsException):
        ObjectRegistration().T_align([], map2)

    # positional sigma/epsilon + reference kwarg names
    # (dist_reg_with_pruning.py:17-18)
    prune = DistRegWithPruning(0.3, 0.5, cos_min=0.5, shape_epsilon=0.5)
    Ap = prune.register(map1, map2)
    assert len(Ap) >= 4 and all(i == j for i, j in Ap)
    Tp = prune.T_align(map1, map2, Ap)
    assert np.allclose(Tp[:3, 3], t, atol=1e-4)

    rr = RansacReg(num_iterations=512)
    Ar = rr.register(map1, map2)
    assert Ar.shape[1] == 2 and len(Ar) >= 3


def test_fastsam_wrapper_run_contract():
    """FastSAMWrapper.run returns (list of Observations, frame_descriptor)
    — the reference contract (fastsam_wrapper.py:254-265)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from roman_tpu.data.camera import CameraParams
    from roman_tpu.map.fastsam_wrapper import FastSAMWrapper
    from roman_tpu.map.observation import Observation
    from roman_tpu.params.fastsam_params import FastSAMParams
    from roman_tpu.perception import fastsam
    from roman_tpu.perception.dinov2 import DINOV2_SMALL

    cam = CameraParams.simple(width=128, height=96, f=100.0)
    vit = dataclasses.replace(DINOV2_SMALL, width=64, depth=2, heads=4,
                              img_size=84, dtype=jnp.float32)
    params = FastSAMParams(imgsz=(96, 128), max_masks_per_frame=8,
                           max_points_per_mask=64, max_depth=7.5,
                           erosion_size=0, ignore_people=False, conf=0.0)
    fe = FastSAMWrapper.from_params(params, cam, seg_cfg=fastsam.TINY_TEST,
                                    vit_cfg=vit)
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(96, 128, 3)).astype(np.float32)
    depth = np.full((96, 128), 3.0, np.float32)
    obs, fdesc = fe.run(1.5, np.eye(4), img, depth)
    assert isinstance(obs, list)
    assert all(isinstance(o, Observation) for o in obs)
    for o in obs:
        assert o.time == 1.5 and o.point_cloud.shape[-1] == 3
    assert fdesc is None or np.asarray(fdesc).ndim == 1


def test_object_registration_accepts_features():
    """The per-pair class surface also takes repo-native SubmapFeatures
    (skipping the packing step)."""
    import jax.numpy as jnp
    import numpy as np

    from roman_tpu.align.object_registration import ObjectRegistration
    from roman_tpu.align.registration import RegistrationConfig, build_features

    rng = np.random.default_rng(5)
    centers = rng.uniform(-5, 5, (8, 3)).astype(np.float32)
    cfg = RegistrationConfig(method="clipper")
    f1 = build_features(jnp.asarray(centers), jnp.ones(8, bool), cfg)
    shift = np.array([1.0, -2.0, 0.0], np.float32)
    f2 = build_features(jnp.asarray(centers + shift), jnp.ones(8, bool), cfg)

    reg = ObjectRegistration(cfg)
    A = reg.register(f1, f2)
    assert len(A) >= 4 and all(i == j for i, j in A)
    T = reg.T_align(f1, f2, A)
    assert np.allclose(T[:3, 3], -shift, atol=1e-4)
    assert np.allclose(T[:3, :3], np.eye(3), atol=1e-5)
