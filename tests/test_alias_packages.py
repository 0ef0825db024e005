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
