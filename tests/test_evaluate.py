"""Alignment evaluator: frustum-overlap filtering, multi-robot
aggregation, and the aggregated place-recognition PR sweep (reference
roman/align/evaluate.py:324-584)."""

import numpy as np

from roman_tpu.align.evaluate import (
    EvalParams,
    SubmapAlignEvaluator,
    _convex_polys_intersect,
    camera_views_overlap,
)
from roman_tpu.align.results import SubmapAlignResults
from roman_tpu.data.camera import CameraParams


def _results(n0, n1, nearby, counts, angle=None, dist=None):
    nan = np.full((n0, n1), np.nan)
    T = np.broadcast_to(np.eye(4), (n0, n1, 4, 4)).copy()
    return SubmapAlignResults(
        robots_nearby_mat=np.asarray(nearby, float),
        clipper_angle_mat=nan.copy() if angle is None else np.asarray(angle, float),
        clipper_dist_mat=nan.copy() if dist is None else np.asarray(dist, float),
        clipper_num_associations=np.asarray(counts, float),
        similarity_mat=None,
        submap_yaw_diff_mat=nan.copy(),
        associated_objs_mat=[[np.zeros((0, 2), np.int64)] * n1] * n0,
        T_ij_mat=T,
        T_ij_hat_mat=T.copy(),
        timing_list=[0.01] * (n0 * n1),
        submap_align_params=None,
        submap_io=None,
    )


def test_convex_polys_intersect():
    a = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    b = a + np.array([1.0, 1.0])   # overlapping
    c = a + np.array([5.0, 0.0])   # disjoint
    d = np.array([[0.5, 0.5], [1.5, 0.5], [1.0, 1.5]], float)  # contained
    assert _convex_polys_intersect(a, b)
    assert not _convex_polys_intersect(a, c)
    assert _convex_polys_intersect(a, d)


def test_camera_views_overlap_geometry():
    cam = CameraParams.simple(width=640, height=480, f=500.0)
    # facing each other 10 m apart (yaw 180): frustums overlap
    T_face = np.eye(4)
    T_face[:3, :3] = np.array([[-1, 0, 0], [0, -1, 0], [0, 0, 1.0]])
    T_face[0, 3] = 10.0
    assert camera_views_overlap(T_face, cam, cam, (0.0, 20.0))
    # back to back far apart: no overlap
    T_back = T_face.copy()
    T_back[:3, :3] = np.eye(3)
    T_back[0, 3] = -50.0
    assert not camera_views_overlap(T_back, cam, cam, (0.0, 20.0))


def test_place_recognition_aggregated():
    """3 robots, 2 submaps each; only pair (0,1) submap 0 is co-located
    with a strong association count."""
    nearby01 = [[5.0, np.nan], [np.nan, np.nan]]
    counts01 = [[10.0, 0.0], [0.0, 0.0]]
    r01 = _results(2, 2, nearby01, counts01)
    r02 = _results(2, 2, np.full((2, 2), np.nan), np.zeros((2, 2)))
    r12 = _results(2, 2, np.full((2, 2), np.nan), np.zeros((2, 2)))
    ev = SubmapAlignEvaluator([r01, r02, r12],
                              EvalParams(place_rec_rm_no_overlap_queries=True))
    agg = ev._aggregate_matrix("clipper_num_associations")
    assert agg.shape == (6, 6)
    # symmetry: block (1,0) is the transpose of block (0,1)
    np.testing.assert_allclose(agg[2:4, 0:2], np.asarray(counts01).T)
    pr = ev.evaluate_place_recognition(num_associations_thresh=3)
    # the only overlapping queries are (robot0 sm0, robot1 sm0); both hit
    assert pr.tp == 2 and pr.fp == 0 and pr.fn == 0
    assert pr.precision == 1.0 and pr.recall == 1.0
    sweep = ev.evaluate_place_recognition_sweep()
    assert len(sweep.thresholds) == 21
    # above the count=10, recall must fall to 0
    assert sweep.recalls[-1] <= sweep.recalls[0]


def test_frustum_filter_prunes_nearby():
    cam = CameraParams.simple(width=640, height=480, f=500.0)
    # two nearby pairs: one facing (overlap), one back-to-back far (none)
    nearby = [[5.0, 8.0]]
    counts = [[4.0, 4.0]]
    res = _results(1, 2, nearby, counts)
    T_face = np.eye(4)
    T_face[:3, :3] = np.array([[-1, 0, 0], [0, -1, 0], [0, 0, 1.0]])
    T_face[0, 3] = 10.0
    T_back = np.eye(4)
    T_back[0, 3] = -50.0
    res.T_ij_mat = np.stack([np.stack([T_face, T_back])])
    ev = SubmapAlignEvaluator(
        [res], EvalParams(rm_non_camera_overlap=True),
        robot_pairs=[(0, 1)], camera_params=[cam, cam])
    nearby_after = ev.results[0].robots_nearby_mat
    assert not np.isnan(nearby_after[0, 0])
    assert np.isnan(nearby_after[0, 1])


def test_precision_recall_reference_denominator():
    """Reference-exact recall (reference evaluate.py:250,284-286):
    num_relevant = ALL nearby pairs, so a nearby pair that was predicted
    but misregistered is an FP for precision AND a miss for recall —
    counting it only as FP (tp/(tp+fn) with fn = unpredicted positives)
    would report recall 1.0 on a grid where half the overlapping pairs
    landed on the wrong transform."""
    # 4 nearby pairs, all predicted (counts >= thr): 2 correct, 2 with a
    # blown angle error; plus one far pair predicted-and-wrong (classic FP)
    nearby = [[1.0, 1.0, 1.0, 1.0, np.nan]]
    counts = [[8.0, 8.0, 8.0, 8.0, 8.0]]
    angle = [[1.0, 1.0, 60.0, 60.0, 60.0]]
    dist = [[0.1, 0.1, 0.1, 0.1, 0.1]]
    res = _results(1, 5, nearby, counts, angle=angle, dist=dist)
    ev = SubmapAlignEvaluator([res], EvalParams())
    pr = ev.evaluate_precision_recall(min_assoc=4)
    assert pr.tp == 2 and pr.fp == 3
    assert pr.recall == 2 / 4          # NOT 2/2
    assert pr.precision == 2 / 5
    # a far pair registered "correctly" is neither TP nor FP (reference
    # false_positives = is_positive & ~correct)
    angle2 = [[1.0, 1.0, 60.0, 60.0, 1.0]]
    res2 = _results(1, 5, nearby, counts, angle=angle2, dist=dist)
    ev2 = SubmapAlignEvaluator([res2], EvalParams())
    pr2 = ev2.evaluate_precision_recall(min_assoc=4)
    assert pr2.tp == 2 and pr2.fp == 2 and pr2.recall == 0.5
