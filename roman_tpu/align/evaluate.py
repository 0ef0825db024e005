"""Offline alignment evaluation: success rates by viewpoint change,
loop-closure precision/recall sweeps with AUC, place-recognition recall.

Parity with reference roman/align/evaluate.py (SubmapAlignEvaluator):
- alignment success rate bucketed by GT yaw difference 0/90/180 deg
  (:211-231, buckets at <30 / 30-150 / >150 per :30-35)
- LC precision/recall with TP = robots-nearby AND predicted AND
  pose-correct (:233-288)
- PR sweeps over the #associations (or submap-similarity) threshold ->
  AUC (:290-322)
- place-recognition recall@1 over the aggregated similarity matrix
  (:324-396)
- timing summary (:398-406)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from roman_tpu.align.results import SubmapAlignResults


@dataclasses.dataclass
class EvalParams:
    angle_threshold_deg: float = 10.0
    distance_threshold_m: float = 5.0
    nearby_threshold_m: Optional[float] = None  # default: use robots_nearby mask
    min_assoc: int = 4


@dataclasses.dataclass
class PR:
    precision: float
    recall: float
    tp: int
    fp: int
    fn: int


@dataclasses.dataclass
class PRSweep:
    thresholds: np.ndarray
    precisions: np.ndarray
    recalls: np.ndarray

    @property
    def auc(self) -> float:
        """Area under the PR curve (trapezoid over recall)."""
        order = np.argsort(self.recalls)
        r = np.concatenate([[0.0], self.recalls[order]])
        p = np.concatenate([[self.precisions[order[0]] if len(order) else 1.0],
                            self.precisions[order]])
        return float(np.trapezoid(p, r))


class SubmapAlignEvaluator:
    def __init__(self, results: List[SubmapAlignResults],
                 params: EvalParams = EvalParams()):
        self.results = results
        self.params = params

    # ---- flattened views over all robot pairs ----
    def _collect(self):
        rows = []
        for res in self.results:
            nearby = ~np.isnan(res.robots_nearby_mat)
            n0, n1 = res.clipper_num_associations.shape
            for i in range(n0):
                for j in range(n1):
                    rows.append(dict(
                        nearby=bool(nearby[i, j]),
                        yaw=res.submap_yaw_diff_mat[i, j],
                        angle_err=res.clipper_angle_mat[i, j],
                        dist_err=res.clipper_dist_mat[i, j],
                        n_assoc=res.clipper_num_associations[i, j],
                        sim=(res.similarity_mat[i, j]
                             if res.similarity_mat is not None else np.nan),
                    ))
        return rows

    def _correct(self, row) -> bool:
        return (
            not np.isnan(row["angle_err"]) and not np.isnan(row["dist_err"])
            and row["angle_err"] < self.params.angle_threshold_deg
            and row["dist_err"] < self.params.distance_threshold_m
        )

    def evaluate_align_success_rate(self):
        """Success rate per GT-yaw bucket (reference :211-231)."""
        buckets = {"0": [], "90": [], "180": []}
        for row in self._collect():
            if not row["nearby"] or np.isnan(row["yaw"]):
                continue
            if row["yaw"] < 30:
                b = "0"
            elif row["yaw"] < 150:
                b = "90"
            else:
                b = "180"
            buckets[b].append(self._correct(row))
        return {k: (float(np.mean(v)) if v else float("nan"), len(v))
                for k, v in buckets.items()}

    def evaluate_precision_recall(self, min_assoc: Optional[int] = None) -> PR:
        """TP = nearby AND predicted AND pose-correct (reference :233-288)."""
        thr = self.params.min_assoc if min_assoc is None else min_assoc
        tp = fp = fn = 0
        for row in self._collect():
            predicted = (not np.isnan(row["n_assoc"])) and row["n_assoc"] >= thr
            positive = row["nearby"]
            if predicted and positive and self._correct(row):
                tp += 1
            elif predicted:
                fp += 1
            elif positive:
                fn += 1
        precision = tp / max(tp + fp, 1)
        recall = tp / max(tp + fn, 1)
        return PR(precision, recall, tp, fp, fn)

    def evaluate_precision_recall_sweep(self, max_thresh: int = 40) -> PRSweep:
        threshs = np.arange(1, max_thresh + 1)
        ps, rs = [], []
        for t in threshs:
            pr = self.evaluate_precision_recall(min_assoc=int(t))
            ps.append(pr.precision)
            rs.append(pr.recall)
        return PRSweep(threshs, np.asarray(ps), np.asarray(rs))

    def evaluate_place_recognition(self) -> float:
        """Recall@1 using the submap similarity matrix (reference :324-396):
        for each query submap (row) with any nearby match, does the argmax
        similarity column correspond to a nearby submap?"""
        hits, total = 0, 0
        for res in self.results:
            if res.similarity_mat is None:
                score = np.nan_to_num(res.clipper_num_associations, nan=-1.0)
            else:
                score = np.nan_to_num(res.similarity_mat, nan=-np.inf)
            nearby = ~np.isnan(res.robots_nearby_mat)
            for i in range(score.shape[0]):
                if not nearby[i].any():
                    continue
                total += 1
                if nearby[i, int(np.argmax(score[i]))]:
                    hits += 1
        return hits / max(total, 1)

    def evaluate_timing(self):
        times = np.concatenate([np.asarray(r.timing_list) for r in self.results
                                if len(r.timing_list)])
        if len(times) == 0:
            return dict(mean=float("nan"), total=0.0, count=0)
        return dict(mean=float(np.mean(times)), total=float(np.sum(times)),
                    count=int(len(times)))

    def report(self) -> str:
        sr = self.evaluate_align_success_rate()
        pr = self.evaluate_precision_recall()
        sweep = self.evaluate_precision_recall_sweep()
        pr1 = self.evaluate_place_recognition()
        tm = self.evaluate_timing()
        lines = [
            "Alignment success rate by GT yaw difference:",
            *(f"  {k:>4} deg: {v[0]:.3f} ({v[1]} pairs)" for k, v in sr.items()),
            f"Loop closures (>= {self.params.min_assoc} assoc): "
            f"P={pr.precision:.3f} R={pr.recall:.3f} "
            f"(tp={pr.tp} fp={pr.fp} fn={pr.fn})",
            f"PR sweep AUC: {sweep.auc:.3f}",
            f"Place recognition recall@1: {pr1:.3f}",
            f"Registration timing: {tm['mean']*1e3:.2f} ms/pair avg over "
            f"{tm['count']} pairs ({tm['total']:.2f} s total)",
        ]
        return "\n".join(lines)


def main():
    import argparse

    ap = argparse.ArgumentParser(description="Evaluate submap alignment results")
    ap.add_argument("results", nargs="+", help="align .pkl result files")
    ap.add_argument("--angle-thresh", type=float, default=10.0)
    ap.add_argument("--dist-thresh", type=float, default=5.0)
    ap.add_argument("--min-assoc", type=int, default=4)
    args = ap.parse_args()
    results = [SubmapAlignResults.load(p) for p in args.results]
    ev = SubmapAlignEvaluator(
        results, EvalParams(args.angle_thresh, args.dist_thresh,
                            min_assoc=args.min_assoc))
    print(ev.report())


if __name__ == "__main__":
    main()
