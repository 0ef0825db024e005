"""Standalone loop-closure (submap alignment) CLI.

Parity with reference demo/loop_closures.py: run submap_align on two map
pickles without the rest of the pipeline.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

from roman_tpu.align.submap_align import submap_align  # noqa: E402
from roman_tpu.params.submap_align_params import (  # noqa: E402
    SubmapAlignInputOutput,
    SubmapAlignParams,
)

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("inputs", nargs=2, help="two ROMAN map .pkl files")
    parser.add_argument("-o", "--output-dir", required=True)
    parser.add_argument("-p", "--params", default=None,
                        help="submap_align.yaml path")
    parser.add_argument("-g", "--gt", nargs=2, default=[None, None],
                        help="gt pose yaml per robot")
    parser.add_argument("-n", "--num-req-assoc", type=int, default=4)
    parser.add_argument("--run-name", default="align")
    parser.add_argument("--skip-distance", type=float, default=np.inf)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    sm_params = (SubmapAlignParams.from_yaml(args.params)
                 if args.params else SubmapAlignParams())
    names = [os.path.splitext(os.path.basename(p))[0] for p in args.inputs]
    sm_io = SubmapAlignInputOutput(
        inputs=args.inputs,
        output_dir=args.output_dir,
        run_name=args.run_name,
        input_gt_pose_yaml=list(args.gt),
        robot_names=names,
        lc_association_thresh=args.num_req_assoc,
        skip_distance=args.skip_distance,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    results = submap_align(sm_params, sm_io)
    n_lc = int((np.nan_to_num(results.clipper_num_associations)
                >= args.num_req_assoc).sum())
    print(f"{n_lc} loop closures written to {sm_io.output_g2o}")
