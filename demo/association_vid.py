"""Render association figures for accepted loop closures.

Reference demo/association_vid.py renders a post-hoc video of submap
associations with open3d; this equivalent writes one figure per accepted
loop-closure pair from a saved SubmapAlignResults pickle.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

from roman_tpu.align.results import SubmapAlignResults  # noqa: E402
from roman_tpu.map.roman_map import SubmapParams, load_roman_map, submaps_from_roman_map  # noqa: E402

if __name__ == "__main__":
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    parser = argparse.ArgumentParser()
    parser.add_argument("results_pkl", help="align .pkl results file")
    parser.add_argument("-o", "--output-dir", required=True)
    parser.add_argument("-n", "--num-req-assoc", type=int, default=4)
    parser.add_argument("--aligned", action="store_true",
                        help="apply the estimated T (overlapping view)")
    parser.add_argument("--video", action="store_true",
                        help="also compose the figures into a video")
    parser.add_argument("--fps", type=float, default=2.0)
    args = parser.parse_args()

    from roman_tpu.align.align_viz import align_viz  # noqa: E402

    results = SubmapAlignResults.load(args.results_pkl)
    maps = [load_roman_map(p) for p in results.submap_io.inputs]
    sp = SubmapParams.from_submap_align_params(results.submap_align_params)
    submaps = [submaps_from_roman_map(m, sp) for m in maps]

    written = align_viz(submaps[0], submaps[1], results, args.output_dir,
                        num_req_assoc=args.num_req_assoc,
                        aligned=args.aligned)
    print(f"wrote {len(written)} association figures to {args.output_dir}")
    if args.video and written:
        import cv2 as cv

        from roman_tpu.viz import write_video

        frames = [cv.cvtColor(cv.imread(p), cv.COLOR_BGR2RGB)
                  for p in written]
        out = write_video(frames,
                          os.path.join(args.output_dir, "associations.mp4"),
                          fps=args.fps)
        print(f"wrote association video to {out}")
