"""Render association figures / camera-frame association video for
accepted loop closures.

Reference demo/association_vid.py (:63-317) composes, per video frame,
the two robots' camera images with the matched segments' reprojected
outlines and match lines, next to an open3d 3D spin. Equivalents here:

- default mode: one 3D association figure per accepted loop-closure pair
  (+ optional video composition of the figures);
- --camera-video: the reference's camera-frame video for one submap pair
  (chosen by --idx or max associations): side-by-side camera frames over
  the synchronized time window, per-match colored outlines reprojected
  from the mapped segments' point clouds, green nearest-pixel match
  lines (align_viz.association_camera_video). --images can supply real
  recordings (npz/dir per robot); synthetic demo worlds get a canvas
  stand-in with the same overlays.
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
    parser.add_argument("--camera-video", action="store_true",
                        help="render the camera-frame association video "
                             "for one submap pair (reference "
                             "association_vid.py capability)")
    parser.add_argument("--idx", type=int, nargs=2, default=None,
                        help="submap pair for --camera-video (default: "
                             "max associations)")
    parser.add_argument("--images", type=str, nargs=2, default=None,
                        metavar=("IMGS0", "IMGS1"),
                        help="per-robot image recordings (npz file or "
                             "image dir) for --camera-video")
    parser.add_argument("--camera-fps", type=float, default=6.0)
    args = parser.parse_args()

    from roman_tpu.align.align_viz import align_viz  # noqa: E402

    results = SubmapAlignResults.load(args.results_pkl)
    maps = [load_roman_map(p) for p in results.submap_io.inputs]
    sp = SubmapParams.from_submap_align_params(results.submap_align_params)
    submaps = [submaps_from_roman_map(m, sp) for m in maps]

    if args.camera_video:
        from roman_tpu.align.align_viz import association_camera_video

        img_data = None
        if args.images is not None:
            from roman_tpu.data.img_data import ImgData

            img_data = [
                ImgData.from_npz(p) if p.endswith(".npz")
                else ImgData.from_dir(p)
                for p in args.images
            ]
        os.makedirs(args.output_dir, exist_ok=True)
        out, n = association_camera_video(
            results, submaps, maps,
            os.path.join(args.output_dir, "association_camera.mp4"),
            idx=args.idx, fps=args.camera_fps, img_data=img_data)
        print(f"wrote {n}-frame camera association video to {out}")
        sys.exit(0)

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
