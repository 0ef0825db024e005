"""Render a saved map pickle to a 3D figure (reference demo/o3d_viz.py
equivalent, matplotlib instead of open3d)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

from roman_tpu.map.roman_map import load_roman_map  # noqa: E402
from roman_tpu.viz import plot_map_3d  # noqa: E402

if __name__ == "__main__":
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    parser = argparse.ArgumentParser()
    parser.add_argument("map_pkl")
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--show-text", action="store_true",
                        help="display segment id labels (o3d_viz.py flag)")
    parser.add_argument("--no-orig", action="store_true",
                        help="do not display the origin frame")
    parser.add_argument("-t", "--time-range", type=float, nargs=2,
                        help="only segments seen within [t0, t1]")
    args = parser.parse_args()

    m = load_roman_map(args.map_pkl)
    ax = plot_map_3d(m.segments, trajectory=m.trajectory,
                     time_range=args.time_range,
                     show_labels=args.show_text,
                     show_origin=not args.no_orig)
    out = args.output or args.map_pkl.replace(".pkl", ".png")
    plt.savefig(out, dpi=150)
    print(f"saved {out} ({len(m.segments)} segments)")
