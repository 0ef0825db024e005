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
from roman_tpu.viz import plot_registration_3d  # noqa: E402

if __name__ == "__main__":
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    parser = argparse.ArgumentParser()
    parser.add_argument("results_pkl", help="align .pkl results file")
    parser.add_argument("-o", "--output-dir", required=True)
    parser.add_argument("-n", "--num-req-assoc", type=int, default=4)
    args = parser.parse_args()

    results = SubmapAlignResults.load(args.results_pkl)
    maps = [load_roman_map(p) for p in results.submap_io.inputs]
    sp = SubmapParams.from_submap_align_params(results.submap_align_params)
    submaps = [submaps_from_roman_map(m, sp) for m in maps]

    os.makedirs(args.output_dir, exist_ok=True)
    count = 0
    na = results.clipper_num_associations
    for i in range(na.shape[0]):
        for j in range(na.shape[1]):
            if not (na[i, j] >= args.num_req_assoc):
                continue
            assoc = results.associated_objs_mat[i][j]
            if len(assoc) == 0:
                continue
            ax = plot_registration_3d(submaps[0][i], submaps[1][j], np.asarray(assoc))
            ax.set_title(f"submaps ({i}, {j}): {int(na[i, j])} associations")
            out = os.path.join(args.output_dir, f"assoc_{i:03d}_{j:03d}.png")
            plt.savefig(out, dpi=120)
            plt.close("all")
            count += 1
    print(f"wrote {count} association figures to {args.output_dir}")
