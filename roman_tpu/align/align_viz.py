"""Association visualization geometries + renders.

Parity with reference roman/align/align_viz.py (create_association
geometries as point clouds + line sets, :1-204) and submap_viz.py —
rebuilt on numpy + matplotlib instead of open3d: the geometry builder
returns plain arrays (usable by any renderer) and the render functions
draw them offscreen.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def create_association_geometries(submap1, submap2, associations,
                                  T_align: Optional[np.ndarray] = None,
                                  z_lift: float = 0.0):
    """Geometry arrays for one registered submap pair.

    associations: (k, 2) indices into the two submaps' segment lists.
    T_align (4, 4) maps submap2's frame onto submap1's (applied when
    given, the reference's aligned view); z_lift offsets submap2 for the
    unaligned side-by-side view.

    Returns dict with centers1 (n, 3), centers2 (m, 3) (transformed),
    lines (k, 2, 3) association segments, colors1/colors2 (n/m, 3).
    """
    c1 = np.stack([np.asarray(s.center).reshape(3) for s in submap1.segments])
    c2 = np.stack([np.asarray(s.center).reshape(3) for s in submap2.segments])
    if T_align is not None:
        c2 = c2 @ np.asarray(T_align)[:3, :3].T + np.asarray(T_align)[:3, 3]
    else:
        c2 = c2 + np.array([0.0, 0.0, z_lift])
    assoc = np.asarray(associations).reshape(-1, 2)
    lines = np.stack([c1[assoc[:, 0]], c2[assoc[:, 1]]], axis=1) \
        if len(assoc) else np.zeros((0, 2, 3))
    colors1 = np.tile(np.array([[0.55, 0.0, 0.0]]), (len(c1), 1))  # maroon
    colors2 = np.tile(np.array([[0.0, 0.0, 0.8]]), (len(c2), 1))   # blue
    return dict(centers1=c1, centers2=c2, lines=lines,
                colors1=colors1, colors2=colors2)


def render_association_geometries(geoms: dict, ax=None, title: str = ""):
    """Draw geometry arrays from create_association_geometries."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ax is None:
        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(projection="3d")
    c1, c2 = geoms["centers1"], geoms["centers2"]
    ax.scatter(c1[:, 0], c1[:, 1], c1[:, 2], c=geoms["colors1"], s=14,
               label="submap 1")
    ax.scatter(c2[:, 0], c2[:, 1], c2[:, 2], c=geoms["colors2"], s=14,
               label="submap 2")
    for seg in geoms["lines"]:
        ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color="lawngreen",
                linewidth=0.9)
    ax.legend()
    if title:
        ax.set_title(title)
    return ax


def align_viz(submaps1, submaps2, results, output_dir: str,
              num_req_assoc: int = 4, aligned: bool = True,
              z_lift: float = 5.0) -> List[str]:
    """Render every accepted loop-closure pair (reference align_viz.py):
    aligned=True applies the estimated T (overlapping view); otherwise the
    side-by-side +z view. Returns the written paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    na = results.clipper_num_associations
    written = []
    for i in range(na.shape[0]):
        for j in range(na.shape[1]):
            if not na[i, j] >= num_req_assoc:
                continue
            assoc = results.associated_objs_mat[i][j]
            if len(assoc) == 0:
                continue
            T = results.T_ij_hat_mat[i, j] if aligned else None
            if T is not None and not np.isfinite(T).all():
                T = None
            g = create_association_geometries(
                submaps1[i], submaps2[j], assoc, T_align=T,
                z_lift=0.0 if T is not None else z_lift)
            ax = render_association_geometries(
                g, title=f"submaps ({i}, {j}): {int(na[i, j])} assoc")
            path = os.path.join(output_dir, f"assoc_{i:03d}_{j:03d}.png")
            plt.savefig(path, dpi=120)
            plt.close("all")
            written.append(path)
    return written


def submap_viz(submaps, output_path: str, cols: int = 5):
    """Grid of per-submap object plots (reference submap_viz.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(submaps)
    rows = (n + cols - 1) // cols
    fig = plt.figure(figsize=(3 * cols, 3 * rows))
    for k, sm in enumerate(submaps):
        ax = fig.add_subplot(rows, cols, k + 1, projection="3d")
        c = np.stack([np.asarray(s.center).reshape(3) for s in sm.segments]) \
            if sm.segments else np.zeros((0, 3))
        if len(c):
            ax.scatter(c[:, 0], c[:, 1], c[:, 2], s=8)
        ax.set_title(f"submap {sm.id} ({len(c)} objs)", fontsize=8)
        ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(output_path, dpi=100)
    plt.close(fig)
    return output_path
