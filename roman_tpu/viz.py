"""Visualization: segment outlines/ids drawn on camera images, observation
mask overlays, and 3D object-map renders.

Parity with reference roman/viz.py (visualize_map_on_img :17-42,
visualize_observations_on_img :44-84, 3D view :86-276) and
roman/align/align_viz.py. The reference renders 3D through open3d
offscreen; here matplotlib 3D serves that role (no GL dependency).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def _seg_color(seg_id: int):
    rng = np.random.default_rng(seg_id)
    return tuple(int(c) for c in rng.integers(0, 255, 3))


def visualize_map_on_img(img: np.ndarray, pose: np.ndarray, segments) -> np.ndarray:
    """Draw 2D convex-hull outlines + ids of mapped segments (reference
    viz.py:17-42). img: (H, W, 3) uint8 BGR/RGB; pose: T_world_camera."""
    import cv2 as cv

    out = img.copy()
    for seg in segments:
        outline = seg.outline_2d(pose)
        if outline is None or len(outline) < 2:
            continue
        color = _seg_color(seg.id)
        pts = outline.astype(np.int32).reshape(-1, 1, 2)
        cv.polylines(out, [pts], isClosed=True, color=color, thickness=2)
        c = pts.reshape(-1, 2).mean(axis=0).astype(int)
        cv.putText(out, str(seg.id), tuple(c), cv.FONT_HERSHEY_SIMPLEX, 0.5,
                   color, 1, cv.LINE_AA)
    return out


def visualize_observations_on_img(img: np.ndarray, observations) -> np.ndarray:
    """Overlay observation masks (reference viz.py:44-84)."""
    out = img.astype(np.float32)
    for k, obs in enumerate(observations):
        if obs.mask is None:
            continue
        color = np.array(_seg_color(k), np.float32)
        m = obs.mask.astype(bool)
        out[m] = 0.55 * out[m] + 0.45 * color
    return out.astype(np.uint8)


def plot_map_3d(segments, ax=None, color_by_id: bool = True, trajectory=None,
                max_points_per_seg: int = 200):
    """3D scatter of the object map + trajectory (open3d third-person view
    equivalent, viz.py:86-276)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ax is None:
        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(projection="3d")
    for seg in segments:
        pts = getattr(seg, "points", None)
        if pts is None:
            c = np.asarray(seg.center).reshape(1, 3)
            pts = c
        if len(pts) > max_points_per_seg:
            pts = pts[:: len(pts) // max_points_per_seg]
        col = np.array(_seg_color(seg.id)) / 255.0 if color_by_id else None
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=2, color=col)
    if trajectory is not None:
        tr = np.asarray(trajectory)
        ax.plot(tr[:, 0, 3], tr[:, 1, 3], tr[:, 2, 3], color="black", linewidth=1)
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    ax.set_zlabel("z (m)")
    return ax


def plot_registration_3d(submap1, submap2, associations: np.ndarray, ax=None,
                         z_lift: float = 5.0):
    """Two submaps + association lines (align_viz.py equivalent)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ax is None:
        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(projection="3d")
    c1 = np.stack([np.asarray(s.center).reshape(3) for s in submap1.segments])
    c2 = np.stack([np.asarray(s.center).reshape(3) for s in submap2.segments])
    ax.scatter(c1[:, 0], c1[:, 1], c1[:, 2], color="maroon", s=12, label="submap 1")
    ax.scatter(c2[:, 0], c2[:, 1], c2[:, 2] + z_lift, color="blue", s=12,
               label="submap 2 (+z)")
    for a, b in np.asarray(associations).reshape(-1, 2):
        ax.plot([c1[a, 0], c2[b, 0]], [c1[a, 1], c2[b, 1]],
                [c1[a, 2], c2[b, 2] + z_lift], color="lawngreen", linewidth=0.8)
    ax.legend()
    return ax


def plot_correspondences(map1, map2, correspondences: np.ndarray, ax=None):
    """2D correspondence plot (reference roman/utils.py:21-48)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    c1 = np.stack([np.asarray(o.center).reshape(3) for o in map1])
    c2 = np.stack([np.asarray(o.center).reshape(3) for o in map2])
    ax.scatter(c1[:, 0], c1[:, 1], color="maroon", s=10)
    ax.scatter(c2[:, 0], c2[:, 1], color="blue", s=10)
    for a, b in np.asarray(correspondences).reshape(-1, 2):
        ax.plot([c1[a, 0], c2[b, 0]], [c1[a, 1], c2[b, 1]],
                color="lawngreen", linestyle="dotted")
    ax.set_aspect("equal")
    return ax
