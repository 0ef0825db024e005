"""Trajectory plotting from g2o files (reference
roman/offline_rpgo/plot_g2o.py:50-136 equivalent, matplotlib-only)."""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from roman_tpu.rpgo.g2o_io import parse_g2o, symbol_chr, symbol_index

DEFAULT_TRAJECTORY_COLORS = {
    chr(ord("a") + i): c
    for i, c in enumerate(
        ["tab:blue", "tab:orange", "tab:green", "tab:red", "tab:purple",
         "tab:brown", "tab:pink", "tab:gray", "tab:olive", "tab:cyan"]
    )
}


@dataclasses.dataclass
class G2OPlotParams:
    axes: Tuple[int, int] = (0, 1)  # which position components to plot
    legend: bool = True
    linewidth: float = 1.0


def plot_g2o(
    g2o_path: str,
    g2o_symbol_to_name: Optional[Dict[str, str]] = None,
    g2o_symbol_to_color: Optional[Dict[str, str]] = None,
    ax=None,
    params: G2OPlotParams = G2OPlotParams(),
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    graph = parse_g2o(g2o_path)
    by_robot: Dict[str, list] = {}
    for key, xq in graph.vertices.items():
        by_robot.setdefault(symbol_chr(key), []).append((symbol_index(key), xq[:3]))
    a0, a1 = params.axes
    for robot, entries in sorted(by_robot.items()):
        entries.sort(key=lambda e: e[0])
        pos = np.stack([p for _, p in entries])
        label = (g2o_symbol_to_name or {}).get(robot, robot)
        color = (g2o_symbol_to_color or DEFAULT_TRAJECTORY_COLORS).get(robot)
        ax.plot(pos[:, a0], pos[:, a1], label=label, color=color,
                linewidth=params.linewidth)
    if params.legend:
        ax.legend()
    ax.set_aspect("equal")
    return ax


def rm_robots_g2o(g2o_lines, keep_letters):
    """Remove robots from a fused g2o (reference rm_robots_g2o.py)."""
    out = []
    for raw in g2o_lines:
        tok = raw.split()
        if not tok:
            continue
        if tok[0] == "VERTEX_SE3:QUAT":
            if symbol_chr(int(tok[1])) in keep_letters:
                out.append(raw)
        elif tok[0] == "EDGE_SE3:QUAT":
            if symbol_chr(int(tok[1])) in keep_letters and symbol_chr(int(tok[2])) in keep_letters:
                out.append(raw)
        else:
            out.append(raw)
    return out
