"""Utility helpers: env expansion, recursive dict merge, AABB tests.

Parity with reference roman/utils.py:132-169 (the SE(3)/plot helpers live
in roman_tpu.ops.se3 / roman_tpu.viz instead).
"""

from __future__ import annotations

import functools
from os.path import expanduser, expandvars

import numpy as np


def f32_matmuls(fn):
    """Trace `fn` under float32 matmul precision.

    TPU matmuls/einsums default to bf16 MXU rounding; the geometric
    cores this decorates (Arun/Umeyama rotation composition, pose-graph
    GN/PCG 6x6 block einsums) are tiny, so f32 costs nothing there but
    removes centimeter-scale drift in solved transforms (measured on the
    on-chip demo: identical LC sets to the CPU run, but bf16 transforms
    moved ATE 0.99 -> 1.22 m before this guard). Works under jit — the
    context applies at trace time.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        import jax

        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def expandvars_recursive(path: str) -> str:
    """Recursively expand environment variables (utils.py:132-138)."""
    while True:
        expanded = expandvars(path)
        if expanded == path:
            return expanduser(expanded)
        path = expanded


def combinedicts_recursive(d1: dict, d2: dict) -> dict:
    """Merge d2 over d1, recursing into dict values (utils.py:140-158)."""
    res = {}
    for k, v in d2.items():
        if isinstance(v, dict) and isinstance(d1.get(k), dict):
            res[k] = combinedicts_recursive(d1[k], v)
        else:
            res[k] = v
    for k, v in d1.items():
        if k not in d2:
            res[k] = v
    return res


def aabb_intersects(p1: np.ndarray, p2: np.ndarray) -> bool:
    """Axis-aligned bounding boxes of two point sets intersect
    (utils.py:160-169)."""
    p1_min, p1_max = np.min(p1, axis=0), np.max(p1, axis=0)
    p2_min, p2_max = np.min(p2, axis=0), np.max(p2, axis=0)
    return bool(np.all(p1_min <= p2_max) and np.all(p1_max >= p2_min))
