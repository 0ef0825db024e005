"""Native C++ runtime components (ctypes bindings).

Provides a fast g2o text parser and an O(n^3) Jonker-Volgenant linear
assignment solver, compiled on first use with g++ (the toolchain baked
into this image). All callers fall back to the pure-python/scipy
implementations when the toolchain or library is unavailable, so the
framework never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "g2o_parser.cpp"),
         os.path.join(_DIR, "clipper_ref.cpp")]
_LIB = os.path.join(_DIR, "libroman_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", *_SRCS, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src_mtime = max(os.path.getmtime(s) for s in _SRCS if os.path.exists(s))
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < src_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.g2o_parse.restype = ctypes.c_void_p
    lib.g2o_parse.argtypes = [ctypes.c_char_p]
    lib.g2o_num_vertices.restype = ctypes.c_int64
    lib.g2o_num_vertices.argtypes = [ctypes.c_void_p]
    lib.g2o_num_edges.restype = ctypes.c_int64
    lib.g2o_num_edges.argtypes = [ctypes.c_void_p]
    lib.g2o_get_vertices.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.g2o_get_edges.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 5
    lib.g2o_free.argtypes = [ctypes.c_void_p]
    lib.hungarian_solve.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p
    ]
    lib.clipper_ref_solve.restype = ctypes.c_int
    lib.clipper_ref_solve.argtypes = (
        [ctypes.c_void_p] * 3 + [ctypes.c_int]
        + [ctypes.c_void_p] * 3 + [ctypes.c_int] * 3
        + [ctypes.c_double] * 5 + [ctypes.c_void_p]
    )
    _lib = lib
    return _lib


def parse_g2o_native(path: str):
    """Returns (keys (V,), vert_xyzq (V,7), v1 (E,), v2 (E,), edge_xyzq
    (E,7), info_upper (E,21), lc_counts (E,)) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.g2o_parse(path.encode())
    if not h:
        return None
    try:
        V = lib.g2o_num_vertices(h)
        E = lib.g2o_num_edges(h)
        keys = np.empty(V, np.int64)
        vx = np.empty((V, 7), np.float64)
        lib.g2o_get_vertices(h, keys.ctypes.data, vx.ctypes.data)
        v1 = np.empty(E, np.int64)
        v2 = np.empty(E, np.int64)
        ex = np.empty((E, 7), np.float64)
        info = np.empty((E, 21), np.float64)
        lc = np.empty(E, np.int64)
        lib.g2o_get_edges(h, v1.ctypes.data, v2.ctypes.data, ex.ctypes.data,
                          info.ctypes.data, lc.ctypes.data)
        return keys, vx, v1, v2, ex, info, lc
    finally:
        lib.g2o_free(h)


def hungarian_native(cost: np.ndarray):
    """Minimizing assignment; returns col index per row (-1 unassigned) or
    None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, np.float64)
    n, m = cost.shape
    if n > m:
        # transpose-solve
        mt = hungarian_native(cost.T)
        if mt is None:
            return None
        match = np.full(n, -1, np.int32)
        for j, i in enumerate(mt):
            if i >= 0:
                match[i] = j
        return match
    match = np.full(n, -1, np.int32)
    lib.hungarian_solve(cost.ctypes.data, n, m, match.ctypes.data)
    return match


def clipper_ref_solve_native(c1, r1, d1, c2, r2, d2, sigma, epsilon, mindist,
                             cos_min, cos_max):
    """Serial per-pair C++ CLIPPER reference solve (the benchmark
    baseline; stands in for the reference's Eigen clipperpy hot loop,
    object_registration.py:22-29). Returns a list of (a, b) association
    index pairs, or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    c1 = np.ascontiguousarray(c1, np.float64)
    r1 = np.ascontiguousarray(r1, np.float64)
    d1 = np.ascontiguousarray(d1, np.float64)
    c2 = np.ascontiguousarray(c2, np.float64)
    r2 = np.ascontiguousarray(r2, np.float64)
    d2 = np.ascontiguousarray(d2, np.float64)
    n1, n2 = len(c1), len(c2)
    sel = np.empty((min(n1, n2), 2), np.int32)
    n = lib.clipper_ref_solve(
        c1.ctypes.data, r1.ctypes.data, d1.ctypes.data, n1,
        c2.ctypes.data, r2.ctypes.data, d2.ctypes.data, n2,
        r1.shape[1], d1.shape[1],
        float(sigma), float(epsilon), float(mindist),
        float(cos_min), float(cos_max),
        sel.ctypes.data)
    return [tuple(p) for p in sel[:n]]
