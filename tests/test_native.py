import numpy as np
import pytest

from roman_tpu import native


def test_native_builds():
    assert native.get_lib() is not None, "g++ build of native lib failed"


def test_native_g2o_parse_matches_python(tmp_path):
    from roman_tpu.rpgo import g2o_io
    from roman_tpu.rpgo.g2o_io import G2OEdge, G2OGraph, symbol

    rng = np.random.default_rng(0)
    vertices = {symbol("a", i): rng.normal(size=7) for i in range(5)}
    edges = [
        G2OEdge(symbol("a", i), symbol("a", i + 1), rng.normal(size=7),
                rng.normal(size=21), lc_count=(7 if i == 2 else None))
        for i in range(4)
    ]
    graph = G2OGraph(vertices=vertices, edges=edges)
    path = str(tmp_path / "x.g2o")
    g2o_io.write_g2o(graph, path)

    out = native.parse_g2o_native(path)
    assert out is not None
    keys, vx, v1, v2, ex, info, lc = out
    ref = g2o_io.parse_g2o(path)
    assert set(keys.tolist()) == set(ref.vertices.keys())
    assert len(v1) == len(ref.edges)
    k = {key: i for i, key in enumerate(keys.tolist())}
    for i, e in enumerate(ref.edges):
        assert v1[i] == e.v1 and v2[i] == e.v2
        np.testing.assert_allclose(ex[i], e.xyz_quat)
        np.testing.assert_allclose(info[i], e.info_upper)
        assert lc[i] == (e.lc_count if e.lc_count is not None else -1)


def test_native_hungarian_matches_scipy(rng):
    from scipy.optimize import linear_sum_assignment

    for trial in range(10):
        n, m = rng.integers(2, 12, 2)
        cost = rng.uniform(size=(n, m))
        match = native.hungarian_native(cost)
        if match is None:
            pytest.skip("native lib unavailable")
        rows, cols = linear_sum_assignment(cost)
        ref_total = cost[rows, cols].sum()
        got_total = sum(cost[i, match[i]] for i in range(n) if match[i] >= 0)
        assert abs(got_total - ref_total) < 1e-9


def test_clipper_ref_native_matches_numpy():
    """The C++ baseline solver (native/clipper_ref.cpp) must agree with
    the numpy reference-equivalent in bench.py — same affinity math,
    iteration budget, and rounding."""
    import numpy as np
    import pytest

    from roman_tpu import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")

    import bench
    from roman_tpu.align.registration import RegistrationConfig

    cfg = RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9)
    rng = np.random.default_rng(3)
    for seed in range(3):
        r = np.random.default_rng(seed)
        n_common, n1x, n2x = 8, 4, 6
        c1 = r.uniform(0, 25, (n_common + n1x, 3))
        c2 = np.vstack([c1[:n_common] + r.normal(0, 0.15, (n_common, 3)),
                        r.uniform(0, 25, (n2x, 3))])
        r1 = r.uniform(0.5, 3.0, (len(c1), 4))
        r2 = np.vstack([r1[:n_common] * r.uniform(0.9, 1.1, (n_common, 4)),
                        r.uniform(0.5, 3.0, (n2x, 4))])
        d1 = r.normal(size=(len(c1), 16))
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        d2 = np.vstack([d1[:n_common], r.normal(size=(n2x, 16))])
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)

        sel_np, T_np = bench._np_solve_pair(c1, r1, d1, c2, r2, d2, cfg)
        out = bench._native_solve_pair(c1, r1, d1, c2, r2, d2, cfg)
        assert out is not None
        sel_cpp, T_cpp = out
        assert set(sel_np) == set(sel_cpp), (seed, sel_np, sel_cpp)
        if T_np is not None:
            np.testing.assert_allclose(T_cpp, T_np, atol=1e-8)
