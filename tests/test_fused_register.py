"""Fused pallas register kernel vs the XLA path (interpret mode).

The fused kernel (align/fused_register.py) reimplements
invariants.affinity + clipper.solve_2d + round_greedy +
refine_selection_2d inside one VMEM-resident program; these tests pin its
numerics to the XLA path on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roman_tpu.sim import world
from roman_tpu.align.invariants import SubmapFeatures
from roman_tpu.align.registration import RegistrationConfig, register_clipper


def _features(rng, P=3, cap=12, desc_dim=16):
    pads = [
        world.pad_problem(
            world.make_pair_problem(rng, n_common=6, n_only1=3, n_only2=3,
                                    desc_dim=desc_dim),
            cap,
        )
        for _ in range(P)
    ]
    s = {k: np.stack([d[k] for d in pads]) for k in pads[0]}
    ratio1 = np.concatenate([s["pca1"], s["volume1"][..., None]], axis=-1)
    ratio2 = np.concatenate([s["pca2"], s["volume2"][..., None]], axis=-1)
    f1 = SubmapFeatures(
        centers=jnp.asarray(s["centers1"], jnp.float32),
        ratio_feats=jnp.asarray(ratio1, jnp.float32),
        descriptors=jnp.asarray(s["desc1"], jnp.float32),
        valid=jnp.asarray(s["valid1"]),
    )
    f2 = SubmapFeatures(
        centers=jnp.asarray(s["centers2"], jnp.float32),
        ratio_feats=jnp.asarray(ratio2, jnp.float32),
        descriptors=jnp.asarray(s["desc2"], jnp.float32),
        valid=jnp.asarray(s["valid2"]),
    )
    return f1, f2


@pytest.mark.parametrize("pairs_per_step", [1, 2])
def test_fused_matches_xla(rng, pairs_per_step):
    f1, f2 = _features(rng)
    kw = dict(method="roman", cos_min=0.5, cos_max=0.9)
    rx = register_clipper(f1, f2, RegistrationConfig(**kw))
    rp = register_clipper(
        f1, f2,
        RegistrationConfig(**kw, use_pallas=True, pallas_interpret=True,
                           pallas_pairs_per_step=pairs_per_step),
    )
    assert np.array_equal(np.asarray(rx.sel), np.asarray(rp.sel))
    assert np.array_equal(np.asarray(rx.count), np.asarray(rp.count))
    np.testing.assert_allclose(np.asarray(rx.u), np.asarray(rp.u), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(rx.T_align), np.asarray(rp.T_align), atol=1e-3)


def test_fused_no_semantics(rng):
    """pcavolgrav: ratio features but no descriptors."""
    f1, f2 = _features(rng)
    f1 = f1.replace(descriptors=jnp.zeros(f1.centers.shape[:-1] + (0,)))
    f2 = f2.replace(descriptors=jnp.zeros(f2.centers.shape[:-1] + (0,)))
    kw = dict(method="pcavolgrav")
    rx = register_clipper(f1, f2, RegistrationConfig(**kw))
    rp = register_clipper(
        f1, f2, RegistrationConfig(**kw, use_pallas=True,
                                   pallas_interpret=True))
    assert np.array_equal(np.asarray(rx.sel), np.asarray(rp.sel))


def test_fused_assoc_mask(rng):
    """clipper+prune routes through register_clipper with an assoc_mask."""
    f1, f2 = _features(rng, P=2)
    mask = jnp.asarray(rng.uniform(size=(2, 12, 12)) > 0.2)
    kw = dict(method="gravity")
    rx = register_clipper(f1, f2, RegistrationConfig(**kw), assoc_mask=mask)
    rp = register_clipper(
        f1, f2,
        RegistrationConfig(**kw, use_pallas=True, pallas_interpret=True),
        assoc_mask=mask,
    )
    assert np.array_equal(np.asarray(rx.sel), np.asarray(rp.sel))
    assert np.array_equal(np.asarray(rx.count), np.asarray(rp.count))


def test_fused_unequal_capacities(rng):
    """n != m capacities exercise the asymmetric selector/flatten paths."""
    f1, f2 = _features(rng, P=2, cap=12)
    f2 = jax.tree.map(lambda x: x[:, :8] if x.ndim >= 2 else x, f2)
    kw = dict(method="roman", cos_min=0.5, cos_max=0.9)
    rx = register_clipper(f1, f2, RegistrationConfig(**kw))
    rp = register_clipper(
        f1, f2, RegistrationConfig(**kw, use_pallas=True,
                                   pallas_interpret=True))
    assert rp.sel.shape == (2, 12, 8)
    assert np.array_equal(np.asarray(rx.sel), np.asarray(rp.sel))
    assert np.array_equal(np.asarray(rx.count), np.asarray(rp.count))


def test_fused_blocked_build_matches_xla(rng, monkeypatch):
    """Force the blocked (B < N) affinity build at a small capacity and
    pin it to the XLA path. Block edges are exact row splits of the same
    broadcast arithmetic, so sel/count must be identical to the full
    build; this covers the capacity-48/64 kernel configuration without a
    slow interpret-mode solve at N=2304."""
    import roman_tpu.align.fused_register as fr

    monkeypatch.setattr(fr, "_build_block_rows", lambda N: 64)
    f1, f2 = _features(rng, cap=16)  # N=256 -> 4 blocks of 64
    kw = dict(method="roman", cos_min=0.5, cos_max=0.9)
    rx = register_clipper(f1, f2, RegistrationConfig(**kw))
    rp = register_clipper(
        f1, f2,
        RegistrationConfig(**kw, use_pallas=True, pallas_interpret=True,
                           pallas_pairs_per_step=2),
    )
    assert np.array_equal(np.asarray(rx.sel), np.asarray(rp.sel))
    assert np.array_equal(np.asarray(rx.count), np.asarray(rp.count))
    np.testing.assert_allclose(np.asarray(rx.u), np.asarray(rp.u), atol=2e-3)


def test_build_block_rows_model():
    """Block-size + VMEM-model invariants for the capacities we ship."""
    from roman_tpu.align.fused_register import (_build_block_rows,
                                                max_pairs_per_step)

    assert _build_block_rows(1600) == 1600          # capacity 40: full build
    for cap in (48, 56, 64, 80):
        N = cap * cap
        B = _build_block_rows(N)
        assert N % B == 0 and B % 16 == 0
    assert max_pairs_per_step(1600) >= 4            # flagship keeps K=4
    assert max_pairs_per_step(48 * 48) >= 2         # capacity 48 stays fused
    assert max_pairs_per_step(64 * 64) >= 1         # capacity 64 stays fused


def test_fused_all_invalid(rng):
    """Fully-padded (invalid) pairs must yield zero associations, not NaNs."""
    f1, f2 = _features(rng, P=2)
    f1 = f1.replace(valid=jnp.zeros_like(f1.valid))
    cfg = RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9,
                             use_pallas=True, pallas_interpret=True)
    rp = register_clipper(f1, f2, cfg)
    assert (np.asarray(rp.count) == 0).all()
    assert not np.asarray(rp.ok).any()
    assert np.isfinite(np.asarray(rp.u)).all()
