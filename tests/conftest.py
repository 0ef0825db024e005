"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised quickly and without TPU hardware.

Note: this environment pre-imports jax with a TPU backend registered via
sitecustomize; the backend is only *initialized* on first use, so
redirecting to CPU via jax.config here (before any jax op runs) works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
