"""Test harness setup: force an 8-virtual-device CPU mesh (the standard JAX
stand-in for multi-chip without hardware — SURVEY §4) and enable x64 so the
float64 golden comparisons are exact.

NOTE: this image's sitecustomize registers the axon TPU backend at
interpreter start and pins JAX_PLATFORMS=axon, so the env var alone is not
enough — ``jax.config.update('jax_platforms', 'cpu')`` after import is what
actually forces CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(scope="session", autouse=True)
def _check_cpu():
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
