"""Test configuration.

Forces JAX onto the CPU backend with 8 virtual devices so the multi-device
sharding paths (mesh + halo exchange) are exercised without TPU hardware —
the TPU analog of the reference's threads × block-size partitioning-invariance
sweep (``tests/test_search_engine.cpp:62-69``).
"""

import os

# Must run before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag is
# honored. Must happen before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
