"""Test env: force CPU backend with 8 virtual devices so the whole
suite (including multi-chip sharding tests) runs without TPU hardware.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# The shell env pins JAX_PLATFORMS=axon (the real TPU tunnel); tests
# must override it, not setdefault — CI and the sharding tests need the
# virtual 8-device CPU backend. jax may already be imported by the time
# this conftest runs (a site hook imports it), and jax captures
# JAX_PLATFORMS into its config at import time — so set the config
# directly too. Backends are created lazily, so this is still in time.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def random_mosaic(rng):
    """A small random 12-bit mosaic."""
    return rng.integers(0, 4096, size=(64, 96), dtype=np.uint16)


@pytest.fixture
def mosaic_24mp_shape():
    # Nikon D3300 full-res (reference: main.rs:1752-1754 "6016x4016").
    return (4016, 6016)
