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

import subprocess

import numpy as np
import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _untracked_files():
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=all"],
            cwd=_REPO_ROOT, capture_output=True, text=True, timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    if out.returncode != 0:
        return None
    return {
        line[3:] for line in out.stdout.splitlines()
        if line.startswith("??")
    }


@pytest.fixture(scope="session", autouse=True)
def _repo_stays_clean():
    """The suite must not leave droppings in the working tree (a fuzz
    test once committed render outputs named ``--``/``-999``/... to the
    repo root — VERDICT r1 §weak-3). Snapshot untracked files before the
    run and assert no new ones after."""
    before = _untracked_files()
    yield
    if before is None:
        return
    after = _untracked_files()
    if after is None:
        return
    leaked = sorted(after - before)
    assert not leaked, (
        "test suite leaked files into the working tree: %s" % leaked
    )


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
