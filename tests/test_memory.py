"""glibc malloc hygiene helpers (utils/memory.py).

The 100-image 24 MP soak grew RSS ~35 MB/image through glibc arena
retention (docs/bench_r04_session1.json, flat with MALLOC_ARENA_MAX=1
in session4); the exporter fixes this in-process with an mallopt
arena cap + per-flush malloc_trim. These tests pin the helper
contracts on the glibc CI platform and the env-knob resolution.
"""

import ctypes
import sys

import pytest

from raweditor_tpu.utils import memory


IS_GLIBC = sys.platform.startswith("linux")


@pytest.mark.skipif(not IS_GLIBC, reason="glibc-specific")
def test_cap_malloc_arenas_applies():
    # mallopt returns nonzero on success; a 64-arena cap is far above
    # anything the test process uses, so applying it is side-effect
    # free while still exercising the real libc call.
    assert memory.cap_malloc_arenas(64) is True


def test_cap_zero_and_negative_are_noops():
    assert memory.cap_malloc_arenas(0) is False
    assert memory.cap_malloc_arenas(-3) is False


@pytest.mark.skipif(not IS_GLIBC, reason="glibc-specific")
def test_trim_malloc_runs():
    # Allocate-and-free enough to give trim something to return; the
    # assertion is only that the call completes and returns a bool
    # (whether pages were actually released depends on heap layout).
    blocks = [bytearray(1 << 20) for _ in range(64)]
    del blocks
    assert memory.trim_malloc() in (True, False)


def test_arena_cap_env_resolution(monkeypatch):
    monkeypatch.delenv("MALLOC_ARENA_MAX", raising=False)
    monkeypatch.delenv("RAWEDITOR_TPU_MALLOC_ARENA_CAP", raising=False)
    assert memory.arena_cap_from_env() == 2  # default on
    monkeypatch.setenv("RAWEDITOR_TPU_MALLOC_ARENA_CAP", "4")
    assert memory.arena_cap_from_env() == 4
    monkeypatch.setenv("RAWEDITOR_TPU_MALLOC_ARENA_CAP", "0")
    assert memory.arena_cap_from_env() == 0  # explicit disable
    monkeypatch.setenv("RAWEDITOR_TPU_MALLOC_ARENA_CAP", "junk")
    assert memory.arena_cap_from_env() == 2  # unparseable -> default
    # Operator already pinned it at process start: glibc applied the
    # env var before Python ran, so the in-process cap stands down.
    monkeypatch.setenv("MALLOC_ARENA_MAX", "1")
    monkeypatch.delenv("RAWEDITOR_TPU_MALLOC_ARENA_CAP", raising=False)
    assert memory.arena_cap_from_env() == 0


def test_libc_handle_cached():
    first = memory._get_libc()
    assert first is memory._get_libc()
    if IS_GLIBC:
        assert isinstance(first, ctypes.CDLL)
