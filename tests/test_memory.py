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
    # Operator pinned it STRICTLY at process start: glibc applied the
    # env var before Python ran, so the in-process cap stands down.
    monkeypatch.setenv("MALLOC_ARENA_MAX", "1")
    monkeypatch.delenv("RAWEDITOR_TPU_MALLOC_ARENA_CAP", raising=False)
    assert memory.arena_cap_from_env() == 0
    # A WEAK pre-set value (container base image shipping 8 for some
    # other workload) must NOT stand down the mitigation
    # (code-review r4).
    monkeypatch.setenv("MALLOC_ARENA_MAX", "8")
    assert memory.arena_cap_from_env() == 2
    monkeypatch.setenv("MALLOC_ARENA_MAX", "junk")
    assert memory.arena_cap_from_env() == 2
    # Explicit knob still wins over any launch value.
    monkeypatch.setenv("RAWEDITOR_TPU_MALLOC_ARENA_CAP", "0")
    assert memory.arena_cap_from_env() == 0


def test_can_cap_matches_mallopt_presence():
    # On the glibc CI platform the capability is real; the check must
    # be mallopt presence, not merely a loaded libc handle
    # (code-review r4: CDLL(None) loads on macOS/musl too).
    if IS_GLIBC:
        assert memory.can_cap() is True
    else:
        assert memory.can_cap() in (True, False)


def test_libc_handle_cached():
    first = memory._get_libc()
    assert first is memory._get_libc()
    if IS_GLIBC:
        assert isinstance(first, ctypes.CDLL)


def test_exporter_invokes_memory_hooks(tmp_path, monkeypatch):
    """run_batch_export must cap arenas before its pools exist and trim
    after each flush; pin the wiring (the soak regression this guards
    is only observable over GBs of decode volume)."""
    import numpy as np

    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export
    from raweditor_tpu.raw.synth import write_synthetic_raw

    calls = {"cap": [], "trim": 0}
    monkeypatch.setattr(memory, "cap_malloc_arenas",
                        lambda n: calls["cap"].append(n) or True)

    real_trim = memory.trim_malloc

    def counting_trim():
        calls["trim"] += 1
        return real_trim()

    monkeypatch.setattr(memory, "trim_malloc", counting_trim)
    rng = np.random.default_rng(7)
    jobs = []
    for i in range(3):
        p = tmp_path / f"m{i}.nef"
        write_synthetic_raw(p, rng.integers(0, 4095, (40, 64),
                                            dtype=np.uint16))
        jobs.append(ExportJob(raw_path=str(p),
                              out_path=str(tmp_path / f"m{i}.jpg"),
                              params=EditParams()))
    rep = run_batch_export(jobs, batch_size=2, decode_threads=1,
                           encode_threads=1)
    assert rep.succeeded == 3 and not rep.failed
    assert calls["cap"] == [2]      # default cap, applied once
    assert calls["trim"] >= 2       # one per flush (2 batches here)
    # Explicit disable: neither hook fires.
    calls = {"cap": [], "trim": 0}
    monkeypatch.setattr(memory, "cap_malloc_arenas",
                        lambda n: calls["cap"].append(n) or True)
    monkeypatch.setattr(memory, "trim_malloc", counting_trim)
    monkeypatch.setenv("RAWEDITOR_TPU_MALLOC_ARENA_CAP", "0")
    rep = run_batch_export(jobs[:1], batch_size=1, decode_threads=1,
                           encode_threads=1)
    assert rep.succeeded == 1
    assert calls["cap"] == []


# -- opt-in arena respawn (VERDICT r4 item 7) ----------------------------

def test_respawn_noops(monkeypatch):
    """Every non-respawn path returns False without exec'ing (an exec
    here would replace the pytest process)."""
    monkeypatch.delenv("RAWEDITOR_TPU_ARENA_RESPAWN", raising=False)
    monkeypatch.delenv(memory._RESPAWN_MARKER, raising=False)
    # disabled (no flag, no env)
    assert memory.maybe_respawn_for_arena_cap() is False
    # already the respawned child
    monkeypatch.setenv(memory._RESPAWN_MARKER, "1")
    assert memory.maybe_respawn_for_arena_cap(enabled=True) is False
    monkeypatch.delenv(memory._RESPAWN_MARKER)
    # operator already launched at least as strict
    monkeypatch.setenv("MALLOC_ARENA_MAX", "1")
    assert memory.maybe_respawn_for_arena_cap(enabled=True) is False


@pytest.mark.skipif(not IS_GLIBC, reason="glibc-only behavior")
def test_respawn_reexecs_with_arena_env(tmp_path):
    """RAWEDITOR_TPU_ARENA_RESPAWN=1 re-execs once with
    MALLOC_ARENA_MAX=1 + the loop-guard marker (subprocess: exec
    replaces the process image)."""
    import json
    import os
    import subprocess

    script = tmp_path / "probe.py"
    script.write_text(
        "import json, os, sys\n"
        "sys.path.insert(0, %r)\n"
        "from raweditor_tpu.utils.memory import "
        "maybe_respawn_for_arena_cap\n"
        "maybe_respawn_for_arena_cap()\n"
        "print(json.dumps({'arena': os.environ.get('MALLOC_ARENA_MAX'),"
        " 'marker': os.environ.get('RAWEDITOR_TPU_ARENA_RESPAWNED'),"
        " 'argv': sys.argv[1:]}))\n"
        % os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env.pop("MALLOC_ARENA_MAX", None)
    env.pop("RAWEDITOR_TPU_ARENA_RESPAWNED", None)
    env["RAWEDITOR_TPU_ARENA_RESPAWN"] = "1"
    out = subprocess.run(
        [sys.executable, str(script), "--some", "arg"],
        capture_output=True, text=True, timeout=60, env=env)
    assert out.returncode == 0, out.stderr
    doc = json.loads(out.stdout.strip().splitlines()[-1])
    assert doc["arena"] == "1"        # child sees the strict launch env
    assert doc["marker"] == "1"       # loop guard set
    assert doc["argv"] == ["--some", "arg"]  # argv preserved exactly
