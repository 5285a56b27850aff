"""Multi-host export: REAL multi-process execution on this machine.

The reference has no distributed layer (SURVEY.md §2); the rebuild's
multi-host design (parallel/distributed.py) is: coordination-service
init, round-robin job partition, per-host local-device meshes, no
cross-host collectives. These tests run it for real: two OS processes
with a localhost JAX coordinator and 4 virtual CPU devices each, then
assert the union of their outputs is byte-identical to a
single-process export of the same job list.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from raweditor_tpu.parallel.distributed import partition_jobs
from raweditor_tpu.raw.synth import write_synthetic_raw

N_IMAGES = 6


def test_partition_jobs_round_robin():
    jobs = list(range(10))
    parts = [partition_jobs(jobs, i, 3) for i in range(3)]
    assert parts == [[0, 3, 6, 9], [1, 4, 7], [2, 5, 8]]
    assert sorted(sum(parts, [])) == jobs
    with pytest.raises(ValueError):
        partition_jobs(jobs, 3, 3)
    with pytest.raises(ValueError):
        partition_jobs(jobs, -1, 3)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _subproc_env() -> dict:
    env = dict(os.environ)
    env["RAWEDITOR_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # The in-process test backend config must not leak; subprocesses
    # configure themselves from the env above.
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _export_cmd(files, out_dir, extra):
    return [sys.executable, "-m", "raweditor_tpu", "export",
            "-o", str(out_dir), "--batch-size", "4",
            "--decode-threads", "1", "--files", *map(str, files),
            ] + extra


@pytest.fixture(scope="module")
def photo_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("dist_photos")
    rng = np.random.default_rng(11)
    files = []
    for i in range(N_IMAGES):
        p = d / f"img{i}.nef"
        write_synthetic_raw(
            p, rng.integers(0, 4096, size=(24, 32), dtype=np.uint16),
            compression="nikon")
        files.append(p)
    return files


def test_two_process_export_matches_single(photo_files, tmp_path):
    out_single = tmp_path / "single"
    out_multi = tmp_path / "multi"
    env = _subproc_env()

    r = subprocess.run(
        _export_cmd(photo_files, out_single, []),
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    single = json.loads(r.stdout.splitlines()[-1])
    assert single["succeeded"] == N_IMAGES

    for attempt in (1, 2):  # _free_port has an inherent reuse race
        port = _free_port()
        procs = [
            subprocess.Popen(
                _export_cmd(photo_files, out_multi, [
                    "--num-hosts", "2", "--host-id", str(hid),
                    "--coordinator", f"127.0.0.1:{port}"]),
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True)
            for hid in (0, 1)
        ]
        try:
            outs = [p.communicate(timeout=300) for p in procs]
        finally:
            # A hung peer must not outlive the test (it would pin the
            # coordinator port and the pytest tmpdir for the session).
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait()
        if all(p.returncode == 0 for p in procs) or attempt == 2:
            break
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]

    reports = [json.loads(out.splitlines()[-1]) for out, _ in outs]
    assert sorted(r["host_id"] for r in reports) == [0, 1]
    assert sum(r["succeeded"] for r in reports) == N_IMAGES
    # Round-robin: host 0 gets ceil(N/2) of the deal.
    assert {r["succeeded"] for r in reports} == {N_IMAGES // 2,
                                                 (N_IMAGES + 1) // 2}

    single_files = sorted(os.listdir(out_single))
    multi_files = sorted(os.listdir(out_multi))
    assert multi_files == single_files == sorted(
        f"img{i}.jpg" for i in range(N_IMAGES))
    for name in single_files:
        a = (out_single / name).read_bytes()
        b = (out_multi / name).read_bytes()
        assert a == b, f"{name}: multi-host output differs"


def test_init_guard_covers_local_device_ids(monkeypatch):
    """Re-calling init_distributed with the same coordinator/process
    topology but different local_device_ids must raise, not silently
    keep the old device binding (regression: the idempotency key
    omitted local_device_ids)."""
    import pytest

    from raweditor_tpu.parallel import distributed as D

    monkeypatch.setattr(D, "_initialized", ("h:1", 1, 0, None))
    with pytest.raises(RuntimeError, match="already initialized"):
        D.init_distributed("h:1", 1, 0, local_device_ids=[0, 1])
    # Same full topology (device ids included) stays a no-op.
    idx, count = D.init_distributed("h:1", 1, 0)
    assert (idx, count) == (0, 1)
