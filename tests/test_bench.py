"""bench.py structural contract: ONE JSON line, always.

The driver records bench.py's stdout as the round's BENCH artifact, so
the budgeted runner must emit a complete line on the happy path and a
partial line (with an explicit error) when the device stalls — both
verified here on the CPU backend with the small-shape knob.
"""

import json
import os
import subprocess
import sys


def _run_bench(extra_env, timeout):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra_env)
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "import bench; bench.main()")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, lines
    return json.loads(lines[0])


def test_bench_happy_path_small():
    doc = _run_bench({"RAWEDITOR_TPU_BENCH_SMALL": "1",
                      "RAWEDITOR_TPU_BENCH_BUDGET_S": "400"},
                     timeout=420)
    assert doc["metric"] == "develops_per_sec_24mp"
    assert doc["value"] > 0
    assert "error" not in doc
    for field in ("xla_develops_per_sec", "accurate_develops_per_sec",
                  "preview_p50_ms", "e2e_develops_per_sec",
                  "e2e_link_mbps", "device",
                  # wedge-proof structure: host lanes + probe + small
                  # device lane land before any full-shape sync
                  "host_decode_nikon_mps", "host_jpeg420_encode_mps",
                  "tunnel_probe_ms", "small_develops_per_sec_2mp",
                  # roofline: cost-analysis-backed fields
                  "ops_per_pixel", "model_flops",
                  # steady-state interactive mode
                  "session_pipelined_p50_ms"):
        assert field in doc, field
    # The headline was measured at the full shape, not extrapolated.
    assert doc["value_source"] == "measured_24mp"
    assert doc["host_decode_nikon_mps"] > 0
    assert doc["ops_per_pixel"] > 10  # a real develop is >>10 ops/px


def test_bench_wedged_tunnel_still_emits_host_lanes():
    """The r3 failure mode: the device never responds. The record must
    still carry real host measurements + an explicit wedged marker."""
    doc = _run_bench({"RAWEDITOR_TPU_BENCH_SMALL": "1",
                      "RAWEDITOR_TPU_BENCH_FAKE_WEDGE": "1",
                      "RAWEDITOR_TPU_BENCH_BUDGET_S": "300"},
                     timeout=330)
    assert doc["tunnel_wedged"] is True
    measured = [k for k in doc
                if k.startswith("host_") and doc[k] > 0]
    assert len(measured) >= 4, doc


def test_bench_budget_prints_partials():
    doc = _run_bench({"RAWEDITOR_TPU_BENCH_SMALL": "1",
                      "RAWEDITOR_TPU_BENCH_BUDGET_S": "0.2"},
                     timeout=120)
    assert doc["metric"] == "develops_per_sec_24mp"
    assert "error" in doc  # partial run is explicitly labeled
