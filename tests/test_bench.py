"""bench.py structural contract: ONE compact JSON line, always.

The driver records bench.py's stdout TAIL (2,000 chars) as the round's
BENCH artifact, so the budgeted runner must emit one complete compact
line on the happy path and a partial line (with an explicit error) when
the device stalls — and the line must stay under the tail capture no
matter how many lanes populate (BENCH_r04 was parsed:null because the
full record outgrew it). The complete record goes to a file.
"""

import json
import os
import subprocess
import sys


def _run_bench(extra_env, timeout, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    full_path = str(tmp_path / "bench_full.json")
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["RAWEDITOR_TPU_BENCH_FULL_PATH"] = full_path
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
    # The driver's capture is the stdout TAIL: the one line must fit.
    assert len(lines[0]) <= 2000, len(lines[0])
    compact = json.loads(lines[0])
    full = {}
    if os.path.exists(full_path):
        with open(full_path) as f:
            full = json.load(f)
    return compact, full


def test_bench_happy_path_small(tmp_path):
    compact, doc = _run_bench({"RAWEDITOR_TPU_BENCH_SMALL": "1",
                               "RAWEDITOR_TPU_BENCH_BUDGET_S": "400"},
                              timeout=420, tmp_path=tmp_path)
    # Driver contract fields live on the compact line itself.
    assert compact["metric"] == "develops_per_sec_24mp"
    assert compact["value"] > 0
    assert compact["vs_baseline"] > 0
    assert compact["value_source"] == "measured_24mp"
    assert "error" not in compact
    assert compact["full_record"]  # pointer to the complete record
    # The full record carries every lane.
    assert doc["metric"] == "develops_per_sec_24mp"
    assert doc["value"] == compact["value"]
    for field in ("xla_develops_per_sec", "accurate_develops_per_sec",
                  "preview_p50_ms", "e2e_develops_per_sec",
                  "e2e_link_mbps", "device",
                  # wedge-proof structure: host lanes + probe + small
                  # device lane land before any full-shape sync
                  "host_decode_nikon_mps", "host_jpeg420_encode_mps",
                  "tunnel_probe_ms", "small_develops_per_sec_2mp",
                  # roofline: cost-analysis-backed fields
                  "ops_per_pixel", "model_flops",
                  # session lanes: default (pipelined) + true-sync
                  "session_p50_ms", "session_sync_p50_ms",
                  "session_pipelined_p50_ms",
                  # per-lane repeat/variance fields (VERDICT r4 #8) —
                  # asserted on the XLA lanes (the Pallas single-image
                  # kernels don't run on the CPU backend)
                  "xla_develops_per_sec_min", "xla_develops_per_sec_n",
                  "xla_accurate_develops_per_sec_min"):
        assert field in doc, field
    assert doc["host_decode_nikon_mps"] > 0
    assert doc["ops_per_pixel"] > 10  # a real develop is >>10 ops/px
    assert doc["xla_develops_per_sec_n"] >= 3  # ≥3 repeat windows
    assert doc["xla_develops_per_sec_min"] <= doc["xla_develops_per_sec"]
    assert doc["wall_seconds"] > 0


def test_bench_wedged_tunnel_still_emits_host_lanes(tmp_path):
    """The r3 failure mode: the device never responds. The record must
    still carry real host measurements + an explicit wedged marker."""
    compact, doc = _run_bench({"RAWEDITOR_TPU_BENCH_SMALL": "1",
                               "RAWEDITOR_TPU_BENCH_FAKE_WEDGE": "1",
                               "RAWEDITOR_TPU_BENCH_BUDGET_S": "300"},
                              timeout=330, tmp_path=tmp_path)
    assert compact["tunnel_wedged"] is True
    assert doc["tunnel_wedged"] is True
    measured = [k for k in doc
                if k.startswith("host_") and doc[k] > 0]
    assert len(measured) >= 4, doc


def test_bench_budget_prints_partials(tmp_path):
    compact, doc = _run_bench({"RAWEDITOR_TPU_BENCH_SMALL": "1",
                               "RAWEDITOR_TPU_BENCH_BUDGET_S": "0.2"},
                              timeout=120, tmp_path=tmp_path)
    assert compact["metric"] == "develops_per_sec_24mp"
    assert "error" in compact  # partial run is explicitly labeled


def test_compact_headline_fits_tail_capture_fully_populated():
    """The compact line must stay under the driver's 2,000-char tail
    capture even when EVERY field is populated with worst-case-width
    values (the exact failure that made BENCH_r04 parsed:null)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    record = {k: 123456.789012 for k in bench.COMPACT_KEYS}
    record.update(
        metric="develops_per_sec_24mp", unit="images/sec/chip",
        value_source="measured_24mp",
        device="TPU v5 lite0 (process=0,(0,0,0,0))",
        e2e_error="x" * 300, error="y" * 300,
        tunnel_wedged=True, small_lane_wedged=True,
        full_shape_wedged=True,
    )
    # Plus hundreds of extra full-record-only fields that must NOT
    # leak onto the line.
    for i in range(300):
        record[f"extra_lane_{i}_develops_per_sec"] = 999999.123456
    line = bench.compact_headline(
        record, "/root/repo/docs/bench_latest_full.json")
    assert len(line) <= bench.COMPACT_MAX_CHARS
    doc = json.loads(line)
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in doc
    assert "extra_lane_0_develops_per_sec" not in doc
    # Failure markers survive truncation — a truncated record must
    # never read as a clean run.
    assert doc["tunnel_wedged"] is True
    assert "error" in doc


def test_compact_headline_never_drops_driver_contract():
    """Even with absurdly long values the four driver fields survive
    the defensive truncation."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    record = {k: "z" * 500 for k in bench.COMPACT_KEYS}
    record.update(metric="develops_per_sec_24mp", value=1.0,
                  unit="images/sec/chip", vs_baseline=0.02)
    line = bench.compact_headline(record, None)
    doc = json.loads(line)
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in doc
