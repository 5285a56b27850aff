"""Decode-pool thread scaling (VERDICT r4 weak-2 / next #4).

The batch exporter's ≥50 img/s arithmetic assumes the GIL-released C++
decoders scale near-linearly across its thread pool ("16 threads ×
77 MP/s ≈ 51 img/s", docs/performance.md) — but every e2e record so
far ran on a 1-vCPU box. This test MEASURES the aggregate throughput
curve wherever cores exist: ≥2.5× aggregate at 4 threads is the bar
linear-enough scaling must clear (2.5 of 4 leaves headroom for
turbo-clock droop and allocator contention). On hosts with <4 cores
it skips — the measurement would be contention, not scaling.
"""

import os

import numpy as np
import pytest


def _nikon_blob(mp=2.0):
    from raweditor_tpu.raw.synth import write_synthetic_raw

    rng = np.random.default_rng(0)
    h = int((mp * 1e6 * 3 / 4) ** 0.5)
    w = int(h * 4 / 3)
    mosaic = rng.integers(0, 4096, size=(h - h % 4, w - w % 16),
                          dtype=np.uint16)
    return write_synthetic_raw(None, mosaic, compression="nikon")


@pytest.mark.skipif((os.cpu_count() or 1) < 4,
                    reason="needs >=4 cores to measure scaling")
def test_decode_pool_scales_at_4_threads():
    from tools.codec_bench import decode_pool_mps

    blob = _nikon_blob()
    single = decode_pool_mps(blob, 1, per_thread=4, repeats=3)
    agg4 = decode_pool_mps(blob, 4, per_thread=4, repeats=3)
    assert agg4 >= 2.5 * single, (
        f"4-thread aggregate {agg4:.1f} MP/s is only "
        f"{agg4 / single:.2f}x the 1-thread {single:.1f} MP/s — "
        "decode-pool contention (shared LUTs/allocator?)")


def test_decode_pool_helper_runs_single_thread():
    """The helper itself must work on any host (1 thread, tiny blob)
    so the sweep tooling stays correct even where the scaling assert
    skips."""
    from tools.codec_bench import decode_pool_mps

    blob = _nikon_blob(mp=0.2)
    mps = decode_pool_mps(blob, 1, per_thread=2, repeats=1)
    assert mps > 0
