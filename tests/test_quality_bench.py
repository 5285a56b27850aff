"""Quality-tier scoreboard (tools/quality_bench.py + docs/quality.md).

One module-scoped run of the tool backs all assertions: the committed
doc must match regeneration byte-for-byte (the perf-doc discipline
applied to quality claims), and the tier orderings the docs cite must
hold on the discriminating scenes.
"""

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools"))

import quality_bench  # noqa: E402


@pytest.fixture(scope="module")
def results():
    ladder = quality_bench.run_ladder(256)
    extras = quality_bench.run_extras(256)
    return ladder, extras


def _psnr(ladder, scene, cfa, method):
    for r in ladder:
        if (r["scene"], r["cfa"], r["method"]) == (scene, cfa, method):
            return r["psnr_db"]
    raise KeyError((scene, cfa, method))


def test_doc_is_current(results):
    ladder, extras = results
    want = quality_bench.render_doc(ladder, extras, 256)
    with open(os.path.join(_REPO, "docs", "quality.md")) as f:
        got = f.read()
    assert got == want, (
        "docs/quality.md is stale; regenerate via "
        "`python tools/quality_bench.py --write-doc`")


def test_zoneplate_tier_ordering(results):
    """The aliasing stressor is where tier quality is at stake: each
    step up the ladder must buy real dB, reproducing the docs' +4 dB
    grad-over-malvar (Bayer) and grad-over-smooth (X-Trans) claims."""
    ladder, _ = results
    near = _psnr(ladder, "zoneplate", "bayer", "nearest")
    bil = _psnr(ladder, "zoneplate", "bayer", "bilinear")
    mal = _psnr(ladder, "zoneplate", "bayer", "malvar")
    grad = _psnr(ladder, "zoneplate", "bayer", "grad")
    assert near < bil < mal < grad
    assert grad - mal >= 3.0  # the cited ~+4 dB
    xn = _psnr(ladder, "zoneplate", "xtrans", "nearest")
    xs = _psnr(ladder, "zoneplate", "xtrans", "smooth")
    xg = _psnr(ladder, "zoneplate", "xtrans", "grad")
    assert xn < xs < xg
    assert xg - xs >= 5.0  # the cited ~+6-9 dB


def test_delta_e_tracks_psnr_on_zoneplate(results):
    ladder, _ = results
    by = {r["method"]: r for r in ladder
          if r["scene"] == "zoneplate" and r["cfa"] == "bayer"}
    assert (by["grad"]["delta_e_mean"] < by["malvar"]["delta_e_mean"]
            < by["bilinear"]["delta_e_mean"]
            < by["nearest"]["delta_e_mean"])


def test_denoise_raises_psnr_monotonically(results):
    _, extras = results
    lane = [r["psnr_db"] for r in extras
            if r["lane"] == "denoise_on_noisy"]
    assert lane == sorted(lane) and lane[0] < lane[-1]


def test_sharpen_cost_is_reported(results):
    """Sharpen trades PSNR-vs-truth for acutance; the scoreboard must
    report that cost rather than hide it (amount 0 scores best)."""
    _, extras = results
    lane = [r["psnr_db"] for r in extras
            if r["lane"] == "sharpen_on_clean"]
    assert lane[0] >= lane[1] >= lane[2]
