"""Clipped-highlight reconstruction (ops/highlights.py + wiring).

The capability is dcraw -H / Lightroom "recover": estimate
sensor-clipped CFA sites from the unclipped channels via the WB
ratios, pre-demosaic. Bit-exact passthrough at amount 0 and for
unclipped sites is the contract that lets it ride every develop path
unchanged.
"""

import numpy as np
import pytest

from raweditor_tpu.ops.highlights import (
    reconstruct_linear_highlights,
    reconstruct_mosaic_highlights,
)
from raweditor_tpu.params import EditParams

WB = np.array([2.0, 1.0, 1.4], np.float32)
WHITE = 4095.0


def _neutral_clipped_mosaic(h=16, w=16):
    """Bright neutral scene under WB (2,1,1.4): pre-WB neutral is
    ~(0.5, 1.0, 0.71) of white — G saturates first (the classic
    magenta-highlight setup)."""
    m = np.zeros((h, w), np.uint16)
    yy, xx = np.mgrid[0:h, 0:w]
    is_r = (yy % 2 == 0) & (xx % 2 == 0)
    is_b = (yy % 2 == 1) & (xx % 2 == 1)
    is_g = ~(is_r | is_b)
    m[is_r] = int(0.55 * WHITE)
    m[is_g] = int(WHITE)      # clipped
    m[is_b] = int(0.77 * WHITE)
    return m, is_r, is_g, is_b


def test_clipped_green_raised_others_exact():
    m, is_r, is_g, is_b = _neutral_clipped_mosaic()
    out = np.asarray(reconstruct_mosaic_highlights(
        m, WB, 100.0, white_level=WHITE))
    # G raised toward the WB-consistent neutral estimate
    # mean(0.55*2.0, 0.77*1.4)/1.0 = 1.089 of white.
    assert (out[is_g] > m[is_g]).all()
    assert out[is_g].max() <= int(1.2 * WHITE)
    # unclipped sites bit-exact
    assert (out[is_r] == m[is_r]).all()
    assert (out[is_b] == m[is_b]).all()


def test_amount_zero_and_half():
    m, _, is_g, _ = _neutral_clipped_mosaic()
    out0 = np.asarray(reconstruct_mosaic_highlights(
        m, WB, 0.0, white_level=WHITE))
    assert (out0 == m).all()  # bit-exact off
    full = np.asarray(reconstruct_mosaic_highlights(
        m, WB, 100.0, white_level=WHITE))
    half = np.asarray(reconstruct_mosaic_highlights(
        m, WB, 50.0, white_level=WHITE))
    lift_full = full[is_g].astype(int) - m[is_g].astype(int)
    lift_half = half[is_g].astype(int) - m[is_g].astype(int)
    np.testing.assert_allclose(lift_half, lift_full / 2, atol=1)


def test_unclipped_mosaic_is_identity():
    rng = np.random.default_rng(3)
    m = rng.integers(0, int(0.9 * WHITE), (24, 32), np.uint16)
    out = np.asarray(reconstruct_mosaic_highlights(
        m, WB, 100.0, white_level=WHITE))
    assert (out == m).all()


def test_all_channels_clipped_untouched():
    m = np.full((8, 8), int(WHITE), np.uint16)
    out = np.asarray(reconstruct_mosaic_highlights(
        m, WB, 100.0, white_level=WHITE))
    assert (out == m).all()  # no unclipped evidence -> no estimate


def test_raise_only():
    """Reconstruction can never darken a site."""
    rng = np.random.default_rng(4)
    m = rng.integers(int(0.5 * WHITE), int(WHITE) + 1, (32, 32),
                     np.uint16)
    out = np.asarray(reconstruct_mosaic_highlights(
        m, WB, 100.0, white_level=WHITE))
    assert (out.astype(int) >= m.astype(int)).all()


def test_xtrans_variant():
    from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN

    h = w = 24
    chan = {"R": 0, "G": 1, "B": 2}
    grid = np.array([[chan[XTRANS_PATTERN[r * 6 + c]]
                      for c in range(6)] for r in range(6)])
    yy, xx = np.mgrid[0:h, 0:w]
    idx = grid[yy % 6, xx % 6]
    m = np.zeros((h, w), np.uint16)
    m[idx == 0] = int(0.55 * WHITE)
    m[idx == 1] = int(WHITE)
    m[idx == 2] = int(0.77 * WHITE)
    out = np.asarray(reconstruct_mosaic_highlights(
        m, WB, 100.0, white_level=WHITE,
        xtrans_pattern=XTRANS_PATTERN))
    assert (out[idx == 1] > m[idx == 1]).all()
    assert (out[idx == 0] == m[idx == 0]).all()
    assert (out[idx == 2] == m[idx == 2]).all()


def test_linear_variant():
    f = np.zeros((8, 8, 3), np.uint16)
    f[..., 0] = int(0.55 * WHITE)
    f[..., 1] = int(WHITE)
    f[..., 2] = int(0.77 * WHITE)
    out = np.asarray(reconstruct_linear_highlights(
        f, WB, 100.0, white_level=WHITE))
    assert (out[..., 1] > f[..., 1]).all()
    assert (out[..., 0] == f[..., 0]).all()
    assert (out[..., 2] == f[..., 2]).all()


# -- engine / exporter wiring -------------------------------------------

def _write_clipped_nef(path, h=32, w=48):
    from raweditor_tpu.raw.synth import write_synthetic_raw

    m, *_ = _neutral_clipped_mosaic(h, w)
    # wb_neutral is 1/gain per channel: gains (2, 1, 1.4).
    write_synthetic_raw(path, m, wb_neutral=(0.5, 1.0, 1.0 / 1.4))
    return m


def test_engine_recovery_removes_magenta(tmp_path):
    from raweditor_tpu.pipeline.engine import DevelopEngine

    path = tmp_path / "clip.nef"
    _write_clipped_nef(path)
    eng = DevelopEngine.open(path, mode="accurate",
                             demosaic_method="malvar", transfer="srgb")
    # Pulled-down exposure is where clipped highlights show their
    # cast (at 0 EV everything clips to pure white in the output
    # anyway): post-WB (1.1, 1.0, 1.08) lands visibly pink once
    # scaled below 1.0.
    pull = EditParams(exposure=-1.5)
    off = eng.preview(pull).astype(int)
    on = eng.preview(pull.replace(
        highlight_recovery=100.0)).astype(int)
    # Without recovery the clipped-G neutral renders magenta-ish
    # (G below R); with recovery G rises toward R.
    mid = off[8:-8, 8:-8]
    mid_on = on[8:-8, 8:-8]
    gap_off = (mid[..., 0] - mid[..., 1]).mean()
    gap_on = (mid_on[..., 0] - mid_on[..., 1]).mean()
    # post-WB (1.1, 1.0) after -1.5 EV through sRGB = ~7 u8 levels
    assert gap_off > 5  # the magenta cast exists
    assert gap_on < gap_off / 2  # and recovery closes most of it
    # amount 0 is bit-exact with a fresh engine render
    off2 = eng.preview(pull.replace(highlight_recovery=0.0))
    np.testing.assert_array_equal(off2.astype(int), off)
    # per-amount cache: same amount reuses the reconstructed mosaic
    eng.preview(EditParams(highlight_recovery=100.0))
    assert eng._hl_cache[0] == 100.0


def test_export_batch_mixed_amounts(tmp_path):
    """A recovery-active image changes; a zero-amount image in the
    SAME batch stays byte-identical to a recovery-free run."""
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export

    path = tmp_path / "clip.nef"
    _write_clipped_nef(path)
    jobs = [
        ExportJob(str(path), str(tmp_path / "on.png"),
                  EditParams(highlight_recovery=100.0)),
        ExportJob(str(path), str(tmp_path / "off.png"), EditParams()),
    ]
    rep = run_batch_export(jobs, batch_size=2, mode="accurate",
                           demosaic_method="malvar", transfer="srgb")
    assert rep.succeeded == 2
    ref = run_batch_export(
        [ExportJob(str(path), str(tmp_path / "ref.png"), EditParams())],
        batch_size=2, mode="accurate", demosaic_method="malvar",
        transfer="srgb")
    assert ref.succeeded == 1
    on = (tmp_path / "on.png").read_bytes()
    off = (tmp_path / "off.png").read_bytes()
    refb = (tmp_path / "ref.png").read_bytes()
    assert on != off
    assert off == refb  # bit-exact passthrough inside an active batch


def test_export_mesh_vs_solo_with_recovery(tmp_path, rng):
    from raweditor_tpu.parallel import batch_row_mesh
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export

    mesh = batch_row_mesh(row=2)
    path = tmp_path / "clip.nef"
    _write_clipped_nef(path, h=16, w=48)
    n = mesh.shape["batch"]
    jobs, solo = [], []
    for i in range(n):
        p = EditParams(highlight_recovery=100.0 if i % 2 else 0.0,
                       exposure=0.05 * i)
        jobs.append(ExportJob(str(path),
                              str(tmp_path / "mesh" / f"{i}.png"), p))
        solo.append(ExportJob(str(path),
                              str(tmp_path / "solo" / f"{i}.png"), p))
    assert run_batch_export(jobs, mesh=mesh, batch_size=n,
                            mode="accurate").succeeded == n
    assert run_batch_export(solo, mesh=None, batch_size=n,
                            mode="accurate").succeeded == n
    for i in range(n):
        assert (tmp_path / "mesh" / f"{i}.png").read_bytes() == \
            (tmp_path / "solo" / f"{i}.png").read_bytes(), i


def test_cli_slider_exposed(tmp_path, capsys):
    from raweditor_tpu.cli import main

    path = tmp_path / "clip.nef"
    _write_clipped_nef(path)
    out = tmp_path / "out.png"
    code = main(["develop", str(path), "-o", str(out), "--mode",
                 "accurate", "--exposure", "-1.5",
                 "--highlight-recovery", "100"])
    assert code == 0 and out.exists()
    capsys.readouterr()
    ref = tmp_path / "ref.png"
    main(["develop", str(path), "-o", str(ref), "--mode", "accurate",
          "--exposure", "-1.5"])
    assert out.read_bytes() != ref.read_bytes()
