"""Pallas fused develop kernel: ≤1 LSB vs the bit-exact XLA path.
Runs in interpreter mode on the CPU test backend; the compiled kernel
is exercised on real TPU by bench.py and the verify drives."""

import numpy as np
import pytest

from raweditor_tpu.params import EditParams
from raweditor_tpu.ops.develop import develop_rgba, rgba_view
from raweditor_tpu.ops.pallas_develop import (
    _largest_even_divisor,
    pallas_develop_rgba,
)

WB = np.array([2.07, 1.0, 1.32], dtype=np.float32)
IDENTITY = np.eye(3, dtype=np.float32)

FULL = EditParams(exposure=0.6, contrast=8.0, highlights=-0.4, shadows=0.3,
                  whites=1.05, blacks=0.04, saturation=25.0, vibrance=0.5,
                  temperature=0.2, tint=-0.1)


def assert_1lsb(got_words, want_words, frac_exact=0.99):
    g = rgba_view(np.asarray(got_words)).astype(int)
    w = rgba_view(np.asarray(want_words)).astype(int)
    diff = np.abs(g - w)
    assert diff.max() <= 1
    assert (diff == 0).mean() >= frac_exact


@pytest.mark.parametrize("params", [EditParams(), FULL,
                                    EditParams(exposure=-2.0)])
def test_parity_vs_xla(params, rng):
    mosaic = rng.integers(0, 4096, size=(32, 48), dtype=np.uint16)
    got = pallas_develop_rgba(mosaic, params, WB, IDENTITY, interpret=True)
    want = develop_rgba(mosaic, params, WB, IDENTITY)
    assert_1lsb(got, want)


def test_multi_block_halo(rng):
    """Blocks exchange demosaic halos correctly: a 64-row image split
    into 8-row blocks must match the single-fusion XLA output."""
    mosaic = rng.integers(0, 4096, size=(64, 32), dtype=np.uint16)
    got = pallas_develop_rgba(mosaic, FULL, WB, IDENTITY, block_h=8,
                              interpret=True)
    want = develop_rgba(mosaic, FULL, WB, IDENTITY)
    assert_1lsb(got, want)


def test_black_white_levels(rng):
    mosaic = rng.integers(100, 16000, size=(16, 32), dtype=np.uint16)
    got = pallas_develop_rgba(mosaic, EditParams(), WB, IDENTITY,
                              white_level=16000.0, black_level=100.0,
                              interpret=True)
    want = develop_rgba(mosaic, EditParams(), WB, IDENTITY,
                        white_level=16000.0, black_level=100.0)
    assert_1lsb(got, want)


def test_nontrivial_matrix(rng):
    m = np.array([[1.6, -0.3, -0.3], [-0.2, 1.5, -0.3], [0.0, -0.4, 1.4]],
                 dtype=np.float32)
    mosaic = rng.integers(0, 4096, size=(16, 32), dtype=np.uint16)
    for transpose in (True, False):
        got = pallas_develop_rgba(mosaic, FULL, WB, m,
                                  matrix_transpose=transpose, interpret=True)
        want = develop_rgba(mosaic, FULL, WB, m, matrix_transpose=transpose)
        assert_1lsb(got, want)


def test_block_divisor_selection():
    assert _largest_even_divisor(4016) == 16
    assert _largest_even_divisor(4000) == 80
    assert 4000 % _largest_even_divisor(4000) == 0
    assert _largest_even_divisor(4016) % 8 == 0
    assert _largest_even_divisor(10) == 0  # no multiple-of-8 divisor


def test_indivisible_height_now_padded(rng):
    """Heights with no multiple-of-8 divisor used to raise; they are now
    edge-padded to 128-row blocks and match XLA within the budget."""
    mosaic = rng.integers(0, 4096, size=(10, 32), dtype=np.uint16)
    got = pallas_develop_rgba(mosaic, EditParams(), WB, IDENTITY,
                              interpret=True)
    want = develop_rgba(mosaic, EditParams(), WB, IDENTITY)
    assert_1lsb(got, want)
    # An explicit non-dividing block height is still an error.
    with pytest.raises(ValueError):
        pallas_develop_rgba(mosaic, EditParams(), WB, IDENTITY,
                            interpret=True, block_h=8)


def test_cfa_phase(rng):
    mosaic = rng.integers(0, 4096, size=(16, 32), dtype=np.uint16)
    for phase in [(0, 1), (1, 0), (1, 1)]:
        got = pallas_develop_rgba(mosaic, FULL, WB, IDENTITY,
                                  cfa_phase=phase, interpret=True)
        want = develop_rgba(mosaic, FULL, WB, IDENTITY, cfa_phase=phase)
        assert_1lsb(got, want)


def test_fast_gamma_accuracy(rng):
    """gamma='poly' (sqrt-sqrt + degree-6 poly) stays within 1 LSB of
    the exact-pow kernel output."""
    mosaic = rng.integers(0, 4096, size=(16, 32), dtype=np.uint16)
    exact = pallas_develop_rgba(mosaic, FULL, WB, IDENTITY,
                                interpret=True)
    fast = pallas_develop_rgba(mosaic, FULL, WB, IDENTITY,
                               interpret=True, gamma="poly")
    assert_1lsb(fast, exact, frac_exact=0.95)


def test_fast_gamma_dense_ramp():
    """Dense linear ramp sweeps the whole output range through the poly
    path (the worst case for a fitted curve)."""
    ramp = np.tile(
        np.linspace(0, 4095, 512).astype(np.uint16), (8, 1)
    )
    exact = pallas_develop_rgba(ramp, EditParams(), WB, IDENTITY,
                                interpret=True)
    fast = pallas_develop_rgba(ramp, EditParams(), WB, IDENTITY,
                               interpret=True, gamma="poly")
    assert_1lsb(fast, exact, frac_exact=0.95)


def test_fast_srgb_gamma(rng):
    """gamma='srgb_poly' (exact linear segment + degree-6 poly pow
    branch) stays within 1 LSB of the exact gamma='srgb' kernel, on
    random data and on a dense ramp."""
    mosaic = rng.integers(0, 4096, size=(16, 32), dtype=np.uint16)
    ramp = np.tile(np.linspace(0, 4095, 512).astype(np.uint16), (8, 1))
    for img in (mosaic, ramp):
        exact = pallas_develop_rgba(img, EditParams(), WB, IDENTITY,
                                    interpret=True, gamma="srgb")
        fast = pallas_develop_rgba(img, EditParams(), WB, IDENTITY,
                                   interpret=True, gamma="srgb_poly")
        assert_1lsb(fast, exact, frac_exact=0.95)


class TestBatchedKernel:
    """pallas_batch_develop_rgba: batch grid axis + (N, 24) SMEM scalar
    table must reproduce the single-image kernel exactly."""

    def _batch(self, rng, n=3, h=16, w=32):
        from raweditor_tpu.parallel.batch import pack_params

        mosaics = rng.integers(0, 4096, size=(n, h, w), dtype=np.uint16)
        plist = [EditParams(exposure=0.2 * i, contrast=5.0 * i,
                            saturation=10.0, shadows=0.1 * i)
                 for i in range(n)]
        wbs = np.tile(WB, (n, 1))
        cms = np.tile(IDENTITY, (n, 1, 1))
        return mosaics, plist, pack_params(plist), wbs, cms

    def test_matches_single_image_kernel(self, rng):
        from raweditor_tpu.ops.pallas_develop import (
            pallas_batch_develop_rgba,
        )

        mosaics, plist, pp, wbs, cms = self._batch(rng)
        out = np.asarray(pallas_batch_develop_rgba(
            mosaics, pp, wbs, cms, interpret=True))
        for i in range(len(plist)):
            want = np.asarray(pallas_develop_rgba(
                mosaics[i], plist[i], wbs[i], cms[i], interpret=True))
            assert (out[i] == want).all(), i

    def test_srgb_poly_lane(self, rng):
        from raweditor_tpu.ops.pallas_develop import (
            pallas_batch_develop_rgba,
        )

        mosaics, plist, pp, wbs, cms = self._batch(rng)
        out = np.asarray(pallas_batch_develop_rgba(
            mosaics, pp, wbs, cms, interpret=True, gamma="srgb_poly"))
        for i in range(len(plist)):
            want = np.asarray(pallas_develop_rgba(
                mosaics[i], plist[i], wbs[i], cms[i], interpret=True,
                gamma="srgb_poly"))
            assert (out[i] == want).all(), i

    def test_poly_gamma_and_phase(self, rng):
        from raweditor_tpu.ops.pallas_develop import (
            pallas_batch_develop_rgba,
        )

        mosaics, plist, pp, wbs, cms = self._batch(rng)
        out = np.asarray(pallas_batch_develop_rgba(
            mosaics, pp, wbs, cms, interpret=True, gamma="poly",
            cfa_phase=(0, 1)))
        for i in range(len(plist)):
            want = np.asarray(pallas_develop_rgba(
                mosaics[i], plist[i], wbs[i], cms[i], interpret=True,
                gamma="poly", cfa_phase=(0, 1)))
            assert (out[i] == want).all(), i

    def test_per_image_levels(self, rng):
        from raweditor_tpu.ops.pallas_develop import (
            pallas_batch_develop_rgba,
        )

        mosaics, plist, pp, wbs, cms = self._batch(rng)
        whites = np.array([4095.0, 4000.0, 16383.0], np.float32)
        blacks = np.array([0.0, 128.0, 512.0], np.float32)
        out = np.asarray(pallas_batch_develop_rgba(
            mosaics, pp, wbs, cms, whites, blacks, interpret=True))
        for i in range(len(plist)):
            want = np.asarray(pallas_develop_rgba(
                mosaics[i], plist[i], wbs[i], cms[i],
                white_level=whites[i], black_level=blacks[i],
                interpret=True))
            assert (out[i] == want).all(), i

    def test_odd_height_now_padded(self, rng):
        from raweditor_tpu.ops.pallas_develop import (
            pallas_batch_develop_rgba,
        )

        mosaics, plist, pp, wbs, cms = self._batch(rng, h=12)
        out = np.asarray(pallas_batch_develop_rgba(
            mosaics, pp, wbs, cms, interpret=True))
        for i in range(len(plist)):
            want = np.asarray(pallas_develop_rgba(
                mosaics[i], plist[i], wbs[i], cms[i], interpret=True))
            assert (out[i] == want).all(), i


def test_srgb_transfer_matches_xla(rng):
    """gamma='srgb' in the kernel matches the XLA srgb transfer within
    the kernel's usual ±1 LSB constant-folding budget."""
    mosaic = rng.integers(0, 4096, size=(16, 32), dtype=np.uint16)
    want = develop_rgba(mosaic, FULL, WB, IDENTITY, transfer="srgb")
    got = pallas_develop_rgba(mosaic, FULL, WB, IDENTITY,
                              interpret=True, gamma="srgb")
    assert_1lsb(got, want)


def test_xtrans_pattern_matches_xla(rng):
    """pattern=XTRANS in the kernel matches the XLA develop_xtrans
    nearest path within the ±1 LSB folding budget."""
    from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN
    from raweditor_tpu.ops.develop import develop_xtrans

    mosaic = rng.integers(0, 4096, size=(24, 36), dtype=np.uint16)
    want = develop_xtrans(mosaic, FULL, WB, IDENTITY, rgba=True)
    got = pallas_develop_rgba(mosaic, FULL, WB, IDENTITY,
                              matrix_transpose=False,
                              interpret=True, pattern=XTRANS_PATTERN)
    assert_1lsb(got, want)


def test_xtrans_smooth_pattern_matches_xla(rng):
    """demosaic='smooth' with pattern=XTRANS (the normalized-convolution
    tier, fully in-kernel) matches the XLA develop_xtrans smooth path
    within ±1 LSB. Non-default: the XLA lane measured faster on-chip
    (performance.md 'measured and rejected'), but the kernel path stays
    available and correct."""
    from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN
    from raweditor_tpu.ops.develop import develop_xtrans

    # (48, 384): bh=24 and padded w=384 are both multiples of 6, so
    # this shape exercises the roll-based mask fast path (the first
    # two shapes only reach the indicator-select branch).
    for shape in ((40, 48), (48, 132), (48, 384)):
        mosaic = rng.integers(0, 4096, size=shape, dtype=np.uint16)
        want = develop_xtrans(mosaic, FULL, WB, REAL_MATRIX, rgba=True,
                              demosaic_method="smooth", transfer="srgb",
                              white_level=4000.0, black_level=128.0)
        got = pallas_develop_rgba(mosaic, FULL, WB, REAL_MATRIX,
                                  matrix_transpose=False, gamma="srgb",
                                  white_level=4000.0, black_level=128.0,
                                  interpret=True, pattern=XTRANS_PATTERN,
                                  demosaic="smooth")
        assert_1lsb(got, want, frac_exact=0.97)


def test_smooth_requires_radius1_pattern(rng):
    """Patterns whose smooth radius exceeds 1 (a sparse-R toy grid)
    must be rejected — the in-kernel tier is radius-1 only."""
    sparse = "RGGG" "GGGG" "GGGB" "GGGG"  # R/B radius 2 on this 4x4
    mosaic = rng.integers(0, 4096, size=(24, 32), dtype=np.uint16)
    with pytest.raises(ValueError):
        pallas_develop_rgba(mosaic, EditParams(), WB, IDENTITY,
                            pattern=sparse, demosaic="smooth",
                            interpret=True)


def test_xtrans_pattern_batched(rng):
    from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN
    from raweditor_tpu.ops.pallas_develop import pallas_batch_develop_rgba
    from raweditor_tpu.parallel.batch import pack_params

    n = 2
    mosaics = rng.integers(0, 4096, size=(n, 24, 36), dtype=np.uint16)
    plist = [EditParams(exposure=0.2 * i) for i in range(n)]
    wbs = np.tile(WB, (n, 1))
    cms = np.tile(IDENTITY, (n, 1, 1))
    out = np.asarray(pallas_batch_develop_rgba(
        mosaics, pack_params(plist), wbs, cms, matrix_transpose=False,
        interpret=True, pattern=XTRANS_PATTERN))
    for i in range(n):
        want = np.asarray(pallas_develop_rgba(
            mosaics[i], plist[i], wbs[i], cms[i], matrix_transpose=False,
            interpret=True, pattern=XTRANS_PATTERN))
        assert (out[i] == want).all(), i


def test_block_and_wmult_roll_gating():
    """The lcm(128, side) width pad is only paid when the chosen block
    height satisfies the grad roll-mask precondition ((bh+8) % side
    == 0); a non-qualifying explicit block_h must keep the plain
    128-lane pad (padding without the rolls measured slower)."""
    from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN
    from raweditor_tpu.ops.pallas_develop import _block_and_wmult

    # Auto selection at a production-like height picks a roll-friendly
    # block (bh+8 ≡ 0 mod 6) and the lcm pad.
    bh, wmult = _block_and_wmult(4032, None, XTRANS_PATTERN, "grad")
    assert (bh + 8) % 6 == 0 and wmult == 384
    # Explicit bh=8 (the kernel tests' lane): (8+8) % 6 != 0 — select
    # path, so no lcm pad.
    bh, wmult = _block_and_wmult(48, 8, XTRANS_PATTERN, "grad")
    assert bh == 8 and wmult == 128
    # Bayer and non-grad tiers never lcm-pad.
    assert _block_and_wmult(48, None, None, "malvar")[1] == 128
    assert _block_and_wmult(48, None, XTRANS_PATTERN, "smooth")[1] == 128


def test_unaligned_width_edge_pad(rng):
    """Widths that aren't 128-aligned are edge-padded and sliced; the
    result must equal the same image embedded in an aligned canvas."""
    mosaic = rng.integers(0, 4096, size=(16, 30), dtype=np.uint16)
    got = np.asarray(pallas_develop_rgba(mosaic, FULL, WB, IDENTITY,
                                         interpret=True))
    aligned = np.pad(mosaic, ((0, 0), (0, 2)), mode="edge")
    want = np.asarray(pallas_develop_rgba(aligned, FULL, WB, IDENTITY,
                                          interpret=True))[:, :30]
    assert (got == want).all()
    # and within 1 LSB of the XLA reference
    xla = develop_rgba(mosaic, FULL, WB, IDENTITY)
    assert_1lsb(got, xla)


def test_no_divisor_height_padded(rng):
    """Heights with no multiple-of-8 divisor (502 = 2·251) used to be
    unsupported; they are edge-padded to 128-row blocks and match XLA
    within the folding budget. Heights with a valid divisor keep their
    natural blocks (padding measured slower there)."""
    odd = rng.integers(0, 4096, size=(502, 32), dtype=np.uint16)
    got = pallas_develop_rgba(odd, FULL, WB, IDENTITY, interpret=True)
    want = develop_rgba(odd, FULL, WB, IDENTITY)
    assert_1lsb(got, want)


def test_random_param_sweep_vs_xla(rng):
    """10 random full-stack parameter points: the constant-folded kernel
    must stay within 1 LSB of the XLA path at every one."""
    mosaic = rng.integers(0, 4096, size=(24, 128), dtype=np.uint16)
    for trial in range(10):
        p = EditParams(
            exposure=float(rng.uniform(-3, 3)),
            contrast=float(rng.uniform(-80, 80)),
            highlights=float(rng.uniform(-1, 1)),
            shadows=float(rng.uniform(-1, 1)),
            whites=float(rng.uniform(0.6, 1.4)),
            blacks=float(rng.uniform(-0.2, 0.4)),
            vibrance=float(rng.uniform(-1, 1)),
            saturation=float(rng.uniform(-90, 90)),
            temperature=float(rng.uniform(-1, 1)),
            tint=float(rng.uniform(-1, 1)),
        )
        wb = rng.uniform(0.5, 2.5, 3).astype(np.float32)
        want = develop_rgba(mosaic, p, wb, IDENTITY)
        got = pallas_develop_rgba(mosaic, p, wb, IDENTITY,
                                  interpret=True)
        assert_1lsb(got, want, frac_exact=0.9), trial


def test_accurate_mode_settings(rng):
    """Kernel under accurate-mode settings: non-identity camera matrix,
    straight multiply (no WGSL transpose), real black/white levels."""
    mosaic = rng.integers(0, 16383, size=(16, 32), dtype=np.uint16)
    cm = np.array([[1.8, -0.5, -0.3],
                   [-0.2, 1.4, -0.2],
                   [0.05, -0.45, 1.4]], np.float32)
    want = develop_rgba(mosaic, FULL, WB, cm, white_level=16383.0,
                        black_level=512.0, matrix_transpose=False)
    got = pallas_develop_rgba(mosaic, FULL, WB, cm,
                              white_level=16383.0, black_level=512.0,
                              matrix_transpose=False, interpret=True)
    assert_1lsb(got, want, frac_exact=0.9)


def test_kernel_never_recompiles_on_slider_change(rng):
    """The folded-scalar vector is traced: slider/WB/level changes reuse
    the compiled kernel."""
    mosaic = rng.integers(0, 4096, size=(16, 128), dtype=np.uint16)
    pallas_develop_rgba._clear_cache()
    for i in range(5):
        pallas_develop_rgba(
            mosaic, EditParams(exposure=0.2 * i, contrast=3.0 * i),
            WB * (1.0 + 0.01 * i), IDENTITY,
            white_level=4096.0 - i, black_level=float(i),
            interpret=True)
    assert pallas_develop_rgba._cache_size() == 1


REAL_MATRIX = np.array(
    [[0.9, 0.2, -0.1], [-0.15, 1.1, 0.05], [0.02, -0.3, 1.28]],
    dtype=np.float32,
)


class TestAccurateMode:
    """In-kernel bilinear/Malvar + real matrix + sRGB: the accurate
    lane no longer falls back to XLA (VERDICT r1 item 7)."""

    @pytest.mark.parametrize("method", ["bilinear", "malvar", "grad"])
    def test_demosaic_parity_vs_xla(self, method, rng):
        mosaic = rng.integers(0, 4096, size=(32, 48), dtype=np.uint16)
        got = pallas_develop_rgba(mosaic, FULL, WB, REAL_MATRIX,
                                  demosaic=method, gamma="srgb",
                                  interpret=True)
        want = develop_rgba(mosaic, FULL, WB, REAL_MATRIX,
                            demosaic_method=method, transfer="srgb")
        assert_1lsb(got, want, frac_exact=0.97)

    @pytest.mark.parametrize("method", ["bilinear", "malvar", "grad"])
    def test_multi_block_halo(self, method, rng):
        """The 2-row halo must make block boundaries invisible: a
        64-row image in 8-row blocks == 32-row blocks. (The image must
        be at least block_h+8 rows tall — the pad-free kernel clamps
        its halo windows inside the image.)"""
        mosaic = rng.integers(0, 4096, size=(64, 48), dtype=np.uint16)
        a = pallas_develop_rgba(mosaic, FULL, WB, REAL_MATRIX,
                                demosaic=method, block_h=8,
                                interpret=True)
        b = pallas_develop_rgba(mosaic, FULL, WB, REAL_MATRIX,
                                demosaic=method, block_h=32,
                                interpret=True)
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_malvar_black_level_floor(self, rng):
        """The Malvar undershoot clamp must sit at the black level
        (the XLA path clamps the normalized value at 0)."""
        mosaic = rng.integers(200, 4096, size=(16, 32), dtype=np.uint16)
        mosaic[::2, ::2] = 200  # hard edges around the R sites
        got = pallas_develop_rgba(
            mosaic, EditParams(), WB, REAL_MATRIX, white_level=4000.0,
            black_level=200.0, demosaic="malvar", gamma="srgb",
            interpret=True)
        want = develop_rgba(
            mosaic, EditParams(), WB, REAL_MATRIX, white_level=4000.0,
            black_level=200.0, demosaic_method="malvar", transfer="srgb")
        assert_1lsb(got, want, frac_exact=0.95)

    def test_batched_accurate_matches_single(self, rng):
        from raweditor_tpu.ops.pallas_develop import (
            pallas_batch_develop_rgba,
        )
        from raweditor_tpu.parallel.batch import pack_params

        mosaics = rng.integers(0, 4096, size=(3, 16, 32),
                               dtype=np.uint16)
        plist = [EditParams(exposure=0.2 * i) for i in range(3)]
        pp = pack_params(plist)
        wbs = np.tile(WB, (3, 1))
        cms = np.tile(REAL_MATRIX, (3, 1, 1))
        batch = np.asarray(pallas_batch_develop_rgba(
            mosaics, pp, wbs, cms, demosaic="malvar", gamma="srgb",
            interpret=True))
        for i in range(3):
            single = np.asarray(pallas_develop_rgba(
                mosaics[i], plist[i], wbs[i], cms[i], demosaic="malvar",
                gamma="srgb", interpret=True))
            assert np.array_equal(batch[i], single)

    def test_pattern_plus_smooth_rejected(self, rng):
        from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN

        mosaic = rng.integers(0, 4096, size=(24, 24), dtype=np.uint16)
        with pytest.raises(ValueError):
            pallas_develop_rgba(mosaic, EditParams(), WB, IDENTITY,
                                pattern=XTRANS_PATTERN,
                                demosaic="malvar", interpret=True)

    def test_unknown_demosaic_rejected(self, rng):
        mosaic = rng.integers(0, 4096, size=(24, 24), dtype=np.uint16)
        with pytest.raises(ValueError):
            pallas_develop_rgba(mosaic, EditParams(), WB, IDENTITY,
                                demosaic="smooth", interpret=True)


class TestGradKernel:
    """In-kernel gradient-weighted demosaic (the quality tier above
    Malvar): the full directional-G + chroma-difference + 2-iteration
    refinement pipeline runs fused, within ±1 LSB of the XLA path
    (ops/cfa_generic.demosaic_grad_generic on the Bayer grid)."""

    @pytest.mark.parametrize("phase", [(0, 0), (0, 1), (1, 0), (1, 1)])
    def test_vs_xla_all_phases(self, phase, rng):
        mosaic = rng.integers(0, 4096, size=(32, 128), dtype=np.uint16)
        got = pallas_develop_rgba(mosaic, FULL, WB, REAL_MATRIX,
                                  demosaic="grad", gamma="srgb",
                                  cfa_phase=phase, interpret=True)
        want = develop_rgba(mosaic, FULL, WB, REAL_MATRIX,
                            demosaic_method="grad", transfer="srgb",
                            cfa_phase=phase)
        assert_1lsb(got, want, frac_exact=0.97)

    def test_real_levels(self, rng):
        """Offset-invariance of the folded black level through the
        nonlinear gradient blend: real black/white levels must match
        the XLA path, which normalizes before demosaicing."""
        mosaic = rng.integers(0, 16383, size=(32, 48), dtype=np.uint16)
        got = pallas_develop_rgba(
            mosaic, FULL, WB, REAL_MATRIX, white_level=15871.0,
            black_level=1008.0, demosaic="grad", gamma="srgb",
            matrix_transpose=False, interpret=True)
        want = develop_rgba(
            mosaic, FULL, WB, REAL_MATRIX, white_level=15871.0,
            black_level=1008.0, demosaic_method="grad", transfer="srgb",
            matrix_transpose=False)
        assert_1lsb(got, want, frac_exact=0.95)

    def test_unaligned_width_true_edge_clamp(self, rng):
        """The width-pad rescue's clone columns violate CFA parity —
        grad must clamp at the TRUE image edge (the clone-column trick
        that is exact for the linear stencils mis-classes grad's
        composed stages; regression: last two columns were off by up
        to 28/255)."""
        mosaic = rng.integers(0, 4096, size=(32, 48), dtype=np.uint16)
        got = pallas_develop_rgba(mosaic, FULL, WB, REAL_MATRIX,
                                  demosaic="grad", gamma="srgb",
                                  interpret=True)
        want = develop_rgba(mosaic, FULL, WB, REAL_MATRIX,
                            demosaic_method="grad", transfer="srgb")
        assert_1lsb(got, want, frac_exact=0.97)

    def test_no_divisor_height_true_edge_clamp(self, rng):
        """Same for the height-pad rescue: clone rows must not leak
        into grad's row-parity classes."""
        odd = rng.integers(0, 4096, size=(250, 32), dtype=np.uint16)
        got = pallas_develop_rgba(odd, FULL, WB, REAL_MATRIX,
                                  demosaic="grad", gamma="srgb",
                                  interpret=True)
        want = develop_rgba(odd, FULL, WB, REAL_MATRIX,
                            demosaic_method="grad", transfer="srgb")
        assert_1lsb(got, want, frac_exact=0.97)

    def test_batched_matches_single(self, rng):
        from raweditor_tpu.ops.pallas_develop import (
            pallas_batch_develop_rgba,
        )
        from raweditor_tpu.parallel.batch import pack_params

        mosaics = rng.integers(0, 4096, size=(3, 32, 48),
                               dtype=np.uint16)
        plist = [EditParams(exposure=0.2 * i) for i in range(3)]
        pp = pack_params(plist)
        wbs = np.tile(WB, (3, 1))
        cms = np.tile(REAL_MATRIX, (3, 1, 1))
        batch = np.asarray(pallas_batch_develop_rgba(
            mosaics, pp, wbs, cms, demosaic="grad", gamma="srgb",
            interpret=True))
        for i in range(3):
            single = np.asarray(pallas_develop_rgba(
                mosaics[i], plist[i], wbs[i], cms[i], demosaic="grad",
                gamma="srgb", interpret=True))
            assert np.array_equal(batch[i], single)

    def test_constant_mosaic_is_uniform(self, rng):
        """A constant mosaic must develop to one uniform color — the
        clamp-to-edge smoke invariant, which also pins the refinement
        rebuild (any class mix-up shows up as CFA-period texture)."""
        mosaic = np.full((32, 128), 2000, dtype=np.uint16)
        out = rgba_view(np.asarray(pallas_develop_rgba(
            mosaic, EditParams(), WB, REAL_MATRIX, demosaic="grad",
            gamma="srgb", interpret=True)))
        assert (out == out[0, 0]).all()


class TestXTransGradKernel:
    """In-kernel gradient-weighted demosaic on the 6×6 X-Trans grid
    (pattern + demosaic='grad'): the same band machinery as the Bayer
    grad kernel with per-tap periodic site masks; ±1 LSB vs the XLA
    demosaic_grad_generic path. This IS the default X-Trans grad lane
    under use_pallas (measured 8.0 ms vs 11.6 XLA @24 MP)."""

    def _xla(self, mosaic, **kw):
        from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN
        from raweditor_tpu.ops.develop import develop_xtrans

        return develop_xtrans(mosaic, FULL, WB, REAL_MATRIX,
                              pattern=XTRANS_PATTERN,
                              demosaic_method="grad", transfer="srgb",
                              rgba=True, **kw)

    def _kernel(self, mosaic, block_h=None, **kw):
        from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN

        return pallas_develop_rgba(mosaic, FULL, WB, REAL_MATRIX,
                                   pattern=XTRANS_PATTERN,
                                   demosaic="grad", gamma="srgb",
                                   matrix_transpose=False,
                                   block_h=block_h, interpret=True,
                                   **kw)

    def test_vs_xla(self, rng):
        mosaic = rng.integers(0, 4096, size=(40, 48), dtype=np.uint16)
        want = self._xla(mosaic, white_level=4000.0, black_level=128.0)
        got = self._kernel(mosaic, block_h=8, white_level=4000.0,
                           black_level=128.0)
        assert_1lsb(got, want, frac_exact=0.97)

    def test_multi_block_halo(self, rng):
        mosaic = rng.integers(0, 4096, size=(72, 48), dtype=np.uint16)
        a = self._kernel(mosaic, block_h=8)
        b = self._kernel(mosaic, block_h=24)
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_pad_rescues_true_edge_clamp(self, rng):
        """Width pad (48→128 lanes) and no-divisor height pad (250):
        grad's masks must key off the unclamped periodic parity while
        values clamp at the TRUE edges."""
        for shape in ((250, 48), (64, 130)):
            mosaic = rng.integers(0, 4096, size=shape, dtype=np.uint16)
            want = self._xla(mosaic)
            got = self._kernel(mosaic)
            assert_1lsb(got, want, frac_exact=0.97)

    def test_constant_mosaic_is_uniform(self):
        mosaic = np.full((40, 128), 2000, dtype=np.uint16)
        out = rgba_view(np.asarray(self._kernel(mosaic, block_h=8)))
        assert (out == out[0, 0]).all()

    def test_batched_matches_single_and_ycbcr(self, rng):
        """The batch launcher with pattern + grad — the exact lane
        run_batch_export dispatches — must match the single-image
        kernel, and its ycbcr420 planes must match converting the RGBA
        output (within one step)."""
        import jax

        from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN
        from raweditor_tpu.ops.jpeg import rgba_words_to_ycbcr420
        from raweditor_tpu.ops.pallas_develop import (
            pallas_batch_develop_rgba,
        )
        from raweditor_tpu.parallel.batch import pack_params

        mosaics = rng.integers(0, 4096, size=(2, 40, 48),
                               dtype=np.uint16)
        plist = [FULL, EditParams(exposure=0.2)]
        pp = pack_params(plist)
        wbs = np.tile(WB, (2, 1))
        cms = np.tile(REAL_MATRIX, (2, 1, 1))
        kw = dict(pattern=XTRANS_PATTERN, demosaic="grad", gamma="srgb",
                  matrix_transpose=False, interpret=True)
        batch = np.asarray(pallas_batch_develop_rgba(
            mosaics, pp, wbs, cms, **kw))
        for j in range(2):
            single = np.asarray(pallas_develop_rgba(
                mosaics[j], plist[j], wbs[j], cms[j], **kw))
            assert np.array_equal(batch[j], single)
        y, cbcr = pallas_batch_develop_rgba(
            mosaics, pp, wbs, cms, output="ycbcr420", **kw)
        want = jax.jit(rgba_words_to_ycbcr420)(batch)
        got = (np.asarray(y), np.asarray(cbcr)[:, :, 0::2],
               np.asarray(cbcr)[:, :, 1::2])
        for gpl, tpl, name in zip(got, want, ("y", "cb", "cr")):
            diff = np.abs(gpl.astype(int) - np.asarray(tpl).astype(int))
            assert diff.max() <= 1, name


class TestYCbCr420Output:
    """In-kernel JPEG planes (output='ycbcr420'): Y + NV12-interleaved
    CbCr must stay within one step of composing the RGBA kernel with
    ops/jpeg.rgba_words_to_ycbcr420 (FMA-contraction and chroma 4-sum
    reassociation are the only allowed differences)."""

    def _check(self, mosaics, plist, wbs, cms, max_frac_diff=0.05, **kw):
        import jax

        from raweditor_tpu.ops.jpeg import rgba_words_to_ycbcr420
        from raweditor_tpu.ops.pallas_develop import (
            pallas_batch_develop_rgba,
        )
        from raweditor_tpu.parallel.batch import pack_params

        pp = pack_params(plist)
        rgba = pallas_batch_develop_rgba(
            mosaics, pp, wbs, cms, interpret=True, **kw)
        want = jax.jit(rgba_words_to_ycbcr420)(rgba)
        y, cbcr = pallas_batch_develop_rgba(
            mosaics, pp, wbs, cms, interpret=True, output="ycbcr420",
            **kw)
        n, h, w = mosaics.shape
        assert y.shape == (n, h, w) and y.dtype == np.uint8
        assert cbcr.shape == (n, h // 2, w) and cbcr.dtype == np.uint8
        got = (y, cbcr[:, :, 0::2], cbcr[:, :, 1::2])
        for g, t, name in zip(got, want, ("y", "cb", "cr")):
            diff = np.abs(np.asarray(g).astype(int)
                          - np.asarray(t).astype(int))
            assert diff.max() <= 1, name
            assert (diff != 0).mean() <= max_frac_diff, name

    def test_matches_conversion(self, rng):
        mosaics = rng.integers(0, 4096, size=(2, 64, 256),
                               dtype=np.uint16)
        plist = [FULL, EditParams()]
        wbs = np.tile(WB, (2, 1))
        cms = np.tile(IDENTITY, (2, 1, 1))
        self._check(mosaics, plist, wbs, cms)

    def test_accurate_mode(self, rng):
        mosaics = rng.integers(0, 4096, size=(1, 64, 128),
                               dtype=np.uint16)
        self._check(mosaics, [FULL], WB[None], REAL_MATRIX[None],
                    demosaic="malvar", gamma="srgb")

    def test_grad_mode(self, rng):
        mosaics = rng.integers(0, 4096, size=(1, 64, 128),
                               dtype=np.uint16)
        self._check(mosaics, [FULL], WB[None], REAL_MATRIX[None],
                    demosaic="grad", gamma="srgb")

    def test_unaligned_width_edge_pad(self, rng):
        mosaics = rng.integers(0, 4096, size=(1, 64, 200),
                               dtype=np.uint16)
        self._check(mosaics, [EditParams()], WB[None], IDENTITY[None])

    def test_no_divisor_height_padded(self, rng):
        # 66 has no multiple-of-8 divisor → the pad-to-128 rescue path.
        mosaics = rng.integers(0, 4096, size=(1, 66, 128),
                               dtype=np.uint16)
        self._check(mosaics, [EditParams()], WB[None], IDENTITY[None])

    def test_xtrans_pattern(self, rng):
        from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN

        mosaics = rng.integers(0, 4096, size=(1, 48, 384),
                               dtype=np.uint16)
        self._check(mosaics, [EditParams()], WB[None], IDENTITY[None],
                    pattern=XTRANS_PATTERN)

    def test_odd_dims_rejected(self, rng):
        from raweditor_tpu.ops.pallas_develop import (
            pallas_batch_develop_rgba,
        )
        from raweditor_tpu.parallel.batch import pack_params

        mosaics = rng.integers(0, 4096, size=(1, 63, 128),
                               dtype=np.uint16)
        with pytest.raises(ValueError, match="even"):
            pallas_batch_develop_rgba(
                mosaics, pack_params([EditParams()]), WB[None],
                IDENTITY[None], interpret=True, output="ycbcr420")
