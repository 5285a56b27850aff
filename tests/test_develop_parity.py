"""1-LSB parity of the TPU develop pipeline against the NumPy oracle.

The oracle (tests/oracle.py) re-implements the reference WGSL shader
per-pixel (reference: gpu/shaders.rs:104-267); the production pipeline
must match within 1 LSB of 8-bit sRGB across all 10 sliders — the
BASELINE.md parity bar.
"""

import numpy as np
import pytest

from raweditor_tpu.params import EditParams
from raweditor_tpu.ops.develop import develop, develop_preview

import oracle

IDENTITY = np.eye(3, dtype=np.float32)
WB_NEUTRAL = np.ones(3, dtype=np.float32)
WB_DAYLIGHT = np.array([2.07, 1.0, 1.32], dtype=np.float32)


def assert_parity(got, want, lsb=1, frac_exact=None):
    got = np.asarray(got, dtype=np.int32)
    want = np.asarray(want, dtype=np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= lsb, (
        f"max diff {diff.max()} LSB at {np.unravel_index(diff.argmax(), diff.shape)}"
    )
    if frac_exact is not None:
        assert (diff == 0).mean() >= frac_exact


PARAM_CASES = {
    "defaults": EditParams(),
    "exposure_up": EditParams(exposure=1.7),
    "exposure_down": EditParams(exposure=-2.3),
    "contrast": EditParams(contrast=8.0),
    "highlights_shadows": EditParams(highlights=-0.6, shadows=0.45),
    "levels": EditParams(whites=0.85, blacks=0.12),
    "saturation": EditParams(saturation=55.0),
    "desaturate": EditParams(saturation=-100.0),
    "vibrance": EditParams(vibrance=0.8),
    "temp_tint": EditParams(temperature=0.5, tint=-0.35),
    "everything": EditParams(
        exposure=0.8, contrast=-4.0, highlights=0.3, shadows=-0.2,
        whites=1.1, blacks=0.05, vibrance=-0.4, saturation=20.0,
        temperature=-0.25, tint=0.15,
    ),
}


@pytest.mark.parametrize("name", sorted(PARAM_CASES))
def test_full_develop_parity(name, rng):
    params = PARAM_CASES[name]
    mosaic = rng.integers(0, 4096, size=(24, 32), dtype=np.uint16)
    want = oracle.develop_image(mosaic, params, WB_DAYLIGHT, IDENTITY)
    got = develop(mosaic, params, WB_DAYLIGHT, IDENTITY)
    assert_parity(got, want, lsb=1, frac_exact=0.99)


def test_full_develop_nontrivial_matrix(rng):
    # Arbitrary matrix exercises the WGSL transpose quirk
    # (reference: gpu/shaders.rs:209-214).
    m = np.array(
        [[1.6, -0.3, -0.3], [-0.2, 1.5, -0.3], [0.0, -0.4, 1.4]],
        dtype=np.float32,
    )
    mosaic = rng.integers(0, 4096, size=(16, 20), dtype=np.uint16)
    params = EditParams(exposure=0.5)
    want = oracle.develop_image(mosaic, params, WB_DAYLIGHT, m)
    got = develop(mosaic, params, WB_DAYLIGHT, m)
    assert_parity(got, want)


def test_matrix_transpose_quirk_matters(rng):
    m = np.array(
        [[1.0, 0.5, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    mosaic = rng.integers(512, 3584, size=(16, 20), dtype=np.uint16)
    with_quirk = np.asarray(
        develop(mosaic, EditParams(), WB_NEUTRAL, m, matrix_transpose=True)
    )
    without = np.asarray(
        develop(mosaic, EditParams(), WB_NEUTRAL, m, matrix_transpose=False)
    )
    assert (with_quirk != without).any()


def test_debayer_edge_clamping():
    # Constant mosaic: every channel must equal the constant value at
    # every pixel including borders (clamp-to-edge,
    # reference: gpu/shaders.rs:161-169), so output is uniform gray.
    mosaic = np.full((10, 12), 2048, dtype=np.uint16)
    out = np.asarray(develop(mosaic, EditParams(), WB_NEUTRAL, IDENTITY))
    assert (out == out[0, 0]).all()
    expected = np.floor((2048 / 4096) ** (1 / 2.2) * 255 + 0.5)
    assert out[0, 0, 0] == expected


def test_white_level_flag():
    # Accurate mode reads the true white level instead of the hardcoded
    # 4096 (reference: gpu/shaders.rs:110 is wrong for 14-bit RAWs).
    mosaic = np.full((8, 8), 8192, dtype=np.uint16)
    out14 = np.asarray(
        develop(mosaic, EditParams(), WB_NEUTRAL, IDENTITY, white_level=16384.0)
    )
    expected = np.floor(0.5 ** (1 / 2.2) * 255 + 0.5)
    assert out14[0, 0, 0] == expected


@pytest.mark.parametrize("zoom,pan", [(1.0, (0.0, 0.0)), (2.5, (0.1, -0.05)),
                                      (0.5, (0.0, 0.0))])
def test_preview_parity(zoom, pan, rng):
    mosaic = rng.integers(0, 4096, size=(40, 64), dtype=np.uint16)
    params = EditParams(exposure=0.4, saturation=15.0)
    want = oracle.develop_preview(
        mosaic, params, WB_DAYLIGHT, IDENTITY, out_w=20, out_h=13,
        zoom=zoom, pan_x=pan[0], pan_y=pan[1],
    )
    got = develop_preview(
        mosaic, params, WB_DAYLIGHT, IDENTITY, out_w=20, out_h=13,
        zoom=zoom, pan_x=pan[0], pan_y=pan[1],
    )
    assert_parity(got, want)


def test_preview_zoomed_out_black_border(rng):
    mosaic = rng.integers(1024, 4096, size=(32, 32), dtype=np.uint16)
    out = np.asarray(
        develop_preview(
            mosaic, EditParams(), WB_NEUTRAL, IDENTITY,
            out_w=16, out_h=16, zoom=0.5,
        )
    )
    # At zoom 0.5 the image occupies the middle half; corners are black
    # (reference: gpu/shaders.rs:173-178).
    assert (out[0, 0] == 0).all()
    assert (out[-1, -1] == 0).all()
    assert (out[8, 8] > 0).any()


def test_zoom_pan_do_not_recompile(rng):
    import jax

    mosaic = rng.integers(0, 4096, size=(32, 32), dtype=np.uint16)

    def run(zoom, pan_x):
        return develop_preview(
            mosaic, EditParams(), WB_NEUTRAL, IDENTITY,
            out_w=16, out_h=16, zoom=zoom, pan_x=pan_x,
        )

    run(1.0, 0.0)
    misses_before = develop_preview._cache_size()
    run(2.0, 0.1)
    run(3.0, -0.2)
    assert develop_preview._cache_size() == misses_before


def test_srgb_transfer_differs_from_gamma22(rng):
    """Accurate-mode sRGB transfer: proper IEC encode vs plain 1/2.2."""
    from raweditor_tpu.color import srgb_encode

    mosaic = rng.integers(0, 4096, size=(16, 20), dtype=np.uint16)
    g22 = np.asarray(develop(mosaic, EditParams(), WB_NEUTRAL, IDENTITY))
    srgb = np.asarray(
        develop(mosaic, EditParams(), WB_NEUTRAL, IDENTITY, transfer="srgb")
    )
    assert (g22 != srgb).any()
    # Spot-check one pixel against the color.py transfer.
    lin = mosaic[3, 3] / 4096.0  # G site: v at (odd row? parity) — use
    # a constant image instead for an exact check:
    flat = np.full((8, 8), 1000, np.uint16)
    out = np.asarray(
        develop(flat, EditParams(), WB_NEUTRAL, IDENTITY, transfer="srgb")
    )
    want = np.floor(srgb_encode(np.float32(1000 / 4096)) * 255 + 0.5)
    assert out[0, 0, 0] == want


def test_bilinear_demosaic_option(rng):
    """Accurate-mode bilinear demosaic smooths vs nearest."""
    mosaic = rng.integers(0, 4096, size=(16, 20), dtype=np.uint16)
    near = np.asarray(develop(mosaic, EditParams(), WB_NEUTRAL, IDENTITY))
    bil = np.asarray(
        develop(mosaic, EditParams(), WB_NEUTRAL, IDENTITY,
                demosaic_method="bilinear")
    )
    assert (near != bil).any()
    # On a constant mosaic both must agree exactly.
    flat = np.full((8, 8), 2048, np.uint16)
    a = np.asarray(develop(flat, EditParams(), WB_NEUTRAL, IDENTITY))
    b = np.asarray(develop(flat, EditParams(), WB_NEUTRAL, IDENTITY,
                           demosaic_method="bilinear"))
    assert (a == b).all()


def test_cfa_phase_recovers_shifted_pattern(rng):
    """A GBRG/GRBG/BGGR mosaic developed with its phase must equal the
    RGGB development of the unshifted scene (interior pixels; edges
    differ by clamp geometry)."""
    from raweditor_tpu.ops.demosaic import CFA_PHASES

    # A scene mosaiced at RGGB phase:
    base = rng.integers(0, 4096, size=(20, 24), dtype=np.uint16)
    want = np.asarray(develop(base, EditParams(), WB_DAYLIGHT, IDENTITY))
    for pattern, (py, px) in CFA_PHASES.items():
        if (py, px) == (0, 0):
            continue
        # The same sensor data shifted by the phase: crop so that the
        # pattern at (0,0) becomes `pattern`.
        shifted = base[py:, px:]
        got = np.asarray(
            develop(shifted, EditParams(), WB_DAYLIGHT, IDENTITY,
                    cfa_phase=(py, px))
        )
        inner = (slice(2, -2), slice(2, -2))
        assert (got[inner] == want[py:, px:][inner]).all(), pattern


def test_large_oracle_parity(rng):
    """One larger frame (96x96) through the full slider stack vs the
    per-pixel oracle — guards against tiling/edge effects that tiny
    fixtures could miss."""
    params = PARAM_CASES["everything"]
    mosaic = rng.integers(0, 4096, size=(96, 96), dtype=np.uint16)
    want = oracle.develop_image(mosaic, params, WB_DAYLIGHT, IDENTITY)
    got = develop(mosaic, params, WB_DAYLIGHT, IDENTITY)
    assert_parity(got, want, lsb=1, frac_exact=0.999)


def test_randomized_param_sweep(rng):
    """25 random points across the full 10-slider space vs the oracle —
    property-style coverage beyond the named cases."""
    mosaic = rng.integers(0, 4096, size=(16, 20), dtype=np.uint16)
    for _ in range(25):
        params = EditParams(
            exposure=float(rng.uniform(-5, 5)),
            contrast=float(rng.uniform(-10, 10)),
            highlights=float(rng.uniform(-1, 1)),
            shadows=float(rng.uniform(-1, 1)),
            whites=float(rng.uniform(0.8, 1.2)),
            blacks=float(rng.uniform(0, 0.2)),
            vibrance=float(rng.uniform(-1, 1)),
            saturation=float(rng.uniform(-100, 100)),
            temperature=float(rng.uniform(-1, 1)),
            tint=float(rng.uniform(-1, 1)),
        )
        want = oracle.develop_image(mosaic, params, WB_DAYLIGHT, IDENTITY)
        got = develop(mosaic, params, WB_DAYLIGHT, IDENTITY)
        assert_parity(got, want, lsb=1)


class TestPolyTransfer:
    """transfer="gamma22_poly" through the XLA paths: ≤1 LSB of the
    exact-pow output everywhere it is offered."""

    def _diff(self, a, b):
        av = np.asarray(a).astype(np.int16)
        bv = np.asarray(b).astype(np.int16)
        return np.abs(av - bv)

    def test_develop_u8(self, rng):
        mosaic = rng.integers(0, 4096, size=(32, 48), dtype=np.uint16)
        p = EditParams(exposure=0.5, contrast=12.0, saturation=20.0)
        exact = develop(mosaic, p, WB_NEUTRAL, IDENTITY)
        fast = develop(mosaic, p, WB_NEUTRAL, IDENTITY,
                       transfer="gamma22_poly")
        d = self._diff(exact, fast)
        assert d.max() <= 1 and (d == 0).mean() > 0.98

    def test_develop_preview(self, rng):
        from raweditor_tpu.ops.develop import develop_preview

        mosaic = rng.integers(0, 4096, size=(64, 96), dtype=np.uint16)
        p = EditParams(exposure=0.3, shadows=0.4)
        exact = develop_preview(mosaic, p, WB_NEUTRAL, IDENTITY,
                                out_w=32, out_h=24)
        fast = develop_preview(mosaic, p, WB_NEUTRAL, IDENTITY,
                               out_w=32, out_h=24,
                               transfer="gamma22_poly")
        d = self._diff(exact, fast)
        assert d.max() <= 1

    def test_batch_develop_rgba(self, rng):
        from raweditor_tpu.parallel import batch_develop, pack_params
        from raweditor_tpu.parallel.batch import batch_develop_rgba
        from raweditor_tpu.ops.develop import rgba_view

        n = 3
        mosaics = rng.integers(0, 4096, size=(n, 16, 24), dtype=np.uint16)
        plist = [EditParams(exposure=0.2 * i) for i in range(n)]
        wbs = np.tile(WB_NEUTRAL, (n, 1))
        cms = np.tile(IDENTITY, (n, 1, 1))
        exact = rgba_view(batch_develop_rgba(
            mosaics, pack_params(plist), wbs, cms))
        fast = rgba_view(batch_develop_rgba(
            mosaics, pack_params(plist), wbs, cms,
            transfer="gamma22_poly"))
        d = self._diff(exact, fast)
        assert d.max() <= 1

    def test_unknown_transfer_rejected(self, rng):
        mosaic = rng.integers(0, 4096, size=(8, 8), dtype=np.uint16)
        with pytest.raises(ValueError, match="unknown transfer"):
            develop(mosaic, EditParams(), WB_NEUTRAL, IDENTITY,
                    transfer="bogus")


class TestMalvarDemosaic:
    """Malvar–He–Cutler gradient-corrected demosaic (accurate mode)."""

    def test_constant_scene_exact(self):
        from raweditor_tpu.ops.demosaic import demosaic_malvar

        mosaic = np.full((16, 24), 0.5, np.float32)
        r, g, b = demosaic_malvar(mosaic)
        for ch in (r, g, b):
            np.testing.assert_allclose(np.asarray(ch), 0.5, atol=1e-6)

    def test_linear_gradient_exact_interior(self):
        """All five kernels have unit sum and zero first moments, so a
        scene linear in x and y is reproduced exactly away from the
        2-px edge-clamp border."""
        from raweditor_tpu.ops.demosaic import demosaic_malvar

        h, w = 20, 28
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        scene = 0.01 * xx + 0.02 * yy + 0.1
        r, g, b = demosaic_malvar(scene)
        for ch in (r, g, b):
            np.testing.assert_allclose(
                np.asarray(ch)[2:-2, 2:-2], scene[2:-2, 2:-2], atol=1e-5
            )

    def test_matches_direct_numpy_reference(self, rng):
        """Interior pixels match an independent direct 5×5 correlation
        built from the published Malvar kernel matrices."""
        from raweditor_tpu.ops.demosaic import demosaic_malvar

        K_G = np.array([
            [0, 0, -1, 0, 0],
            [0, 0, 2, 0, 0],
            [-1, 2, 4, 2, -1],
            [0, 0, 2, 0, 0],
            [0, 0, -1, 0, 0],
        ], np.float32) / 8
        K_ROW = np.array([
            [0, 0, 0.5, 0, 0],
            [0, -1, 0, -1, 0],
            [-1, 4, 5, 4, -1],
            [0, -1, 0, -1, 0],
            [0, 0, 0.5, 0, 0],
        ], np.float32) / 8
        K_COL = K_ROW.T
        K_DIAG = np.array([
            [0, 0, -1.5, 0, 0],
            [0, 2, 0, 2, 0],
            [-1.5, 0, 6, 0, -1.5],
            [0, 2, 0, 2, 0],
            [0, 0, -1.5, 0, 0],
        ], np.float32) / 8

        def corr(img, k, y, x):
            return float((img[y - 2:y + 3, x - 2:x + 3] * k).sum())

        h, w = 14, 18
        mosaic = rng.random((h, w)).astype(np.float32)
        r, g, b = (np.asarray(c) for c in demosaic_malvar(mosaic))
        for y in range(2, h - 2):
            for x in range(2, w - 2):
                er, eg, eb = y % 2 == 0, None, None
                if y % 2 == 0 and x % 2 == 0:  # R site
                    want = (mosaic[y, x], corr(mosaic, K_G, y, x),
                            corr(mosaic, K_DIAG, y, x))
                elif y % 2 == 0:  # G in R row
                    want = (corr(mosaic, K_ROW, y, x), mosaic[y, x],
                            corr(mosaic, K_COL, y, x))
                elif x % 2 == 0:  # G in B row
                    want = (corr(mosaic, K_COL, y, x), mosaic[y, x],
                            corr(mosaic, K_ROW, y, x))
                else:  # B site
                    want = (corr(mosaic, K_DIAG, y, x),
                            corr(mosaic, K_G, y, x), mosaic[y, x])
                got = (r[y, x], g[y, x], b[y, x])
                for gv, wv in zip(got, want):
                    assert abs(gv - max(wv, 0.0)) < 1e-5, (y, x, got, want)

    def test_phase_translation(self, rng):
        """A GRBG-phase mosaic is the RGGB one shifted by a column: the
        overlapping interior must agree."""
        from raweditor_tpu.ops.demosaic import demosaic_malvar

        base = rng.random((16, 24)).astype(np.float32)
        r0, g0, b0 = (np.asarray(c) for c in demosaic_malvar(base))
        shifted = base[:, 1:]
        r1, g1, b1 = (np.asarray(c)
                      for c in demosaic_malvar(shifted, phase=(0, 1)))
        for a, c in ((r0, r1), (g0, g1), (b0, b1)):
            np.testing.assert_allclose(
                a[2:-2, 3:-3], c[2:-2, 2:-2][:, :a[2:-2, 3:-3].shape[1]],
                atol=1e-5,
            )

    def test_develop_accepts_malvar(self, rng):
        mosaic = rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)
        out = develop(mosaic, EditParams(), WB_NEUTRAL, IDENTITY,
                      demosaic_method="malvar")
        assert np.asarray(out).shape == (16, 24, 3)


class TestU16Export:
    def test_develop_u16_tracks_u8(self, rng):
        """The u16 finish must agree with the u8 path at 8-bit
        precision (top byte) and add real fractional precision below."""
        from raweditor_tpu.ops.develop import develop_u16

        mosaic = rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)
        p = EditParams(exposure=0.4, contrast=10.0)
        u8 = np.asarray(develop(mosaic, p, WB_NEUTRAL, IDENTITY))
        u16 = np.asarray(develop_u16(mosaic, p, WB_NEUTRAL, IDENTITY))
        assert u16.dtype == np.uint16
        # Quantizing u16 down to 8 bits reproduces the u8 render ±1.
        down = np.floor(u16.astype(np.float64) / 65535.0 * 255.0 + 0.5)
        assert np.abs(down - u8.astype(np.float64)).max() <= 1
        # And it isn't just u8 scaled up: low bits carry information.
        assert (u16 % 257 != 0).any()

    def test_u16_demotes_polynomial_transfers(self, rng):
        """The u8-accuracy polynomial transfers must quantize to u16
        through their EXACT parents (the CLAUDE.md 16-bit rule) even
        at the public develop_u16/finish_to_u16 surface, not just in
        the pipeline layers (code-review r3)."""
        from raweditor_tpu.ops.develop import develop_u16

        mosaic = rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)
        p = EditParams(exposure=0.3)
        for poly, exact in (("gamma22_poly", "gamma22"),
                            ("srgb_poly", "srgb")):
            a = np.asarray(develop_u16(mosaic, p, WB_NEUTRAL, IDENTITY,
                                       transfer=poly))
            b = np.asarray(develop_u16(mosaic, p, WB_NEUTRAL, IDENTITY,
                                       transfer=exact))
            assert np.array_equal(a, b), poly

    def test_tiff16_roundtrip_via_own_walker(self, tmp_path, rng):
        from raweditor_tpu.raw import tiff as T
        from raweditor_tpu.raw.tiff import TiffFile
        from raweditor_tpu.raw.tiff_out import write_tiff16

        rgb = rng.integers(0, 65536, size=(8, 12, 3), dtype=np.uint16)
        path = tmp_path / "o.tif"
        write_tiff16(path, rgb)
        tf = TiffFile(path.read_bytes())
        ifd = tf.ifds[0]
        assert ifd.get_scalar(T.IMAGE_WIDTH) == 12
        assert ifd.get_scalar(T.IMAGE_LENGTH) == 8
        assert ifd.get(T.BITS_PER_SAMPLE) == (16, 16, 16)
        assert ifd.get_scalar(T.PHOTOMETRIC) == 2
        off = ifd.get_scalar(T.STRIP_OFFSETS)
        cnt = ifd.get_scalar(T.STRIP_BYTE_COUNTS)
        data = path.read_bytes()[off:off + cnt]
        back = np.frombuffer(data, "<u2").reshape(8, 12, 3)
        assert (back == rgb).all()

    def test_engine_export_tiff(self, tmp_path, rng):
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.raw.synth import write_synthetic_raw

        raw = tmp_path / "t.dng"
        write_synthetic_raw(
            raw, rng.integers(0, 4096, size=(16, 24), dtype=np.uint16))
        eng = DevelopEngine.open(str(raw))
        out = eng.export(tmp_path / "o.tiff", EditParams(exposure=0.3))
        assert out.endswith(".tiff")
        from raweditor_tpu.raw.tiff import TiffFile

        tf = TiffFile((tmp_path / "o.tiff").read_bytes())
        assert len(tf.ifds) == 1

    def test_engine_export_tiff_xtrans_and_linear(self, tmp_path, rng):
        from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN
        from raweditor_tpu.params import EditParams as EP
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.raw.synth import (
            write_synthetic_linear_dng,
            write_synthetic_raw,
        )
        from raweditor_tpu.raw.tiff import TiffFile
        from raweditor_tpu.raw import tiff as T

        xt = tmp_path / "x.dng"
        write_synthetic_raw(
            xt, rng.integers(0, 4096, size=(12, 18), dtype=np.uint16),
            cfa=XTRANS_PATTERN)
        lin = tmp_path / "l.dng"
        write_synthetic_linear_dng(
            lin, rng.integers(0, 4096, size=(12, 18, 3),
                              dtype=np.uint16))
        for raw_path in (xt, lin):
            eng = DevelopEngine.open(str(raw_path), mode="accurate")
            out = tmp_path / (raw_path.stem + "16.tiff")
            eng.export(out, EP(exposure=0.2))
            tf = TiffFile(out.read_bytes())
            assert tf.ifds[0].get(T.BITS_PER_SAMPLE) == (16, 16, 16)


def test_slider_and_zoom_changes_never_recompile(rng):
    """Core design claim: EditParams, zoom/pan, and levels are traced —
    a slider tick or view change reuses the compiled program."""
    mosaic = rng.integers(0, 4096, size=(32, 48), dtype=np.uint16)
    wb = np.ones(3, np.float32)

    develop_preview._clear_cache()
    for i in range(6):
        p = EditParams(exposure=0.2 * i, contrast=5.0 * i,
                       saturation=float(i), temperature=0.1 * i)
        develop_preview(mosaic, p, wb, IDENTITY, out_w=16, out_h=12,
                        zoom=1.0 + 0.5 * i, pan_x=0.05 * i,
                        pan_y=-0.03 * i, white_level=4096.0 - i,
                        black_level=float(i))
    assert develop_preview._cache_size() == 1

    from raweditor_tpu.ops.develop import develop_rgba as dr
    dr._clear_cache()
    for i in range(4):
        dr(mosaic, EditParams(exposure=0.1 * i), wb, IDENTITY)
    assert dr._cache_size() == 1
