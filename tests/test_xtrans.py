"""X-Trans (6x6 CFA) support — a capability beyond the Bayer-only
reference."""

import numpy as np
import pytest

from raweditor_tpu.ops.cfa_generic import (
    XTRANS_PATTERN,
    demosaic_xtrans,
    is_xtrans,
    nearest_offsets,
)
from raweditor_tpu.params import EditParams
from raweditor_tpu.pipeline.engine import DevelopEngine
from raweditor_tpu.raw.decode import decode_raw
from raweditor_tpu.raw.synth import write_synthetic_raw


def _mosaic_xtrans(r, g, b):
    """Mosaic channel planes through the X-Trans grid."""
    h, w = r.shape
    grid = np.array([{"R": 0, "G": 1, "B": 2}[c] for c in XTRANS_PATTERN]
                    ).reshape(6, 6)
    sites = grid[np.arange(h)[:, None] % 6, np.arange(w)[None, :] % 6]
    return np.where(sites == 0, r, np.where(sites == 1, g, b)).astype(
        np.uint16
    )


def test_pattern_sanity():
    assert len(XTRANS_PATTERN) == 36
    assert is_xtrans(XTRANS_PATTERN)
    assert not is_xtrans("RGGB")
    # Real X-Trans: 20 green, 8 red, 8 blue sites.
    assert XTRANS_PATTERN.count("G") == 20
    assert XTRANS_PATTERN.count("R") == 8
    assert XTRANS_PATTERN.count("B") == 8


def test_nearest_offsets_complete():
    table = nearest_offsets(XTRANS_PATTERN, 6, 6)
    assert len(table) == 36 * 3
    # A site of channel c maps to offset (0, 0) for its own channel.
    grid = np.array([{"R": 0, "G": 1, "B": 2}[c] for c in XTRANS_PATTERN]
                    ).reshape(6, 6)
    for py in range(6):
        for px in range(6):
            assert table[(py, px, grid[py, px])] == (0, 0)


def test_constant_field_uniform(rng):
    """Constant per-channel planes must reconstruct exactly in the
    interior (edge clamping may cross channel sites — a 2-pixel border
    effect inherent to clamp padding on a 6×6 pattern)."""
    h, w = 18, 24
    r = np.full((h, w), 1000)
    g = np.full((h, w), 2000)
    b = np.full((h, w), 3000)
    mosaic = _mosaic_xtrans(r, g, b).astype(np.float32)
    rr, gg, bb = demosaic_xtrans(mosaic)
    inner = (slice(2, -2), slice(2, -2))
    assert (np.asarray(rr)[inner] == 1000).all()
    assert (np.asarray(gg)[inner] == 2000).all()
    assert (np.asarray(bb)[inner] == 3000).all()


def test_engine_end_to_end_xtrans(tmp_path, rng):
    h, w = 24, 36
    r = rng.integers(0, 4096, size=(h, w))
    g = rng.integers(0, 4096, size=(h, w))
    b = rng.integers(0, 4096, size=(h, w))
    mosaic = _mosaic_xtrans(r, g, b)
    path = tmp_path / "xtrans.dng"
    write_synthetic_raw(path, mosaic, cfa=XTRANS_PATTERN)
    raw = decode_raw(path)
    assert raw.cfa_pattern == XTRANS_PATTERN

    eng = DevelopEngine.open(path, mode="accurate")
    assert eng.xtrans_pattern == XTRANS_PATTERN
    full = eng.full(EditParams())
    assert full.shape == (h, w, 3)
    prev = eng.preview(EditParams(exposure=0.5))
    assert prev.shape == (eng.preview_h, eng.preview_w, 3)
    hist = eng.histogram(EditParams())
    assert hist.shape == (3, 256)
    out = eng.export(tmp_path / "x.jpg", EditParams())
    import os

    assert os.path.exists(out)


def test_parity_mode_ignores_xtrans(tmp_path, rng):
    """Parity mode replicates the reference, which would run its Bayer
    stencil regardless — so no xtrans routing."""
    mosaic = rng.integers(0, 4096, size=(12, 12), dtype=np.uint16)
    write_synthetic_raw(tmp_path / "x.dng", mosaic, cfa=XTRANS_PATTERN)
    eng = DevelopEngine.open(tmp_path / "x.dng", mode="parity")
    assert eng.xtrans_pattern is None


def test_batch_export_xtrans_accurate(tmp_path, rng):
    """Accurate-mode batch export must handle X-Trans files (regression:
    phase_of raised and quarantined every 6x6-CFA job)."""
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export

    h, w = 12, 24
    mosaic = _mosaic_xtrans(
        rng.integers(0, 4096, size=(h, w)),
        rng.integers(0, 4096, size=(h, w)),
        rng.integers(0, 4096, size=(h, w)),
    )
    path = tmp_path / "x.dng"
    write_synthetic_raw(path, mosaic, cfa=XTRANS_PATTERN)
    bayer = tmp_path / "b.dng"
    write_synthetic_raw(
        bayer, rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    )
    jobs = [
        ExportJob(raw_path=str(path),
                  out_path=str(tmp_path / "out" / "x.jpg")),
        ExportJob(raw_path=str(bayer),
                  out_path=str(tmp_path / "out" / "b.jpg")),
    ]
    report = run_batch_export(jobs, batch_size=2, mode="accurate")
    assert report.succeeded == 2 and not report.failed


def test_xtrans_16bit_tiff_uses_full_range(tmp_path, rng):
    """develop_xtrans(bits=16) must actually quantize to u16 — it used
    to silently return u8 that write_tiff16 widened into a near-black
    16-bit image (code-review r3)."""
    from raweditor_tpu.ops.develop import develop_xtrans

    h, w = 12, 24
    mosaic = _mosaic_xtrans(
        np.full((h, w), 3000), np.full((h, w), 3000),
        np.full((h, w), 3000)).astype(np.uint16)
    out = np.asarray(develop_xtrans(
        mosaic, EditParams(), np.ones(3, np.float32),
        np.eye(3, dtype=np.float32), bits=16))
    assert out.dtype == np.uint16
    assert out.max() > 255  # real 16-bit quantization
    # Engine path: a .tif export of an X-Trans file reads back bright.
    path = tmp_path / "x.dng"
    write_synthetic_raw(path, mosaic, cfa=XTRANS_PATTERN)
    eng = DevelopEngine.open(path, mode="accurate")
    eng.export_tiff16(tmp_path / "x.tif", EditParams())
    # PIL downconverts 16-bit RGB to u8 — read the samples with the
    # repo's own TIFF walker instead.
    from raweditor_tpu.raw.tiff import TiffFile

    tf = TiffFile((tmp_path / "x.tif").read_bytes())
    strips = b"".join(tf.strip_data(tf.ifds[0]))
    samples = np.frombuffer(strips, "<u2")
    assert samples.max() > 10000  # real 16-bit range, not widened u8
    # rgba + bits=16 is contradictory and must error.
    with pytest.raises(ValueError, match="mutually exclusive"):
        develop_xtrans(mosaic, EditParams(), np.ones(3, np.float32),
                       np.eye(3, dtype=np.float32), rgba=True, bits=16)


def test_non_square_pattern_rejected(rng):
    """int(sqrt) truncation used to silently mis-grid non-square
    patterns (code-review r3)."""
    from raweditor_tpu.ops.develop import develop_xtrans

    mosaic = rng.integers(0, 4096, size=(8, 16), dtype=np.uint16)
    with pytest.raises(ValueError, match="not square"):
        develop_xtrans(mosaic, EditParams(), np.ones(3, np.float32),
                       np.eye(3, dtype=np.float32), pattern="RGGBRGGB")


def test_xtrans_preview_matches_full_subsample(tmp_path, rng):
    """Sampled X-Trans preview equals strided sampling of the full
    develop at integer decimation."""
    from raweditor_tpu.ops.develop import (
        develop_xtrans,
        develop_xtrans_preview,
    )

    h, w = 24, 36
    mosaic = _mosaic_xtrans(
        rng.integers(0, 4096, size=(h, w)),
        rng.integers(0, 4096, size=(h, w)),
        rng.integers(0, 4096, size=(h, w)),
    )
    wb = np.ones(3, np.float32)
    eye = np.eye(3, dtype=np.float32)
    from raweditor_tpu.params import EditParams as EP

    full = np.asarray(develop_xtrans(mosaic, EP(), wb, eye))
    prev = np.asarray(
        develop_xtrans_preview(mosaic, EP(), wb, eye, out_w=12, out_h=8)
    )
    # Fragment-center sampling with 3x decimation: xi = 3*px+1.
    xi = (np.arange(12) * 3 + 1).astype(int)
    yi = (np.arange(8) * 3 + 1).astype(int)
    assert (prev == full[yi][:, xi]).all()


class TestGradGeneric:
    """Gradient-weighted generic demosaic (the quality tier above
    'smooth')."""

    @staticmethod
    def _mosaic_of(scene_rgb, pattern, ph, pw):
        from raweditor_tpu.ops.cfa_generic import _CHAN

        h, w = scene_rgb.shape[:2]
        grid = np.array([_CHAN[c] for c in pattern]).reshape(ph, pw)
        chan = grid[np.arange(h)[:, None] % ph,
                    np.arange(w)[None, :] % pw]
        return np.take_along_axis(
            scene_rgb, chan[..., None], axis=2)[..., 0]

    def test_constant_scene_exact(self):
        from raweditor_tpu.ops.cfa_generic import (
            XTRANS_PATTERN,
            demosaic_grad_generic,
        )

        mosaic = np.full((18, 24), 0.4, np.float32)
        for ch in demosaic_grad_generic(mosaic, XTRANS_PATTERN, 6, 6):
            np.testing.assert_allclose(np.asarray(ch), 0.4, atol=1e-5)

    def test_sensor_sites_pass_through(self, rng):
        from raweditor_tpu.ops.cfa_generic import (
            XTRANS_PATTERN,
            _CHAN,
            demosaic_grad_generic,
        )

        h, w = 12, 18
        mosaic = rng.random((h, w)).astype(np.float32)
        planes = demosaic_grad_generic(mosaic, XTRANS_PATTERN, 6, 6)
        grid = np.array([_CHAN[c] for c in XTRANS_PATTERN]).reshape(6, 6)
        for y in range(h):
            for x in range(w):
                chan = grid[y % 6, x % 6]
                assert np.asarray(planes[chan])[y, x] == mosaic[y, x]

    @pytest.mark.parametrize("pattern,ph", [("RGGB", 2), (None, 6)])
    def test_beats_smooth_on_edges(self, pattern, ph):
        """Vertical stripes: directional G interpolation follows the
        stripe instead of averaging across it, so reconstruction error
        drops vs the isotropic 'smooth' kernel."""
        from raweditor_tpu.ops.cfa_generic import (
            XTRANS_PATTERN,
            demosaic_grad_generic,
            demosaic_smooth_generic,
        )

        pat = pattern or XTRANS_PATTERN
        h, w = 36, 42
        xx = np.arange(w, dtype=np.float32)[None, :]
        lum = 0.25 + 0.5 * (np.sin(xx / 2.0) > 0)  # hard stripes
        lum = np.repeat(lum, h, axis=0)
        scene = np.stack([0.8 * lum, lum, 0.6 * lum], axis=-1)
        mosaic = self._mosaic_of(scene, pat, ph, ph).astype(np.float32)
        grad = demosaic_grad_generic(mosaic, pat, ph, ph)
        smooth = demosaic_smooth_generic(mosaic, pat, ph, ph)
        c = 4  # skip frame edges
        err_g = sum(
            np.abs(np.asarray(p)[c:-c, c:-c]
                   - scene[c:-c, c:-c, i]).mean()
            for i, p in enumerate(grad))
        err_s = sum(
            np.abs(np.asarray(p)[c:-c, c:-c]
                   - scene[c:-c, c:-c, i]).mean()
            for i, p in enumerate(smooth))
        # Directional interpolation + chroma refinement cuts the
        # isotropic kernel's error roughly in half even on these
        # worst-case hard stripes (measured 0.52-0.55); 0.65 leaves
        # margin while still failing if either pass regresses.
        assert err_g < 0.65 * err_s, (err_g, err_s)

    def test_engine_accurate_grad_end_to_end(self, tmp_path, rng):
        from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.raw.synth import write_synthetic_raw

        h, w = 24, 36
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        scene = 0.5 + 0.3 * np.sin(xx / 4.0) * np.cos(yy / 5.0)
        mosaic = (scene * 4095).astype(np.uint16)
        path = tmp_path / "x.dng"
        write_synthetic_raw(path, mosaic, cfa=XTRANS_PATTERN)
        eng = DevelopEngine.open(str(path), mode="accurate",
                                 demosaic_method="grad")
        out = np.asarray(eng.full(EditParams()))
        assert out.shape == (h, w, 3)
        assert out.std() > 1


class TestSmoothGeneric:
    """Normalized-convolution generic demosaic."""

    def test_bayer_reduces_to_bilinear(self, rng):
        """On RGGB with the radius-1 tent the normalized convolution is
        exactly the bilinear kernel — everywhere, edges included (both
        use edge-clamped values with equal weights over the same taps).
        """
        from raweditor_tpu.ops.cfa_generic import demosaic_smooth_generic
        from raweditor_tpu.ops.demosaic import demosaic_bilinear

        mosaic = rng.random((16, 24)).astype(np.float32)
        got = demosaic_smooth_generic(mosaic, "RGGB", 2, 2)
        want = demosaic_bilinear(mosaic)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=1e-6)

    def test_constant_scene_exact(self):
        from raweditor_tpu.ops.cfa_generic import (
            XTRANS_PATTERN,
            demosaic_smooth_generic,
        )

        mosaic = np.full((18, 24), 0.4, np.float32)
        for ch in demosaic_smooth_generic(mosaic, XTRANS_PATTERN, 6, 6):
            np.testing.assert_allclose(np.asarray(ch), 0.4, atol=1e-6)

    def test_sensor_sites_pass_through(self, rng):
        from raweditor_tpu.ops.cfa_generic import (
            XTRANS_PATTERN,
            _CHAN,
            demosaic_smooth_generic,
        )

        h, w = 12, 18
        mosaic = rng.random((h, w)).astype(np.float32)
        planes = demosaic_smooth_generic(mosaic, XTRANS_PATTERN, 6, 6)
        grid = np.array([_CHAN[c] for c in XTRANS_PATTERN]).reshape(6, 6)
        for y in range(h):
            for x in range(w):
                chan = grid[y % 6, x % 6]
                assert np.asarray(planes[chan])[y, x] == mosaic[y, x]

    def test_smoother_than_nearest(self, rng):
        """On a smooth scene the normalized convolution has lower
        reconstruction error than nearest-site copying."""
        from raweditor_tpu.ops.cfa_generic import (
            XTRANS_PATTERN,
            demosaic_nearest_generic,
            demosaic_smooth_generic,
        )

        h, w = 30, 36
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        scene = 0.5 + 0.3 * np.sin(xx / 5.0) * np.cos(yy / 7.0)
        near = demosaic_nearest_generic(scene, XTRANS_PATTERN, 6, 6)
        smooth = demosaic_smooth_generic(scene, XTRANS_PATTERN, 6, 6)
        for n, s in zip(near, smooth):
            err_n = np.abs(np.asarray(n)[2:-2, 2:-2] - scene[2:-2, 2:-2]).mean()
            err_s = np.abs(np.asarray(s)[2:-2, 2:-2] - scene[2:-2, 2:-2]).mean()
            assert err_s < err_n
