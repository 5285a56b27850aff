"""Lens corrections (radial distortion + lateral CA, ops/geometry.py)
— oracle parity, direction semantics, and pipeline integration.

Oracle: an independent float64 NumPy inverse-map resampler
implementing the documented model (rotation → radial polynomial about
the source center → per-channel CA magnification → clamp-to-edge
bilinear), written against the docstring, not the op."""

import math

import numpy as np
import pytest

from raweditor_tpu.params import EditParams


def _lens_ref(img, angle_deg, out_w, out_h, off_x, off_y, lens):
    """Float64 per-output-pixel reference of the composed map."""
    h, w = img.shape[:2]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    th = math.radians(angle_deg)
    ct, st = math.cos(th), math.sin(th)
    k1, k2, ca_r, ca_b = lens if lens else (0.0, 0.0, 0.0, 0.0)
    out = np.zeros((out_h, out_w, img.shape[2]))
    rnorm = cx * cx + cy * cy

    def bilerp(plane, sx, sy):
        x0 = min(max(math.floor(sx), 0), w - 1)
        y0 = min(max(math.floor(sy), 0), h - 1)
        fx = min(max(sx - x0, 0.0), 1.0)
        fy = min(max(sy - y0, 0.0), 1.0)
        x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
        top = plane[y0, x0] * (1 - fx) + plane[y0, x1] * fx
        bot = plane[y1, x0] * (1 - fx) + plane[y1, x1] * fx
        return top * (1 - fy) + bot * fy

    for y in range(out_h):
        for x in range(out_w):
            vx = x + off_x - cx
            vy = y + off_y - cy
            sx = ct * vx + st * vy + cx
            sy = -st * vx + ct * vy + cy
            dx, dy = sx - cx, sy - cy
            rn2 = (dx * dx + dy * dy) / rnorm
            base = 1.0 + k1 * rn2 + k2 * rn2 * rn2
            for ci, ca in enumerate((ca_r, 0.0, ca_b)):
                f = base * (1.0 + ca * 1e-4)
                out[y, x, ci] = bilerp(img[..., ci].astype(np.float64),
                                       cx + dx * f, cy + dy * f)
    return out


def _grad_img(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 20.0 + 200.0 * xx / w
    g = 20.0 + 200.0 * yy / h
    b = 230.0 - 100.0 * (xx + yy) / (w + h)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


class TestOracle:
    @pytest.mark.parametrize("lens,angle", [
        ((0.12, 0.0, 0.0, 0.0), 0.0),
        ((-0.2, 0.08, 0.0, 0.0), 0.0),
        ((0.1, 0.0, 30.0, -25.0), 0.0),
        ((0.15, -0.05, 12.0, 8.0), 3.5),
    ])
    def test_u8_matches_reference(self, lens, angle):
        from raweditor_tpu.ops.geometry import (
            _resolve_geometry,
            rotate_crop_u8,
        )

        img = _grad_img()
        got = np.asarray(rotate_crop_u8(img, angle, lens=lens))
        h, w = img.shape[:2]
        out_w, out_h, off_x, off_y = _resolve_geometry(h, w, angle, None)
        want = _lens_ref(img, angle, out_w, out_h, off_x, off_y, lens)
        want = np.clip(np.floor(want + 0.5), 0, 255).astype(np.int32)
        assert np.abs(got.astype(np.int32) - want).max() <= 1

    def test_words_matches_u8(self):
        from raweditor_tpu.ops.geometry import (
            rotate_crop_rgba_words,
            rotate_crop_u8,
        )

        img = _grad_img()
        lens = (0.1, -0.02, 15.0, -10.0)
        words = (img[..., 0].astype(np.uint32)
                 | (img[..., 1].astype(np.uint32) << 8)
                 | (img[..., 2].astype(np.uint32) << 16)
                 | np.uint32(0xFF000000))
        got_w = np.asarray(rotate_crop_rgba_words(words, lens=lens))
        got_u8 = np.asarray(rotate_crop_u8(img, lens=lens))
        unpacked = np.stack([(got_w >> s) & 0xFF for s in (0, 8, 16)],
                            axis=-1).astype(np.int32)
        # Same map on byte-identical planes (the words path samples
        # the same f32 values): allow 1 LSB for the x255 round trip.
        assert np.abs(unpacked - got_u8.astype(np.int32)).max() <= 1

    def test_u16_scales(self):
        from raweditor_tpu.ops.geometry import rotate_crop_u16

        img16 = (_grad_img().astype(np.uint16) * 257)
        lens = (0.2, 0.0, 0.0, 0.0)
        got = np.asarray(rotate_crop_u16(img16, lens=lens))
        assert got.shape == img16.shape and got.dtype == np.uint16
        assert (got != img16).any()


class TestSemantics:
    def test_identity_at_zero(self):
        from raweditor_tpu.ops.geometry import rotate_crop_u8

        img = _grad_img()
        out = rotate_crop_u8(img, 0.0, None, lens=(0.0, 0.0, 0.0, 0.0))
        assert out is img  # the fast path, not a resample
        assert rotate_crop_u8(img, 0.0, None, lens=None) is img

    def test_center_invariant(self):
        from raweditor_tpu.ops.geometry import rotate_crop_u8

        img = _grad_img(41, 57)  # odd dims: exact center pixel
        got = np.asarray(rotate_crop_u8(img, lens=(0.3, 0.1, 40.0, 40.0)))
        assert (got[20, 28] == img[20, 28]).all()

    def test_positive_k1_pulls_content_inward(self):
        """An impulse at mid-radius must move toward the center for
        k1 > 0 (pincushion correction) and outward for k1 < 0."""
        from raweditor_tpu.ops.geometry import rotate_crop_u8

        img = np.zeros((41, 41, 3), np.uint8)
        img[20, 32] = 255  # 12 px right of center
        inward = np.asarray(rotate_crop_u8(img, lens=(0.5, 0.0, 0.0, 0.0)))
        outward = np.asarray(rotate_crop_u8(img, lens=(-0.3, 0.0, 0.0, 0.0)))

        def centroid_x(o):
            ys, xs = np.nonzero(o[..., 0])
            wts = o[ys, xs, 0].astype(np.float64)
            return float((xs * wts).sum() / wts.sum())

        assert centroid_x(inward) < 32 - 0.5
        assert centroid_x(outward) > 32 + 0.5

    def test_ca_moves_only_that_channel(self):
        from raweditor_tpu.ops.geometry import rotate_crop_u8

        img = _grad_img()
        base = np.asarray(rotate_crop_u8(img, lens=(0.1, 0.0, 0.0, 0.0)))
        ca = np.asarray(rotate_crop_u8(img, lens=(0.1, 0.0, 50.0, 0.0)))
        assert (ca[..., 0] != base[..., 0]).any()
        np.testing.assert_array_equal(ca[..., 1], base[..., 1])
        np.testing.assert_array_equal(ca[..., 2], base[..., 2])

    def test_non_finite_rejected(self):
        from raweditor_tpu.ops.geometry import rotate_crop_u8

        with pytest.raises(ValueError, match="finite"):
            rotate_crop_u8(_grad_img(), lens=(float("nan"), 0, 0, 0))


class TestPipeline:
    @pytest.fixture
    def raw_path(self, tmp_path, rng):
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "x.dng"
        mosaic = rng.integers(0, 4095, (64, 96)).astype(np.uint16)
        write_synthetic_raw(str(path), mosaic)
        return str(path)

    def test_engine_export_with_lens(self, raw_path, tmp_path):
        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate")
        a = tmp_path / "a.png"
        b = tmp_path / "b.png"
        c = tmp_path / "c.jpg"
        eng.export(str(a), EditParams())
        eng.export(str(b), EditParams(), lens=(0.25, 0.0, 20.0, -20.0))
        eng.export(str(c), EditParams(), lens=(0.25, 0.0, 20.0, -20.0))
        from PIL import Image

        ia = np.asarray(Image.open(a))
        ib = np.asarray(Image.open(b))
        assert ia.shape == ib.shape and (ia != ib).any()
        assert c.stat().st_size > 0

    def test_engine_tiff16_with_lens(self, raw_path, tmp_path):
        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate")
        t = tmp_path / "t.tiff"
        eng.export_tiff16(str(t), EditParams(), lens=(0.2, 0.0, 0.0, 0.0))
        assert t.stat().st_size > 0

    def test_batch_export_with_lens(self, tmp_path, rng):
        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "m.dng"
        mosaic = rng.integers(0, 4095, (64, 96)).astype(np.uint16)
        write_synthetic_raw(str(path), mosaic)
        rep = run_batch_export(
            [ExportJob(str(path), str(tmp_path / "lens.png")),
             ExportJob(str(path), str(tmp_path / "plain.png"))],
            mesh=None, batch_size=1, lens=(0.25, 0.0, 0.0, 0.0))
        assert rep.succeeded == 2 and not rep.failed
        rep2 = run_batch_export(
            [ExportJob(str(path), str(tmp_path / "noplain.png"))],
            mesh=None, batch_size=1)
        assert rep2.succeeded == 1
        from PIL import Image

        a = np.asarray(Image.open(tmp_path / "lens.png"))
        b = np.asarray(Image.open(tmp_path / "noplain.png"))
        assert (a != b).any()
        # Batch uniform geometry: the engine single-image path agrees.
        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(str(path), mode="parity")
        solo = tmp_path / "solo.png"
        eng.export(str(solo), EditParams(), lens=(0.25, 0.0, 0.0, 0.0))
        s = np.asarray(Image.open(solo))
        np.testing.assert_array_equal(a, s)

    def test_cli_lens_flags(self, raw_path, tmp_path, monkeypatch):
        from raweditor_tpu.cli import main

        out = tmp_path / "o.png"
        ref = tmp_path / "r.png"
        assert main(["develop", raw_path, "-o", str(out),
                     "--lens-k1", "0.3", "--lens-ca-r", "25"]) in (0, None)
        assert main(["develop", raw_path, "-o", str(ref)]) in (0, None)
        from PIL import Image

        a = np.asarray(Image.open(out))
        b = np.asarray(Image.open(ref))
        assert (a != b).any()
