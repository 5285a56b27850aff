"""Output-stage geometry (ops/geometry.py): straighten + crop.

Beyond the reference, which renders mosaics as stored (its only
geometry is the zoom/pan view transform, reference: main.rs:795-930).
"""

import numpy as np
import pytest

from raweditor_tpu.ops.geometry import (
    largest_upright_rect,
    rotate_crop_rgba_words,
    rotate_crop_u8,
    rotate_crop_u16,
)


def _img(rng, h=60, w=80):
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


class TestRect:
    def test_identity_at_zero(self):
        assert largest_upright_rect(80, 60, 0.0) == (80, 60)

    def test_right_angle_round_trip(self):
        assert largest_upright_rect(64, 64, 90.0) == (64, 64)

    def test_45_square(self):
        cw, ch = largest_upright_rect(64, 64, 45.0)
        assert cw == ch == int(64 / np.sqrt(2))

    def test_monotone_shrink(self):
        prev = (80, 60)
        for deg in (1, 3, 7, 15, 30):
            cur = largest_upright_rect(80, 60, deg)
            assert cur[0] <= prev[0] and cur[1] <= prev[1]
            prev = cur

    def test_aspect_preserved(self):
        cw, ch = largest_upright_rect(4000, 3000, 5.0)
        assert abs(cw / ch - 4000 / 3000) < 0.01


class TestRotateCrop:
    def test_identity(self, rng):
        img = _img(rng)
        out = np.asarray(rotate_crop_u8(img, 0.0))
        assert (out == img).all()

    def test_pure_crop_is_slice(self, rng):
        img = _img(rng)
        out = np.asarray(rotate_crop_u8(img, 0.0, crop=(10, 5, 32, 24)))
        assert (out == img[5:29, 10:42]).all()

    def test_crop_validation(self, rng):
        img = _img(rng)
        with pytest.raises(ValueError):
            rotate_crop_u8(img, 0.0, crop=(70, 0, 32, 24))  # exceeds
        with pytest.raises(ValueError):
            rotate_crop_u8(img, 0.0, crop=(0, 0, 0, 24))  # empty

    def test_rot90_gradient(self, rng):
        """A horizontal gradient rotated 90° becomes a vertical one —
        and the DIRECTION pins the sign convention: rotating a
        dark-left/bright-right ramp CLOCKWISE (positive angle) puts
        the bright edge at the BOTTOM. (The first version of this
        assert accepted both directions — a flipped sin would have
        passed; code-review r3.)"""
        g = np.tile(np.arange(64, dtype=np.uint8)[None, :, None],
                    (64, 1, 3))
        out = np.asarray(rotate_crop_u8(g, 90.0))
        # Constant along rows, monotone non-decreasing down columns.
        assert np.abs(np.diff(out[1:-1, :, 0], axis=1)).max() == 0
        col = out[:, 0, 0].astype(int)
        assert col[0] < col[-1]          # bright edge lands at bottom
        assert np.all(np.diff(col) >= 0)

    def test_small_angle_correlates(self, rng):
        """±3° then the inverse lands close to the original center
        region (bilinear round trip)."""
        img = _img(rng, 96, 128).astype(np.uint8)
        once = np.asarray(rotate_crop_u8(img, 3.0, crop=(0, 0, 128, 96)))
        back = np.asarray(rotate_crop_u8(once, -3.0,
                                         crop=(0, 0, 128, 96)))
        c0 = img[32:64, 48:80].astype(float)
        c1 = back[32:64, 48:80].astype(float)
        # Random-noise content blurs under double bilinear; correlation
        # is the robust check, not per-pixel distance.
        cc = np.corrcoef(c0.ravel(), c1.ravel())[0, 1]
        assert cc > 0.5

    def test_words_matches_u8(self, rng):
        img = _img(rng)
        w32 = (img[..., 0].astype(np.uint32)
               | (img[..., 1].astype(np.uint32) << 8)
               | (img[..., 2].astype(np.uint32) << 16)
               | np.uint32(0xFF000000))
        rw = np.asarray(rotate_crop_rgba_words(w32, 4.0))
        ru = np.asarray(rotate_crop_u8(img, 4.0))
        bytes_ = rw.view(np.uint8).reshape(rw.shape + (4,))[..., :3]
        assert (bytes_ == ru).all()

    def test_u16_consistent(self, rng):
        img = _img(rng)
        r8 = np.asarray(rotate_crop_u8(img, 4.0)).astype(int)
        r16 = np.asarray(
            rotate_crop_u16(img.astype(np.uint16) * 257, 4.0)).astype(int)
        # Same resampling; 16-bit carries the same values ×257 within
        # rounding.
        assert np.abs(r16 - r8 * 257).max() <= 257


class TestEngineExport:
    @pytest.fixture
    def raw_path(self, tmp_path, rng):
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "g.dng"
        write_synthetic_raw(
            str(path),
            rng.integers(0, 4095, (64, 96)).astype(np.uint16))
        return str(path)

    def test_export_rotate_crop_all_formats(self, raw_path, tmp_path):
        from PIL import Image

        from raweditor_tpu.params import EditParams
        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate")
        p = EditParams(exposure=0.2)
        for name, kw, want in (
            ("r.jpg", dict(rotate=5.0), None),
            ("c.png", dict(crop=(8, 8, 48, 32)), (48, 32)),
            ("rc.tiff", dict(rotate=-3.0, crop=(4, 4, 80, 48)),
             (80, 48)),
        ):
            out = tmp_path / name
            eng.export(str(out), p, **kw)
            im = Image.open(out)
            if want is not None:
                assert im.size == want
            else:
                from raweditor_tpu.ops.geometry import (
                    largest_upright_rect,
                )

                assert im.size == largest_upright_rect(96, 64, 5.0)

    def test_jpeg_planes_path_geometry(self, raw_path, tmp_path):
        """Even-dim crop keeps the native planes path; output matches
        the PIL fallback route dimensionally and visually."""
        from PIL import Image

        from raweditor_tpu.params import EditParams
        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate")
        out = tmp_path / "planes.jpg"
        eng.export(str(out), EditParams(), crop=(8, 8, 64, 40),
                   quality=92)
        assert Image.open(out).size == (64, 40)

    def test_cli_crop_parse_errors(self):
        from raweditor_tpu.cli import _parse_crop

        assert _parse_crop(None) is None
        assert _parse_crop("1,2,3,4") == (1, 2, 3, 4)
        with pytest.raises(SystemExit):
            _parse_crop("1,2,3")
        with pytest.raises(SystemExit):
            _parse_crop("a,b,c,d")

    def test_auto_orient_guard(self, tmp_path, rng):
        """Geometry + auto_orient on a rotated shot is rejected (the
        rectangle would land on the wrong region; code-review r3)."""
        from raweditor_tpu.params import EditParams
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "o6.dng"
        write_synthetic_raw(
            str(path),
            rng.integers(0, 4095, (64, 96)).astype(np.uint16),
            orientation=6)
        eng = DevelopEngine.open(str(path), mode="accurate",
                                 auto_orient=True)
        with pytest.raises(ValueError):
            eng.export(str(tmp_path / "x.jpg"), EditParams(),
                       crop=(0, 0, 32, 32))
        with pytest.raises(ValueError):
            eng.export_tiff16(str(tmp_path / "x.tiff"), EditParams(),
                              rotate=3.0)
        # Orientation 1 composes fine.
        path1 = tmp_path / "o1.dng"
        write_synthetic_raw(
            str(path1),
            rng.integers(0, 4095, (64, 96)).astype(np.uint16))
        eng1 = DevelopEngine.open(str(path1), mode="accurate",
                                  auto_orient=True)
        eng1.export(str(tmp_path / "ok.jpg"), EditParams(),
                    crop=(0, 0, 32, 32))

    def test_batch_export_uniform_geometry(self, tmp_path, rng):
        """run_batch_export(rotate=, crop=) applies the same geometry
        to every image and matches the single-image engine export
        byte-for-byte (PNG is lossless)."""
        from PIL import Image

        from raweditor_tpu.params import EditParams
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )
        from raweditor_tpu.raw.synth import write_synthetic_raw

        paths = []
        for i in range(2):
            path = tmp_path / f"b{i}.dng"
            write_synthetic_raw(
                str(path),
                rng.integers(0, 4095, (64, 96)).astype(np.uint16))
            paths.append(str(path))
        p = EditParams(exposure=0.1)
        jobs = [ExportJob(pth, str(tmp_path / f"batch{i}.png"), p)
                for i, pth in enumerate(paths)]
        rep = run_batch_export(jobs, batch_size=2, rotate=4.0,
                               crop=(6, 6, 64, 40))
        assert rep.succeeded == 2 and not rep.failed
        for i, pth in enumerate(paths):
            single = tmp_path / f"single{i}.png"
            DevelopEngine.open(pth).export(str(single), p, rotate=4.0,
                                           crop=(6, 6, 64, 40))
            a = np.asarray(Image.open(single))
            b = np.asarray(Image.open(tmp_path / f"batch{i}.png"))
            assert a.shape == b.shape == (40, 64, 4)
            assert (a == b).all()

    def test_batch_export_geometry_jpeg_and_tiff(self, tmp_path, rng):
        from PIL import Image

        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "g.dng"
        write_synthetic_raw(
            str(path), rng.integers(0, 4095, (64, 96)).astype(np.uint16))
        rep = run_batch_export(
            [ExportJob(str(path), str(tmp_path / "r.jpg"))],
            batch_size=1, rotate=5.0)
        assert rep.succeeded == 1
        from raweditor_tpu.ops.geometry import largest_upright_rect

        assert (Image.open(tmp_path / "r.jpg").size
                == largest_upright_rect(96, 64, 5.0))
        rep = run_batch_export(
            [ExportJob(str(path), str(tmp_path / "r.tif"))],
            batch_size=1, bits=16, crop=(0, 0, 48, 32))
        assert rep.succeeded == 1
        assert Image.open(tmp_path / "r.tif").size == (48, 32)


# -- perspective (keystone) correction -----------------------------------

class TestKeystone:
    def _grad(self, h=40, w=64):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([(xx * 255 / (w - 1)),
                        (yy * 255 / (h - 1)),
                        np.full((h, w), 128)], -1)
        return img.astype(np.uint8)

    def test_zero_is_identity(self):
        img = self._grad()
        out = rotate_crop_u8(img, 0.0, None, perspective=(0.0, 0.0))
        assert out is img  # the resolve collapses zeros to None

    def test_auto_shrink_keeps_samples_in_frame(self):
        """The default rect shrinks by 1/(1+|k|) per axis so the
        widened edge never samples outside the frame (no clamp-to-edge
        corner streaks — the rotation-auto-crop policy applied to the
        keystone warp)."""
        img = self._grad(h=40, w=64)
        out = np.asarray(rotate_crop_u8(img, 0.0, None,
                                        perspective=(0.3, 0.0)))
        assert out.shape[1] == 48  # int(64/1.3)=49, parity-adjusted to 48
        assert out.shape[0] == 40             # kh = 0: height kept
        # bottom row (widest sampling) corners: a clamp streak would
        # repeat the edge gradient value; the gradient must keep
        # strictly increasing instead.
        bottom = out[-1, :, 0].astype(int)
        assert bottom[1] > bottom[0] and bottom[-1] > bottom[-2]

    def test_center_row_and_column_invariant(self):
        """kv warps the horizontal scale BY HEIGHT: the center row
        (v=0) must be an exact centered crop of the source center row;
        dually for kh and the center column."""
        # odd dims: the exact center row/column exist as integers and
        # the parity-preserving shrink keeps offsets integral
        img = self._grad(h=41, w=65)
        out = np.asarray(rotate_crop_u8(img, 0.0, None,
                                        perspective=(0.3, 0.0)))
        ow = out.shape[1]
        off = (65 - ow) // 2
        np.testing.assert_array_equal(
            out[(out.shape[0] - 1) // 2],
            img[20, off:off + ow])
        out3 = np.asarray(rotate_crop_u8(img, 0.0, None,
                                         perspective=(0.0, 0.3)))
        oh = out3.shape[0]
        offy = (41 - oh) // 2
        np.testing.assert_array_equal(
            out3[:, (out3.shape[1] - 1) // 2],
            img[offy:offy + oh, 32])

    def test_top_row_samples_match_model(self):
        """Output top row with kv reads source x = u·(1+kv·v)·cx — the
        trapezoid inversion; check a sampled point against the model."""
        img = self._grad(h=41, w=65)
        kv = 0.3
        out = np.asarray(rotate_crop_u8(img, 0.0, None,
                                        perspective=(kv, 0.0)))
        oh, ow = out.shape[:2]
        off_x, off_y = (65 - ow) / 2.0, (41 - oh) / 2.0
        cx, cy = 32.0, 20.0
        xo, yo = ow - 2, 0  # near the top-right of the shrunk rect
        u = (xo + off_x - cx) / cx
        v = (yo + off_y - cy) / cy
        sx = u * (1 + kv * v) * cx + cx
        expect = float(img[int(round(yo + off_y)),
                           int(round(sx)), 0])
        got = float(out[yo, xo, 0])
        assert abs(got - expect) <= 4  # bilinear + rounding

    def test_validation(self):
        img = self._grad()
        with pytest.raises(ValueError, match="finite"):
            rotate_crop_u8(img, 0.0, None,
                           perspective=(float("nan"), 0.0))
        with pytest.raises(ValueError, match="0.95"):
            rotate_crop_u8(img, 0.0, None, perspective=(1.2, 0.0))

    def test_composes_with_rotate_and_lens(self):
        img = self._grad()
        out = np.asarray(rotate_crop_u8(
            img, 3.0, None, lens=(0.05, 0.0, 0.0, 0.0),
            perspective=(0.2, -0.1)))
        assert out.shape[2] == 3 and out.dtype == np.uint8

    def test_batch_matches_single(self):
        from raweditor_tpu.ops.geometry import (
            rotate_crop_rgba_words_batch,
            rotate_crop_rgba_words,
        )
        from raweditor_tpu.ops.extras import planes_to_words

        rng = np.random.default_rng(0)
        imgs = rng.random((3, 24, 32, 3)).astype(np.float32)
        words = np.stack([np.asarray(planes_to_words(
            i[..., 0], i[..., 1], i[..., 2])) for i in imgs])
        got = np.asarray(rotate_crop_rgba_words_batch(
            words, 0.0, None, perspective=(0.25, 0.0)))
        for i in range(3):
            want = np.asarray(rotate_crop_rgba_words(
                words[i], 0.0, None, perspective=(0.25, 0.0)))
            np.testing.assert_array_equal(got[i], want)
