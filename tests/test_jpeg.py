"""Device YCbCr 4:2:0 op (ops/jpeg.py) + native baseline JFIF encoder.

The transport-optimized JPEG back end: the TPU converts and
subsamples, the C++ encoder (rawkit.encode_jpeg_420) writes baseline
JFIF with optimal per-image Huffman tables. Validated against a
per-pixel NumPy port of the JFIF math and by PIL decode.
"""

import io

import numpy as np
import pytest
from PIL import Image

from raweditor_tpu.native import get_rawkit

rk = get_rawkit()
HAS_JPEG = rk is not None and hasattr(rk, "encode_jpeg_420")


def _pack_words(rgb):
    return (rgb[..., 0].astype(np.uint32)
            | (rgb[..., 1].astype(np.uint32) << 8)
            | (rgb[..., 2].astype(np.uint32) << 16)
            | (np.uint32(255) << 24))


def _ref_planes(rgb):
    """NumPy reference of ops/jpeg.py: JFIF BT.601 + 2x2 box chroma."""
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    h, w = r.shape

    def box(p):
        return p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

    q = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)
    return q(y), q(box(cb)), q(box(cr))


def test_ycbcr420_matches_numpy_reference(rng):
    from raweditor_tpu.ops.jpeg import rgba_words_to_ycbcr420

    rgb = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    y, cb, cr = (np.asarray(p)
                 for p in rgba_words_to_ycbcr420(_pack_words(rgb)))
    ry, rcb, rcr = _ref_planes(rgb)
    # f32 vs f64 rounding can differ by 1 at .5 boundaries.
    assert y.shape == (16, 24) and cb.shape == (8, 12)
    assert np.abs(y.astype(int) - ry.astype(int)).max() <= 1
    assert np.abs(cb.astype(int) - rcb.astype(int)).max() <= 1
    assert np.abs(cr.astype(int) - rcr.astype(int)).max() <= 1


def test_ycbcr420_batched_and_odd_rejected(rng):
    from raweditor_tpu.ops.jpeg import rgba_words_to_ycbcr420

    rgb = rng.integers(0, 256, size=(3, 8, 10, 3), dtype=np.uint8)
    y, cb, cr = rgba_words_to_ycbcr420(_pack_words(rgb))
    assert y.shape == (3, 8, 10) and cb.shape == (3, 4, 5)
    with pytest.raises(ValueError, match="even"):
        rgba_words_to_ycbcr420(np.zeros((7, 10), np.uint32))


def test_ycbcr420_primaries():
    """Pure primaries hit the JFIF landmark values."""
    from raweditor_tpu.ops.jpeg import rgba_words_to_ycbcr420

    rgb = np.zeros((2, 8, 3), np.uint8)
    rgb[:, 0:2] = [255, 255, 255]
    rgb[:, 2:4] = [255, 0, 0]
    rgb[:, 4:6] = [0, 255, 0]
    rgb[:, 6:8] = [0, 0, 255]
    y, cb, cr = (np.asarray(p)
                 for p in rgba_words_to_ycbcr420(_pack_words(rgb)))
    assert list(y[0, :8:2]) == [255, 76, 150, 29]
    assert list(cb[0]) == [128, 85, 44, 255]
    assert list(cr[0]) == [128, 255, 21, 107]


@pytest.mark.skipif(not HAS_JPEG, reason="native JPEG encoder not built")
class TestNativeEncoder:
    def _roundtrip(self, rgb, quality=90):
        y, cb, cr = _ref_planes(rgb)
        h, w = rgb.shape[:2]
        data = rk.encode_jpeg_420(y.tobytes(), cb.tobytes(), cr.tobytes(),
                                  w, h, quality)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        with Image.open(io.BytesIO(data)) as im:
            assert im.size == (w, h)
            return np.asarray(im.convert("RGB"), np.float64), data

    def test_smooth_scene_high_psnr(self):
        h, w = 96, 128
        yy, xx = np.mgrid[0:h, 0:w]
        rgb = np.stack([xx / w * 255, yy / h * 255,
                        (xx + yy) / (w + h) * 255], -1).astype(np.uint8)
        dec, data = self._roundtrip(rgb, quality=90)
        psnr = 10 * np.log10(255.0 ** 2 /
                             np.mean((dec - rgb.astype(np.float64)) ** 2))
        assert psnr > 40.0, psnr
        # Optimal Huffman tables: must not be larger than PIL at the
        # same quality + subsampling.
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="JPEG", quality=90,
                                  subsampling=2)
        assert len(data) <= len(buf.getvalue())

    def test_noise_and_extremes_decode(self, rng):
        for fill in (0, 255):
            rgb = np.full((16, 16, 3), fill, np.uint8)
            dec, _ = self._roundtrip(rgb, quality=95)
            assert np.abs(dec - fill).max() <= 3
        rgb = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
        self._roundtrip(rgb, quality=50)  # worst case for the entropy coder

    def test_non_mcu_aligned_dims(self, rng):
        # 20x28: even (the op's requirement) but not multiples of 16.
        rgb = rng.integers(0, 256, size=(20, 28, 3), dtype=np.uint8)
        dec, _ = self._roundtrip(rgb)
        assert dec.shape == (20, 28, 3)

    def test_quality_ladder_monotone_size(self):
        h, w = 64, 96
        yy, xx = np.mgrid[0:h, 0:w]
        rgb = np.stack([xx / w * 255, yy / h * 255,
                        np.sin(xx / 5.0) * 100 + 120], -1).astype(np.uint8)
        sizes = [len(self._roundtrip(rgb, quality=q)[1])
                 for q in (30, 60, 90)]
        assert sizes[0] < sizes[1] < sizes[2]

    def test_fixed_tables_mode(self, rng):
        """optimize=False (single-pass Annex K typical tables) must
        decode to EXACTLY the same pixels as the optimal-table mode —
        the entropy coding changes, the coefficients don't — and cost
        only a few percent in size on natural content."""
        h, w = 96, 128
        yy, xx = np.mgrid[0:h, 0:w]
        rgb = np.stack([xx / w * 255, yy / h * 255,
                        (xx + yy) / (w + h) * 255], -1).astype(np.uint8)
        y, cb, cr = _ref_planes(rgb)
        opt = rk.encode_jpeg_420(y.tobytes(), cb.tobytes(), cr.tobytes(),
                                 w, h, 90, True)
        fast = rk.encode_jpeg_420(y.tobytes(), cb.tobytes(), cr.tobytes(),
                                  w, h, 90, False)
        a = np.asarray(Image.open(io.BytesIO(opt)).convert("RGB"))
        b = np.asarray(Image.open(io.BytesIO(fast)).convert("RGB"))
        assert np.array_equal(a, b)
        # Optimal is never larger. (No tight upper bound here: on a
        # tiny test frame the fixed 418-byte Annex K DHT segments
        # dominate; on 24 MP content the delta is the ~3-5% scan-level
        # coding loss.)
        assert len(opt) <= len(fast)
        # Noise + extremes decode fine through the fixed tables too
        # (covers the largest DC/AC categories the tables can code).
        for fill in (0, 255):
            flat = np.full((16, 16, 3), fill, np.uint8)
            fy, fcb, fcr = _ref_planes(flat)
            data = rk.encode_jpeg_420(fy.tobytes(), fcb.tobytes(),
                                      fcr.tobytes(), 16, 16, 95, False)
            dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"),
                             np.float64)
            assert np.abs(dec - fill).max() <= 3
        noise = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
        ny, ncb, ncr = _ref_planes(noise)
        data = rk.encode_jpeg_420(ny.tobytes(), ncb.tobytes(),
                                  ncr.tobytes(), 64, 48, 50, False)
        with Image.open(io.BytesIO(data)) as im:
            assert im.size == (64, 48)

    def test_avx2_and_scalar_paths_identical(self, rng, monkeypatch):
        """The runtime-dispatched AVX2 extract/fDCT/quantize path must
        produce byte-identical files to the scalar path (same float op
        order by construction; this pins it). On hosts without AVX2
        both runs take the scalar path and the assert is trivially
        true."""
        # Non-multiple-of-16 dims: edge-replicated blocks on both axes
        # (even, for the reference 2x2 chroma box).
        h, w = 52, 82
        yy, xx = np.mgrid[0:h, 0:w]
        rgb = np.stack([xx / w * 255, yy / h * 255,
                        np.sin(xx / 3.0) * 110 + 120], -1).astype(np.uint8)
        noise = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for img in (rgb, noise):
            y, cb, cr = _ref_planes(img)
            for q, opt in ((35, False), (92, False), (95, True)):
                a = rk.encode_jpeg_420(y.tobytes(), cb.tobytes(),
                                       cr.tobytes(), w, h, q, opt)
                monkeypatch.setenv("RAWKIT_JPEG_NO_AVX2", "1")
                b = rk.encode_jpeg_420(y.tobytes(), cb.tobytes(),
                                       cr.tobytes(), w, h, q, opt)
                monkeypatch.delenv("RAWKIT_JPEG_NO_AVX2")
                assert a == b, (q, opt)
            yf = np.ascontiguousarray(img[:51, :81, 0])  # odd dims
            a = rk.encode_jpeg_444(yf.tobytes(), yf.tobytes(),
                                   yf.tobytes(), 81, 51, 92, False)
            monkeypatch.setenv("RAWKIT_JPEG_NO_AVX2", "1")
            b = rk.encode_jpeg_444(yf.tobytes(), yf.tobytes(),
                                   yf.tobytes(), 81, 51, 92, False)
            monkeypatch.delenv("RAWKIT_JPEG_NO_AVX2")
            assert a == b

    def test_restart_markers(self, rng):
        """restart_rows > 0: DRI declared, RSTn separate byte-aligned
        independent segments, any thread count produces identical
        bytes, and the decoded pixels equal the no-restart stream's
        (same coefficients, different entropy segmentation)."""
        h, w = 96, 128  # 6 MCU rows in 4:2:0
        yy, xx = np.mgrid[0:h, 0:w]
        rgb = np.stack([xx / w * 255, yy / h * 255,
                        np.sin(xx / 4.0) * 100 + 128], -1).astype(np.uint8)
        y, cb, cr = _ref_planes(rgb)
        args = (y.tobytes(), cb.tobytes(), cr.tobytes(), w, h, 90)
        for opt in (False, True):
            plain = rk.encode_jpeg_420(*args, opt)
            rst = rk.encode_jpeg_420(*args, opt, 2, 1)  # 3 segments
            assert b"\xff\xdd" not in plain  # no DRI without restarts
            assert b"\xff\xdd\x00\x04" in rst  # DRI, length 4
            assert rst.count(b"\xff\xd0") >= 1  # RST0 present
            for t in (2, 4, 0):
                assert rk.encode_jpeg_420(*args, opt, 2, t) == rst, t
            a = np.asarray(Image.open(io.BytesIO(plain)).convert("RGB"))
            b = np.asarray(Image.open(io.BytesIO(rst)).convert("RGB"))
            assert np.array_equal(a, b)
        # restart_rows covering the whole image = one segment = the
        # plain stream, byte for byte (no DRI emitted).
        assert rk.encode_jpeg_420(*args, False, 99, 4) == \
            rk.encode_jpeg_420(*args, False)
        # 4:4:4 restart streams decode too.
        yf = np.ascontiguousarray(rgb[:, :, 0])
        r4 = rk.encode_jpeg_444(yf.tobytes(), yf.tobytes(), yf.tobytes(),
                                w, h, 90, False, 3, 2)
        with Image.open(io.BytesIO(r4)) as im:
            assert im.size == (w, h)

    def test_bad_args_raise(self):
        with pytest.raises(ValueError):
            rk.encode_jpeg_420(b"", b"", b"", 8, 8, 90)
        with pytest.raises(ValueError):
            rk.encode_jpeg_420(b"\0" * 64, b"\0" * 16, b"\0" * 16,
                               -1, 8, 90)

    def test_444_full_chroma(self, rng):
        """4:4:4 mode: full-res chroma planes, 1x1 sampling factors in
        the SOF, and a massive PSNR win over 4:2:0 on alternating-
        column chroma edges (the content subsampling destroys)."""
        h, w = 64, 96
        rgb = np.zeros((h, w, 3), np.uint8)
        rgb[:, ::2] = [255, 0, 0]
        rgb[:, 1::2] = [0, 0, 255]

        r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        q = (lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8))
        data = rk.encode_jpeg_444(q(y).tobytes(), q(cb).tobytes(),
                                  q(cr).tobytes(), w, h, 95)
        with Image.open(io.BytesIO(data)) as im:
            assert im.size == (w, h)
            assert im.layer[0][1:3] == (1, 1)  # Y sampling 1x1 = 4:4:4
            dec = np.asarray(im.convert("RGB"), np.float64)
        psnr = 10 * np.log10(255.0 ** 2 /
                             np.mean((dec - rgb.astype(np.float64)) ** 2))
        assert psnr > 40.0, psnr
        # Odd dimensions are legal in 4:4:4 (no 2x2 subsample).
        odd = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
        ro, go, bo = (odd[..., i].astype(np.float64) for i in range(3))
        yo = q(0.299 * ro + 0.587 * go + 0.114 * bo)
        data = rk.encode_jpeg_444(yo.tobytes(), yo.tobytes(),
                                  yo.tobytes(), 23, 17, 90)
        with Image.open(io.BytesIO(data)) as im:
            assert im.size == (23, 17)
        # optimize flag works in 444 too, same pixels.
        a = rk.encode_jpeg_444(q(y).tobytes(), q(cb).tobytes(),
                               q(cr).tobytes(), w, h, 95, True)
        b_ = rk.encode_jpeg_444(q(y).tobytes(), q(cb).tobytes(),
                                q(cr).tobytes(), w, h, 95, False)
        ia = np.asarray(Image.open(io.BytesIO(a)).convert("RGB"))
        ib = np.asarray(Image.open(io.BytesIO(b_)).convert("RGB"))
        assert np.array_equal(ia, ib)

    def test_ycbcr444_op_matches_reference(self, rng):
        from raweditor_tpu.ops.jpeg import rgba_words_to_ycbcr444

        rgb = rng.integers(0, 256, size=(12, 20, 3), dtype=np.uint8)
        y, cb, cr = (np.asarray(p)
                     for p in rgba_words_to_ycbcr444(_pack_words(rgb)))
        r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
        ref_y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b),
                        0, 255)
        assert np.abs(y.astype(np.float64) - ref_y).max() <= 1
        assert y.shape == cb.shape == cr.shape == (12, 20)
