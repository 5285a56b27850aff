"""Native extension parity: _rawkit must be byte-identical to the
Python reference implementations. Skipped when the extension isn't
built (`make native`)."""

import numpy as np
import pytest

from raweditor_tpu.native import get_rawkit
from raweditor_tpu.raw import jpeg_scan
from raweditor_tpu.raw.ljpeg import decode_lossless, encode_lossless
from raweditor_tpu.raw.packing import pack_bits
from raweditor_tpu.raw.synth import make_preview_jpeg

rk = get_rawkit()
pytestmark = pytest.mark.skipif(rk is None, reason="native ext not built")


def _py_spans(data):
    spans = []
    pos = 0
    while True:
        start = data.find(b"\xff\xd8", pos)
        if start < 0:
            break
        end = data.find(b"\xff\xd9", start)
        if end < 0:
            break
        spans.append((start, end + 2))
        pos = start + 1
    return spans


@pytest.mark.parametrize("case", [
    b"",
    b"\xff\xd8\xff\xd9",
    b"\x00" * 50,
    b"\xff" * 50,
    b"\xff\xd8" * 3 + b"\xff\xd9",          # overlapping SOIs share EOI
    b"\xff\xd9\xff\xd8data\xff\xd9tail",    # EOI before first SOI
    b"x\xff\xd8no-end",                     # unterminated
    b"\xff\xff\xd8\xff\xff\xd9",            # FF runs
])
def test_scan_matches_python(case):
    assert [tuple(s) for s in rk.scan_jpeg_spans(case)] == _py_spans(case)


def test_scan_random_blob(rng):
    blob = rng.integers(0, 256, size=40_000, dtype=np.uint8).tobytes()
    blob += make_preview_jpeg(32, 24)
    blob += rng.integers(0, 256, size=1_000, dtype=np.uint8).tobytes()
    assert [tuple(s) for s in rk.scan_jpeg_spans(blob)] == _py_spans(blob)


@pytest.mark.parametrize("bpp", [8, 10, 12, 14, 16])
def test_unpack_matches_python(bpp, rng):
    m = rng.integers(0, 1 << bpp, size=(13, 29), dtype=np.uint16)
    packed = pack_bits(m, bpp)
    got = np.frombuffer(rk.unpack_bits(packed, 29, 13, bpp),
                        np.uint16).reshape(13, 29)
    assert (got == m).all()


def test_unpack_rejects_short_data():
    with pytest.raises(ValueError):
        rk.unpack_bits(b"\x00" * 3, 100, 100, 12)


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
@pytest.mark.parametrize("nc", [1, 2])
def test_ljpeg_matches_python(predictor, nc, rng):
    shape = (nc, 11, 17) if nc > 1 else (11, 17)
    img = rng.integers(0, 16384, size=shape, dtype=np.uint16)
    enc = encode_lossless(img, 14, predictor=predictor)
    raw, got_nc, h, w, prec = rk.decode_ljpeg(enc)
    got = np.frombuffer(raw, np.uint16).reshape(got_nc, h, w)
    want, want_prec = decode_lossless(enc)
    assert prec == want_prec == 14
    assert (got == want).all()


def test_ljpeg_extremes():
    for img in [np.zeros((4, 4), np.uint16),
                np.full((4, 4), 4095, np.uint16),
                np.tile(np.array([[0, 4095]], np.uint16), (4, 2))]:
        raw, nc, h, w, prec = rk.decode_ljpeg(encode_lossless(img, 12))
        got = np.frombuffer(raw, np.uint16).reshape(nc, h, w)
        assert (got[0] == img).all()


def test_ljpeg_rejects_garbage():
    with pytest.raises(ValueError):
        rk.decode_ljpeg(b"\x00\x01\x02\x03")
    with pytest.raises(ValueError):
        rk.decode_ljpeg(b"\xff\xd8\xff\xc3\x00\x02")  # truncated


def test_decoder_uses_native_path(tmp_path, rng):
    """decode_raw through the native LJPEG path must equal the mosaic."""
    from raweditor_tpu.raw.decode import decode_raw
    from raweditor_tpu.raw.synth import write_synthetic_raw

    mosaic = rng.integers(0, 4096, size=(24, 36), dtype=np.uint16)
    write_synthetic_raw(tmp_path / "a.dng", mosaic, compression="ljpeg")
    raw = decode_raw(tmp_path / "a.dng")
    assert (raw.mosaic == mosaic).all()


def test_arw2_native_matches_python(rng, monkeypatch):
    from raweditor_tpu.raw.arw2 import decode_arw2, encode_arw2

    m12 = (rng.integers(0, 0x7FF, size=(8, 64), dtype=np.uint16) << 1)
    enc = encode_arw2(m12)
    native = decode_arw2(enc, 64, 8)
    import raweditor_tpu.native as nat

    monkeypatch.setenv("RAWEDITOR_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(nat, "_tried", False)
    monkeypatch.setattr(nat, "_cached", None)
    python = decode_arw2(enc, 64, 8)
    assert (native == python).all()
    monkeypatch.setattr(nat, "_tried", False)
    monkeypatch.setattr(nat, "_cached", None)


def test_native_binary_current():
    """The committed .so must export everything the current source
    binds — catches a stale binary after rawkit.cpp edits."""
    if rk is None:
        pytest.skip("native ext not built")
    from raweditor_tpu.native import REQUIRED_EXPORTS

    for fn in REQUIRED_EXPORTS:
        assert hasattr(rk, fn), f"stale _rawkit binary: missing {fn}"


@pytest.mark.parametrize("dtype", [np.int16, np.int32, np.int64])
def test_huffman_encode_native_matches_numpy(dtype, rng, monkeypatch):
    """The C++ packer and the NumPy bitfield packer must emit identical
    bitstreams for the same residuals/tables (incl. the no-raw-bits
    category-16 case)."""
    from raweditor_tpu.raw import bitpack

    diffs = rng.integers(-2000, 2000, size=5000).astype(dtype)
    diffs[::97] = 0  # category-0 runs
    code_tab = np.arange(1, 18, dtype=np.uint64)
    clen_tab = np.arange(5, 22, dtype=np.int64)
    native = bitpack.huffman_encode(diffs, code_tab, clen_tab,
                                    max_raw_cat=15)
    monkeypatch.setattr("raweditor_tpu.native.get_rawkit", lambda: None)
    fallback = bitpack.huffman_encode(diffs, code_tab, clen_tab,
                                      max_raw_cat=15)
    assert native == fallback


def test_huffman_encode_wide_fields_match_numpy(rng, monkeypatch):
    """Raw fields near the 63-bit ceiling: the native packer must
    split long fields instead of overflowing its 64-bit accumulator
    (code-review r2 finding)."""
    from raweditor_tpu.raw import bitpack

    diffs = rng.integers(-(2 ** 59), 2 ** 59, size=200).astype(np.int64)
    code_tab = np.arange(1, 62, dtype=np.uint64)
    clen_tab = np.clip(np.arange(3, 64), 3, 16).astype(np.int64)
    native = bitpack.huffman_encode(diffs, code_tab, clen_tab)
    monkeypatch.setattr("raweditor_tpu.native.get_rawkit", lambda: None)
    fallback = bitpack.huffman_encode(diffs, code_tab, clen_tab)
    assert native == fallback


def test_huffman_encode_category_not_in_tree(monkeypatch):
    """Both paths must reject residuals whose category the tree lacks
    (clen 0 marks an unrepresentable category)."""
    from raweditor_tpu.raw import bitpack

    diffs = np.array([0, 5000], np.int64)  # category 13
    code_tab = np.zeros(8, np.uint64)
    clen_tab = np.full(8, 3, np.int64)
    with pytest.raises(ValueError):
        bitpack.huffman_encode(diffs, code_tab, clen_tab)
    monkeypatch.setattr("raweditor_tpu.native.get_rawkit", lambda: None)
    with pytest.raises(ValueError):
        bitpack.huffman_encode(diffs, code_tab, clen_tab)


def test_huffman_pack_rejects_bad_itemsize():
    """itemsize 0 must raise, not SIGFPE the process on the size
    division (whole-file binding review, r3); other non-2/4/8 values
    raise the same ValueError."""
    import pytest

    from raweditor_tpu.native import get_rawkit

    rk = get_rawkit()
    if rk is None or not hasattr(rk, "huffman_pack"):
        pytest.skip("native extension not built")
    for bad in (0, 1, 3, -2):
        with pytest.raises(ValueError):
            rk.huffman_pack(b"\x00\x00", bad, b"\x00" * 8, b"\x00" * 4, 0)
