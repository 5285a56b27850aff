"""Round-trip tests: synthetic RAW writer → decoder. Covers the
container walk, bit unpacking, lossless-JPEG strips, and metadata
extraction (no real camera files ship with the repo — SURVEY.md §4)."""

import io

import numpy as np
import pytest

from raweditor_tpu.raw.decode import (
    RawDecodeError,
    UnsupportedRawError,
    decode_raw,
    extract_preview_jpeg,
)
from raweditor_tpu.raw.jpeg_scan import extract_largest_jpeg, find_jpeg_spans
from raweditor_tpu.raw.ljpeg import decode_lossless, encode_lossless
from raweditor_tpu.raw.packing import pack_bits, unpack_bits
from raweditor_tpu.raw.synth import make_preview_jpeg, write_synthetic_raw
from raweditor_tpu.raw.types import RawImage


# --- packing ---------------------------------------------------------------


@pytest.mark.parametrize("bpp", [8, 10, 12, 14, 16])
def test_pack_unpack_round_trip(bpp, rng):
    m = rng.integers(0, 1 << bpp, size=(7, 11), dtype=np.uint16)
    assert (unpack_bits(pack_bits(m, bpp), 11, 7, bpp) == m).all()


def test_pack_rejects_overflow():
    with pytest.raises(ValueError):
        pack_bits(np.full((2, 2), 5000, np.uint16), 12)


# --- lossless JPEG ---------------------------------------------------------


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_ljpeg_round_trip_predictors(predictor, rng):
    img = rng.integers(0, 4096, size=(9, 13), dtype=np.uint16)
    planes, prec = decode_lossless(
        encode_lossless(img, 12, predictor=predictor)
    )
    assert prec == 12
    assert (planes[0] == img).all()


def test_ljpeg_two_component(rng):
    comps = rng.integers(0, 16384, size=(2, 6, 5), dtype=np.uint16)
    planes, prec = decode_lossless(encode_lossless(comps, 14))
    assert prec == 14
    assert (planes == comps).all()


def test_ljpeg_rejects_garbage():
    with pytest.raises(ValueError):
        decode_lossless(b"\x00\x01\x02\x03")


# --- jpeg scan -------------------------------------------------------------


def test_find_spans_and_extract(rng):
    jpeg = make_preview_jpeg(32, 24)
    blob = b"\x00" * 100 + jpeg + b"\xab" * 50
    spans = find_jpeg_spans(blob)
    assert any(s == 100 for s, _ in spans)
    out = extract_largest_jpeg(blob)
    assert out is not None and out[:2] == b"\xff\xd8"


def test_extract_picks_largest_valid():
    small = make_preview_jpeg(16, 12)
    large = make_preview_jpeg(64, 48)
    blob = small + b"\x00" * 10 + large
    out = extract_largest_jpeg(blob)
    assert len(out) == len(large)


def test_extract_none_when_no_jpeg():
    assert extract_largest_jpeg(b"\x00" * 1000) is None


# --- decoder round trips ---------------------------------------------------

XYZ_TO_CAM = np.array(
    [[0.6988, -0.1384, -0.0714], [-0.5631, 1.3410, 0.2447],
     [-0.1485, 0.2204, 0.7318]],
    dtype=np.float32,
)


@pytest.mark.parametrize("compression", ["none", "ljpeg"])
@pytest.mark.parametrize("bpp", [12, 14, 16])
def test_decode_round_trip(tmp_path, rng, compression, bpp):
    mosaic = rng.integers(0, 1 << bpp, size=(20, 30), dtype=np.uint16)
    path = tmp_path / "synth.dng"
    write_synthetic_raw(path, mosaic, bpp=bpp, compression=compression,
                        xyz_to_cam=XYZ_TO_CAM, black_level=3,
                        white_level=(1 << bpp) - 5)
    raw = decode_raw(path)
    assert (raw.mosaic == mosaic).all()
    assert raw.width == 30 and raw.height == 20
    assert raw.black_level == 3
    assert raw.white_level == (1 << bpp) - 5
    assert raw.cfa_pattern == "RGGB"
    assert raw.camera_make == "SynthCam"
    assert np.allclose(raw.xyz_to_cam, XYZ_TO_CAM, atol=1e-4)
    assert raw.source_path == str(path)


def test_decode_wb_from_as_shot_neutral(tmp_path, rng):
    mosaic = rng.integers(0, 4096, size=(8, 8), dtype=np.uint16)
    write_synthetic_raw(tmp_path / "a.nef", mosaic,
                        wb_neutral=(0.5, 1.0, 0.25))
    raw = decode_raw(tmp_path / "a.nef")
    # multipliers = 1/neutral, green-normalized: (2, 1, 4)
    assert np.allclose(raw.wb_multipliers[:3], [2.0, 1.0, 4.0], atol=1e-3)
    assert np.allclose(raw.wb_multipliers[3], 1.0, atol=1e-3)


def test_degenerate_as_shot_neutral_falls_through(tmp_path, rng):
    """A present-but-degenerate AsShotNeutral (zero component) must NOT
    short-circuit the WB fallback chain: the MakerNote fallbacks run
    and, with none present, wb_is_default=True (code-review r3)."""
    mosaic = rng.integers(0, 4096, size=(8, 8), dtype=np.uint16)
    write_synthetic_raw(tmp_path / "a.nef", mosaic,
                        wb_neutral=(0.0, 1.0, 0.25))
    raw = decode_raw(tmp_path / "a.nef")
    assert raw.wb_is_default
    assert np.allclose(raw.wb_multipliers, 1.0)


def test_rw2_missing_wb_flags_default(tmp_path, rng):
    """RW2 without WB tags reports wb_is_default=True like the main
    CFA path (code-review r3)."""
    from raweditor_tpu.raw.panasonic import rw2_representable
    from raweditor_tpu.raw.synth import write_synthetic_rw2

    m = rw2_representable(
        rng.integers(0, 4096, size=(8, 14), dtype=np.uint16))
    blob = bytearray(write_synthetic_rw2(None, m))
    raw = decode_raw(bytes(blob))
    assert not raw.wb_is_default  # synth writes WB tags
    # Degenerate WB levels (zeros) → neutral fallback, flagged.
    blob2 = write_synthetic_rw2(None, m, wb_rgb=(0, 0, 0))
    raw2 = decode_raw(bytes(blob2))
    assert raw2.wb_is_default
    assert np.allclose(raw2.wb_multipliers, 1.0)


def test_tiled_float_and_wide_int_quarantine(tmp_path, rng):
    """Tiled SampleFormat=3 and uncompressed integer bpp>16 must
    quarantine instead of decoding garbage through the integer unpack
    (code-review r3)."""
    from raweditor_tpu.raw.synth import write_synthetic_raw as _w

    # Build a normal 16-bit uncompressed file, then rewrite its
    # BitsPerSample entry (SHORT, count 1, value 16 → 24) wherever the
    # sensor IFD put it.
    mosaic = rng.integers(0, 4096, size=(8, 8), dtype=np.uint16)
    base = _w(None, mosaic, compression="none", bpp=16)
    entry16 = bytes.fromhex("020103000100000010000000")
    entry24 = bytes.fromhex("020103000100000018000000")
    assert entry16 in base
    wide = base.replace(entry16, entry24)
    with pytest.raises(RawDecodeError):
        decode_raw(wide)


def test_decode_nonexistent_file():
    with pytest.raises(FileNotFoundError):
        decode_raw("/nonexistent/path.nef")


def test_decode_not_a_tiff():
    with pytest.raises(RawDecodeError):
        decode_raw(b"not a tiff at all")


def test_decode_no_cfa():
    # A TIFF with no sensor plane: just the preview JPEG markers.
    with pytest.raises(RawDecodeError):
        decode_raw(b"II*\x00\x08\x00\x00\x00\x00\x00\x00\x00\x00\x00")


def test_extract_preview_from_synth(tmp_path, rng):
    mosaic = rng.integers(0, 4096, size=(8, 8), dtype=np.uint16)
    preview = make_preview_jpeg(48, 32)
    write_synthetic_raw(tmp_path / "a.nef", mosaic, preview_jpeg=preview)
    got = extract_preview_jpeg(tmp_path / "a.nef")
    assert got == preview


def test_normalize_wb_fallbacks():
    # 3 coeffs: G2 = G (reference: raw/loader.rs:85-92).
    wb = RawImage.normalize_wb([2.0, 1.0, 1.5])
    assert np.allclose(wb, [2.0, 1.0, 1.5, 1.0])
    # Bad G2 falls back to G (reference: raw/loader.rs:105-109).
    wb = RawImage.normalize_wb([2.0, 2.0, 1.0, float("nan")])
    assert np.allclose(wb, [1.0, 1.0, 0.5, 1.0])
    # Empty → neutral (reference: raw/loader.rs:93-97).
    assert np.allclose(RawImage.normalize_wb([]), [1.0, 1.0, 1.0, 1.0])


def test_develop_from_decoded_file(tmp_path, rng):
    """End-to-end: synthetic file → decode → develop → parity with
    developing the mosaic directly."""
    from raweditor_tpu import EditParams
    from raweditor_tpu.ops.develop import develop

    mosaic = rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)
    write_synthetic_raw(tmp_path / "a.dng", mosaic, compression="ljpeg")
    raw = decode_raw(tmp_path / "a.dng")
    got = np.asarray(
        develop(raw.mosaic, EditParams(), raw.wb_rgb(), np.eye(3, dtype=np.float32))
    )
    want = np.asarray(
        develop(mosaic, EditParams(), raw.wb_rgb(), np.eye(3, dtype=np.float32))
    )
    assert (got == want).all()


# --- tiles + float samples -------------------------------------------------


@pytest.mark.parametrize("compression", ["none", "ljpeg"])
def test_decode_tiled(tmp_path, rng, compression):
    """DNG-style tiled CFA plane, including edge tiles that need
    cropping."""
    mosaic = rng.integers(0, 4096, size=(50, 70), dtype=np.uint16)
    path = tmp_path / "tiled.dng"
    write_synthetic_raw(path, mosaic, tile_size=(32, 16),
                        compression=compression)
    raw = decode_raw(path)
    assert (raw.mosaic == mosaic).all()


def test_decode_float_samples(tmp_path, rng):
    """DNG SampleFormat=3: floats normalized to u16 like the reference
    (reference: raw/loader.rs:67-72)."""
    mosaic = rng.integers(0, 4096, size=(20, 24), dtype=np.uint16)
    path = tmp_path / "float.dng"
    write_synthetic_raw(path, mosaic, float_samples=True)
    raw = decode_raw(path)
    expect = np.clip(
        mosaic.astype(np.float32) / 4095 * 65535, 0, 65535
    ).astype(np.uint16)
    assert (raw.mosaic == expect).all()


def test_wb_from_nikon_makernote(tmp_path, rng):
    """Real-NEF-style WB: MakerNote 0x000C, no AsShotNeutral."""
    mosaic = rng.integers(0, 4096, size=(8, 12), dtype=np.uint16)
    for comp in ("nikon", "none"):
        data = write_synthetic_raw(None, mosaic, compression=comp,
                                   wb_neutral=(0.5, 1.0, 0.25),
                                   wb_in_makernote=True)
        raw = decode_raw(data)
        assert (raw.mosaic == mosaic).all()
        assert np.allclose(raw.wb_multipliers[:3], [2.0, 1.0, 4.0],
                           atol=1e-3)


def test_escalating_scan_prefers_early_preview(rng):
    from raweditor_tpu.raw.jpeg_scan import (
        SCAN_TIERS,
        extract_jpeg_escalating,
    )

    early = make_preview_jpeg(96, 64)  # well over min_size
    late = make_preview_jpeg(256, 170)  # larger but deep in the file
    blob = (b"\x00" * 1000 + early
            + b"\x00" * (SCAN_TIERS[-1] + 100_000) + late)
    # Escalating scan stops at the first adequate early hit...
    assert extract_jpeg_escalating(blob, min_size=1000) == early
    # ...whole-file scan finds the larger one.
    assert extract_largest_jpeg(blob) == late


def test_escalating_scan_falls_back_to_full(rng):
    from raweditor_tpu.raw.jpeg_scan import extract_jpeg_escalating

    late = make_preview_jpeg(64, 42)
    blob = b"\x00" * (6 * 1024 * 1024) + late
    assert extract_jpeg_escalating(blob) == late


def test_cr2_slice_layout(tmp_path, rng):
    """Canon-style vertical slices (tag 0xC640): consecutive pixel runs
    reassembled into the true plane."""
    m = rng.integers(0, 16384, size=(30, 44), dtype=np.uint16)
    path = tmp_path / "shot.cr2"
    write_synthetic_raw(path, m, bpp=14, compression="ljpeg",
                        cr2_slices=(2, 16, 12))
    raw = decode_raw(path)
    assert (raw.mosaic == m).all()


def test_cr2_slice_bad_sum(rng):
    m = rng.integers(0, 4096, size=(8, 20), dtype=np.uint16)
    with pytest.raises(ValueError):
        write_synthetic_raw(None, m, compression="ljpeg",
                            cr2_slices=(2, 8, 10))


def test_concurrent_decode_threads(tmp_path, rng):
    """Decode is thread-safe (the exporter's pool): many threads
    hammering different and identical files must all agree."""
    from concurrent.futures import ThreadPoolExecutor

    paths = []
    mosaics = []
    for i in range(6):
        m = rng.integers(0, 4096, size=(20, 24), dtype=np.uint16)
        p = tmp_path / f"f{i}.dng"
        write_synthetic_raw(p, m,
                            compression="ljpeg" if i % 2 else "none")
        paths.append(p)
        mosaics.append(m)

    def job(k):
        return decode_raw(paths[k % 6]).mosaic

    with ThreadPoolExecutor(8) as ex:
        results = list(ex.map(job, range(48)))
    for k, got in enumerate(results):
        assert (got == mosaics[k % 6]).all()


def test_16bit_respects_container_byte_order(rng):
    """A little-endian ('II') container stores 16-bit samples LE; a
    big-endian one BE. Both must decode to the same values (regression:
    16-bit was always read BE)."""
    m = rng.integers(0, 65536, size=(4, 6), dtype=np.uint16)
    le = unpack_bits(m.astype("<u2").tobytes(), 6, 4, 16, big_endian=False)
    be = unpack_bits(m.astype(">u2").tobytes(), 6, 4, 16, big_endian=True)
    assert (le == m).all() and (be == m).all()
    # End-to-end: synthetic 'II' file with 16-bit uncompressed samples.
    data = write_synthetic_raw(None, m, bpp=16)
    raw = decode_raw(data)
    assert (raw.mosaic == m).all()


def test_truncated_ifd_raises_decode_error():
    """A next-IFD pointer just past the end must surface as
    RawDecodeError, not struct.error (error-contract regression)."""
    import struct as _struct

    data = bytearray(b"II*\x00")
    data += _struct.pack("<I", 20)  # first IFD at 20
    data += b"\x00" * 12
    data += _struct.pack("<H", 0)  # 0 entries
    data += _struct.pack("<I", 21)  # next IFD: points 1 byte before EOF
    data += b"\x00"
    with pytest.raises(RawDecodeError):
        decode_raw(bytes(data))


def test_nikon_curve_white_point(tmp_path, rng):
    """Compressed NEFs without a WhiteLevel tag get their white point
    from the linearization curve's trimmed plateau."""
    from raweditor_tpu.raw import tiff as T
    from raweditor_tpu.raw import synth as S

    m = rng.integers(0, 4096, size=(10, 14), dtype=np.uint16)
    data = write_synthetic_raw(None, m, compression="nikon")
    # Strip the WhiteLevel tag by patching it to a different id the
    # decoder ignores (synthetic files always carry one).
    tf = T.TiffFile(data)
    blob = bytearray(data)
    for ifd in tf.all_ifds():
        tag = ifd.tags.get(T.WHITE_LEVEL)
        if tag is not None:
            # entry position: find within the IFD table
            n = tf._u16(ifd.offset)
            for k in range(n):
                pos = ifd.offset + 2 + 12 * k
                if tf._u16(pos) == T.WHITE_LEVEL:
                    blob[pos : pos + 2] = (60000).to_bytes(2, "little")
    raw = decode_raw(bytes(blob))
    # Identity curve of a 12-bit lossless NEF: white = curve[max-1] = 4095.
    assert raw.white_level == 4095.0
    assert (raw.mosaic == m).all()


def test_corrupt_metadata_values_quarantine(rng):
    """Regression for soak-fuzz findings: mutated BitsPerSample /
    BlackLevel / WhiteLevel tag values must quarantine (or decode with
    sane fallbacks), never raise OverflowError / produce NaN levels."""
    import raweditor_tpu.raw.tiff as T

    m = rng.integers(0, 4096, size=(10, 12), dtype=np.uint16)
    base = write_synthetic_raw(None, m)

    def mutate_tag_value(tag, new_bytes):
        blob = bytearray(base)
        tf = T.TiffFile(bytes(blob))
        for ifd in tf.all_ifds():
            n = tf._u16(ifd.offset)
            for k in range(n):
                pos = ifd.offset + 2 + 12 * k
                if tf._u16(pos) == tag:
                    blob[pos + 8: pos + 8 + len(new_bytes)] = new_bytes
        return bytes(blob)

    # Huge BitsPerSample -> used to hit OverflowError at 1 << bpp.
    blob = mutate_tag_value(T.BITS_PER_SAMPLE, (60000).to_bytes(2, "little"))
    with pytest.raises(RawDecodeError):
        decode_raw(blob)
    # WhiteLevel mutated to zero-count stays decodable or quarantines;
    # either way the white level must be finite.
    try:
        raw = decode_raw(base)
        assert np.isfinite(raw.white_level)
        assert np.isfinite(raw.black_level)
    except RawDecodeError:
        pass


def test_decoder_fuzz_error_contract(rng):
    """Arbitrary garbage must raise RawDecodeError (or decode), never
    an unrelated exception type — the quarantine path depends on it."""
    for i in range(60):
        n = int(rng.integers(0, 400))
        blob = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        try:
            decode_raw(blob)
        except RawDecodeError:
            pass

    # Mutated valid files: flip bytes across a real container — every
    # decode layout gets a base (CLAUDE.md: extend when adding decoders).
    m = rng.integers(0, 4096, size=(10, 12), dtype=np.uint16)
    bases = [
        write_synthetic_raw(None, m, compression=c)
        for c in ("none", "ljpeg", "nikon", "ljpeg4")
    ]
    # ARW2 blocks span 32 columns, so its base needs a wider mosaic.
    m32 = rng.integers(0, 4096, size=(8, 32), dtype=np.uint16)
    bases.append(write_synthetic_raw(None, m32, compression="arw2"))
    bases.append(write_synthetic_raw(None, m, compression="ljpeg",
                                     rows_per_strip=5))
    bases.append(write_synthetic_raw(None, m, tile_size=(8, 4)))
    from raweditor_tpu.raw.synth import write_synthetic_linear_dng

    rgb = rng.integers(0, 4096, size=(6, 8, 3), dtype=np.uint16)
    bases.append(write_synthetic_linear_dng(None, rgb, bpp=12))
    bases.append(write_synthetic_linear_dng(None, rgb, bpp=12,
                                            compression="ljpeg"))
    from raweditor_tpu.raw.panasonic import rw2_representable
    from raweditor_tpu.raw.synth import (write_synthetic_orf,
                                         write_synthetic_rw2)

    bases.append(write_synthetic_orf(None, m))
    bases.append(write_synthetic_orf(None, m, compression="none16"))
    bases.append(write_synthetic_raw(None, m, compression="pentax"))
    bases.append(write_synthetic_raw(None, m, compression="kodak65000"))
    m14 = rw2_representable(
        rng.integers(0, 4096, size=(8, 28), dtype=np.uint16))
    bases.append(write_synthetic_rw2(None, m14))
    from raweditor_tpu.raw.ciff import write_crw

    m16 = rng.integers(0, 4096, size=(8, 16), dtype=np.uint16)
    bases.append(write_crw(None, m16))
    bases.append(write_crw(None, m16 >> 2, lowbits=False))
    from raweditor_tpu.raw.bmff import write_synthetic_cr3

    bases.append(write_synthetic_cr3(None))
    bases.append(write_synthetic_cr3(None, mosaic=m16, tile_cols=2))
    bases.append(write_synthetic_cr3(None, mosaic=m16, levels=2,
                                     q_detail=8))
    from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN

    m12sq = rng.integers(0, 4096, size=(12, 12), dtype=np.uint16)
    bases.append(write_synthetic_raw(None, m12sq, cfa=XTRANS_PATTERN))
    bases.append(write_synthetic_raw(None, m16, compression="srw1",
                                     srw_wb=True))
    bases.append(write_synthetic_raw(None, m16, compression="srw3",
                                     srw_wb=True))
    from raweditor_tpu.raw.kodak_radc import radc_representable

    bases.append(write_synthetic_raw(
        None, radc_representable(m16), bpp=14, compression="radc"))
    # Regression (r3 differential soak, seed 3): an SOF3 whose segment
    # length leaves fewer bytes than its fixed header must quarantine,
    # not escape as struct.error.
    trunc = bytearray(write_synthetic_raw(None, m, compression="ljpeg"))
    sof = bytes(trunc).find(b"\xff\xc3")
    assert sof > 0
    trunc[sof + 2:sof + 4] = (4).to_bytes(2, "big")
    with pytest.raises(RawDecodeError):
        decode_raw(bytes(trunc))
    for base in bases:
        base = bytearray(base)
        for _ in range(40):
            blob = bytearray(base)
            for _ in range(int(rng.integers(1, 6))):
                pos = int(rng.integers(0, len(blob)))
                blob[pos] = int(rng.integers(0, 256))
            try:
                decode_raw(bytes(blob))
            except RawDecodeError:
                pass


def _ljpeg_scan(bits16, values, w, h, entropy, precision=12):
    """Hand-build a 1-component SOF3 scan (differential-fix fixtures)."""
    dht = bytes([0]) + bytes(bits16) + bytes(values)
    out = b"\xff\xd8"
    out += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht
    sof = bytes([precision]) + h.to_bytes(2, "big") + \
        w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc3" + (2 + len(sof)).to_bytes(2, "big") + sof
    sos = bytes([1, 1, 0x00, 1, 0, 0])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
    return out + entropy


def _decode_both(scan):
    """(python_result_or_None, native_result_or_None) — None = reject."""
    from raweditor_tpu.native import get_rawkit

    try:
        py = decode_lossless(scan)[0]
    except ValueError:
        py = None
    rk = get_rawkit()
    if rk is None:
        return py, py
    try:
        raw, nc, h, w, _prec = rk.decode_ljpeg(scan)
        nat = np.frombuffer(raw, np.uint16).reshape(nc, h, w)
    except ValueError:
        nat = None
    return py, nat


def test_ljpeg_duplicate_symbol_dht_decodes_identically():
    """r3 differential-soak fix: a DHT assigning the same symbol to
    two codes must not drop either code (Python's table was keyed by
    symbol first)."""
    bits = [2] + [0] * 15  # two 1-bit codes...
    scan = _ljpeg_scan(bits, [5, 5], 2, 1,  # ...both carrying ssss=5
                       bytes([0b0_01010_1_0, 0b1111_0000]))
    py, nat = _decode_both(scan)
    assert py is not None and nat is not None
    np.testing.assert_array_equal(py, nat)


def test_ljpeg_dht_id_aliases_low_two_bits():
    """r3 differential-soak fix: fuzzed DHT/SOS table ids above 3
    alias down to the low two bits in BOTH implementations (Python
    kept the raw 4-bit id, so a DHT id 13 + SOS ref 13 masked to 1
    missed the table it defined)."""
    bits = [2] + [0] * 15
    dht = bytes([13]) + bytes(bits) + bytes([0, 4])  # table id 13 -> 1
    scan = b"\xff\xd8"
    scan += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht
    sof = bytes([12]) + (1).to_bytes(2, "big") + (2).to_bytes(2, "big") \
        + bytes([1, 1, 0x11, 0])
    scan += b"\xff\xc3" + (2 + len(sof)).to_bytes(2, "big") + sof
    sos = bytes([1, 1, 13 << 4, 1, 0, 0])  # SOS also names id 13
    scan += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
    scan += bytes([0b1_0110_1_01, 0b010_00000])
    py, nat = _decode_both(scan)
    assert py is not None and nat is not None
    np.testing.assert_array_equal(py, nat)


def test_ljpeg_invalid_ssss_quarantines_everywhere():
    """r3 differential-soak fix: ssss > 16 (invalid per T.81) must be
    rejected by BOTH implementations — native previously shifted by
    an out-of-range count (UB), Python read an arbitrary bit width."""
    bits = [2] + [0] * 15
    scan = _ljpeg_scan(bits, [0, 20], 2, 1, bytes([0b10000000]))
    py, nat = _decode_both(scan)
    assert py is None and nat is None


def test_ljpeg_bad_precision_quarantines_everywhere():
    """r3 differential-soak fix: SOF3 precision outside 2..16 (and
    zero dimensions) reject in BOTH implementations — Python
    previously decoded with a corrupt predictor seed."""
    bits = [2] + [0] * 15
    for precision in (0, 1, 17, 255):
        scan = _ljpeg_scan(bits, [0, 4], 2, 1, bytes([0b10000100]),
                           precision=precision)
        py, nat = _decode_both(scan)
        assert py is None and nat is None, precision


def test_ljpeg_eof_all_ones_padding_matches():
    """r3 differential-soak fix: reads past the entropy data follow
    the T.81 all-ones padding convention in both implementations
    (Python previously raised IndexError->quarantine where native
    decoded)."""
    bits = [2] + [0] * 15
    scan = _ljpeg_scan(bits, [0, 4], 4, 2, b"")  # empty entropy data
    py, nat = _decode_both(scan)
    assert py is not None and nat is not None
    np.testing.assert_array_equal(py, nat)


def test_decode_four_component_ljpeg(tmp_path, rng):
    """Quadrant-mapped 4-component lossless scans (DNG/NEF layout)."""
    m = rng.integers(0, 16384, size=(20, 28), dtype=np.uint16)
    path = tmp_path / "quad.dng"
    write_synthetic_raw(path, m, bpp=14, compression="ljpeg4")
    raw = decode_raw(path)
    assert (raw.mosaic == m).all()


def test_decode_multi_strip_ljpeg(tmp_path, rng):
    m = rng.integers(0, 4096, size=(24, 20), dtype=np.uint16)
    path = tmp_path / "strips.dng"
    write_synthetic_raw(path, m, compression="ljpeg", rows_per_strip=8)
    raw = decode_raw(path)
    assert (raw.mosaic == m).all()


def test_per_site_black_levels(tmp_path, rng):
    """DNG 4-value BlackLevel (2x2 repeat): decoded per site, mean as
    the scalar; accurate-mode engine folds the site deltas in."""
    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.engine import DevelopEngine

    m = rng.integers(300, 4096, size=(16, 24), dtype=np.uint16)
    path = tmp_path / "b4.dng"
    write_synthetic_raw(path, m, black_level=(64, 66, 66, 70),
                        white_level=4000)
    raw = decode_raw(path)
    assert raw.black_per_site is not None
    assert raw.black_per_site.shape == (2, 2)
    assert raw.black_level == pytest.approx(66.5)

    eng = DevelopEngine.open(path, mode="accurate")
    # Site deltas folded at staging: R sites (0,0) lowered by 64-66.5.
    staged = np.asarray(eng.mosaic)
    assert staged[0, 0] == np.clip(int(m[0, 0]) + 2.5, 0, 65535).astype(int)
    out = eng.full(EditParams())
    assert out.shape == (16, 24, 3)


def test_cr3_container_recognized(tmp_path, rng):
    """ISO-BMFF (CR3): sensor decode raises a precise UnsupportedRawError
    while the embedded preview still feeds the tier cache (the reference
    can't decode CR3 either — rawloader has no CRX support)."""
    import struct as _struct

    jpeg = make_preview_jpeg(32, 24)
    ftyp = _struct.pack(">I", 16) + b"ftypcrx " + b"\x00\x00\x00\x01"
    mdat = _struct.pack(">I", 8 + len(jpeg)) + b"mdat" + jpeg
    blob = ftyp + mdat
    path = tmp_path / "shot.cr3"
    path.write_bytes(blob)

    with pytest.raises(UnsupportedRawError, match="crx"):
        decode_raw(path)
    assert extract_preview_jpeg(path) == jpeg

    # Import + tier pipeline works end to end; develop quarantines.
    from raweditor_tpu.catalog import Library
    from raweditor_tpu.pipeline.tiers import process_pending_cache

    lib = Library(tmp_path / "cat.db")
    lib.import_folder(tmp_path)
    stats = process_pending_cache(lib, cache_dir=tmp_path / "cache",
                                  )
    assert stats["cached"] == 1
    lib.close()


def test_preview_tag_garbage_falls_back_to_scan(tmp_path, rng):
    """JPEGInterchange tags pointing at in-bounds non-JPEG bytes must
    not suppress the whole-file marker scan (code-review r3): the tag
    fast path SOI-checks its candidate like every other fast path."""
    import numpy as np

    from raweditor_tpu.raw.decode import extract_preview_jpeg
    from raweditor_tpu.raw.synth import (make_preview_jpeg,
                                         write_synthetic_raw)

    real = make_preview_jpeg()
    path = tmp_path / "badtag.nef"
    write_synthetic_raw(
        path, rng.integers(0, 4096, size=(16, 24), dtype=np.uint16),
        preview_jpeg=b"\x00\x00" + real)
    got = extract_preview_jpeg(str(path))
    assert got is not None and got[:2] == b"\xff\xd8"


# --- corrupt tag *types* (code-review r3) ----------------------------------
# A mutated type field makes get_scalar return non-int values (str,
# rational float, negative SLONG); every such value must quarantine or
# fall back, never escape as TypeError or a silent wrong decode.

import struct as _struct


def _patch_tag(data: bytes, tag: int, new_type=None, new_value=None):
    """Rewrite a TIFF IFD entry's type/inline-value fields in place,
    walking the IFD chain and SubIFDs."""
    b = bytearray(data)
    assert b[:4] == b"II*\0"
    stack = [_struct.unpack_from("<I", b, 4)[0]]
    while stack:
        off = stack.pop()
        if not off:
            continue
        (n,) = _struct.unpack_from("<H", b, off)
        for i in range(n):
            e = off + 2 + 12 * i
            t, typ, cnt = _struct.unpack_from("<HHI", b, e)
            if t == tag:
                if new_type is not None:
                    _struct.pack_into("<H", b, e + 2, new_type)
                if new_value is not None:
                    _struct.pack_into("<i", b, e + 8, new_value)
                return bytes(b)
            if t == 330:  # SubIFD offsets
                if cnt == 1:
                    stack.append(_struct.unpack_from("<I", b, e + 8)[0])
                else:
                    (voff,) = _struct.unpack_from("<I", b, e + 8)
                    stack.extend(
                        _struct.unpack_from(f"<{cnt}I", b, voff))
        stack.append(_struct.unpack_from("<I", b, off + 2 + 12 * n)[0])
    raise AssertionError(f"tag {tag} not found")


def test_tile_dims_type_mutations_quarantine(rng):
    m = rng.integers(0, 4096, size=(32, 32), dtype=np.uint16)
    base = write_synthetic_raw(None, m, compression="ljpeg",
                               tile_size=(16, 16))
    assert (decode_raw(base).mosaic == m).all()
    # TileWidth type → ASCII: arithmetic on a str must not escape as
    # TypeError.
    with pytest.raises(RawDecodeError):
        decode_raw(_patch_tag(base, 322, new_type=2))
    # TileWidth type → SLONG -16: empty range loops otherwise return a
    # silent all-zero mosaic as a "successful" decode.
    with pytest.raises(RawDecodeError):
        decode_raw(_patch_tag(base, 322, new_type=9, new_value=-16))


def test_ljpeg_bps_tag_mutation_quarantines(rng):
    m = rng.integers(0, 4096, size=(16, 16), dtype=np.uint16)
    base = write_synthetic_raw(None, m, compression="ljpeg")
    assert (decode_raw(base).mosaic == m).all()
    # BitsPerSample → 32 passes the SOF3 decode (precision comes from
    # the scan header) but must not set white_level to 2^32-1 and
    # develop near-black.
    with pytest.raises(RawDecodeError):
        decode_raw(_patch_tag(base, 258, new_value=32))


def _ifd_entry_offsets(data: bytes):
    """Byte offsets of every IFD entry in a little-endian TIFF-family
    container (IFD chain + SubIFDs + Exif IFD)."""
    b = data
    assert b[:2] == b"II"
    offs = []
    stack = [_struct.unpack_from("<I", b, 4)[0]]
    seen = set()
    while stack:
        off = stack.pop()
        if not off or off in seen or off + 2 > len(b):
            continue
        seen.add(off)
        (n,) = _struct.unpack_from("<H", b, off)
        if off + 2 + 12 * n + 4 > len(b):
            continue
        for i in range(n):
            e = off + 2 + 12 * i
            offs.append(e)
            t, typ, cnt = _struct.unpack_from("<HHI", b, e)
            if t in (330, 34665):  # SubIFDs / Exif IFD
                if cnt == 1:
                    stack.append(_struct.unpack_from("<I", b, e + 8)[0])
                else:
                    (voff,) = _struct.unpack_from("<I", b, e + 8)
                    if voff + 4 * cnt <= len(b):
                        stack.extend(
                            _struct.unpack_from(f"<{cnt}I", b, voff))
        stack.append(_struct.unpack_from("<I", b, off + 2 + 12 * n)[0])
    return offs


def test_tag_type_mutation_sweep(rng):
    """Systematic tag-TYPE corruption: for EVERY IFD entry of a set of
    representative containers, rewrite the type field to ASCII /
    RATIONAL / FLOAT (get_scalar then returns str/float) and to SLONG
    with a negative inline value. Decode must succeed or raise
    RawDecodeError — never TypeError/struct.error (code-review r3:
    the random byte-flip fuzz above only rarely lands on type fields)."""
    m = rng.integers(0, 4096, size=(10, 12), dtype=np.uint16)
    bases = [
        write_synthetic_raw(None, m, compression="none"),
        write_synthetic_raw(None, m, compression="ljpeg"),
        write_synthetic_raw(None, m, tile_size=(8, 4)),
    ]
    from raweditor_tpu.raw.synth import (write_synthetic_linear_dng,
                                         write_synthetic_orf,
                                         write_synthetic_rw2)

    rgb = rng.integers(0, 4096, size=(6, 8, 3), dtype=np.uint16)
    bases.append(write_synthetic_linear_dng(None, rgb, bpp=12))
    bases.append(write_synthetic_orf(None, m))
    from raweditor_tpu.raw.panasonic import rw2_representable

    m14 = rw2_representable(
        rng.integers(0, 4096, size=(8, 28), dtype=np.uint16))
    bases.append(write_synthetic_rw2(None, m14))
    for base in bases:
        for e in _ifd_entry_offsets(base):
            for new_type, new_val in ((2, None), (5, None), (9, -16),
                                      (11, None)):
                blob = bytearray(base)
                _struct.pack_into("<H", blob, e + 2, new_type)
                if new_val is not None:
                    _struct.pack_into("<i", blob, e + 8, new_val)
                try:
                    decode_raw(bytes(blob))
                except RawDecodeError:
                    pass


def test_preview_tag_type_mutation_falls_back(rng):
    m = rng.integers(0, 4096, size=(16, 16), dtype=np.uint16)
    jpeg = make_preview_jpeg(24, 16)
    base = write_synthetic_raw(None, m, preview_jpeg=jpeg)
    assert extract_preview_jpeg(base) == jpeg
    # JPEGInterchangeFormat type → ASCII / RATIONAL: the fast path must
    # skip it and the marker scan must still find the embedded JPEG.
    for new_type in (2, 5):
        got = extract_preview_jpeg(_patch_tag(base, 513,
                                              new_type=new_type))
        assert got is not None and got[:2] == b"\xff\xd8"
        assert got == jpeg
