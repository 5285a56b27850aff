"""Canon CR3 CRX lossless codec.

Same strategy as the other codec suites: Python behavioral reference,
synth containers round-tripped through decode_raw, corrupt input
quarantined, a hand-derived decoder-only golden stream, and (when the
extension is built) C++/Python parity. The CRX decode goes BEYOND the
reference app, whose rawloader backend has no CR3 sensor support
(reference: raw/loader.rs:50-54 — .cr3 imports quarantine there too).
"""

import struct

import numpy as np
import pytest

from raweditor_tpu.native import get_rawkit
from raweditor_tpu.raw import crx
from raweditor_tpu.raw.bmff import BmffFile, write_synthetic_cr3
from raweditor_tpu.raw.decode import (RawDecodeError, decode_raw,
                                      extract_preview_jpeg)

rk = get_rawkit()


def _scene(rng, h, w, bits):
    """Sensor-like plane: smooth field + photon-ish noise."""
    base = (np.sin(np.linspace(0, 3, w))[None]
            * np.cos(np.linspace(0, 2, h))[:, None])
    m = ((base * 0.4 + 0.5) * ((1 << bits) - 1)).astype(np.int64)
    m += rng.integers(-200, 200, size=(h, w))
    return np.clip(m, 0, (1 << bits) - 1).astype(np.uint16)


# --- entropy layer ----------------------------------------------------------


@pytest.mark.parametrize("bits", [10, 12, 14, 16])
def test_plane_round_trip(rng, bits):
    plane = _scene(rng, 12, 20, bits)
    blob = crx._encode_plane(plane, bits, 3)
    assert np.array_equal(crx._decode_plane(blob, 20, 12, bits, 3),
                          plane)


def test_plane_extremes(rng):
    for fill in (0, (1 << 14) - 1):
        plane = np.full((6, 10), fill, np.uint16)
        blob = crx._encode_plane(plane, 14, 0)
        assert np.array_equal(
            crx._decode_plane(blob, 10, 6, 14, 0), plane)
    # Alternating max-contrast forces the escape path.
    plane = np.zeros((4, 8), np.uint16)
    plane[:, 1::2] = (1 << 14) - 1
    blob = crx._encode_plane(plane, 14, 0)
    assert np.array_equal(crx._decode_plane(blob, 8, 4, 14, 0), plane)


def test_k_adaptation_rule():
    """Pin the adaptation: grow past 2x/5x overshoot, shrink under
    half of 2^k, clamped to [0, K_MAX]."""
    assert crx._adapt_k(0, 0) == 0      # shrink clamped at 0
    assert crx._adapt_k(3, 3) == 2      # 3*2 < 8 -> shrink
    assert crx._adapt_k(3, 4) == 3      # 4*2 == 8: not under -> steady
    assert crx._adapt_k(3, 20) == 3     # 2 < 20>>3=2? no; steady
    assert crx._adapt_k(3, 25) == 4     # 25>>3=3 > 2 -> grow
    assert crx._adapt_k(3, 50) == 5     # 50>>3=6 > 5 -> grow twice
    assert crx._adapt_k(crx.K_MAX, 10**6) == crx.K_MAX


def test_golden_plane_hand_derived():
    """Decoder-only golden: 2x2 plane, 8-bit, k_init=0, derived by
    hand from the coding rules in the module docstring (NOT produced
    by the encoder):

      (0,0) pred=128 (half-range), err=+2, zigzag u=4, k=0:
            unary 4 -> 00001                     (k grows to 1)
      (0,1) pred=left=130, err=-1, u=1, k=1: q=0 -> 1, low bit 1
      (1,0) pred=top=130, err=+1, u=2, k=1: q=1 -> 01, low bit 0
      (1,1) W=131 N=129 NW=130 -> MED=W+N-NW=130, err=+1 -> 01 0

      bits 00001 11 010 010 -> bytes 0E 90
    """
    got = crx._decode_plane(b"\x0e\x90", 2, 2, 8, 0)
    assert got.tolist() == [[130, 129], [131, 131]]


def test_native_plane_parity(rng):
    if rk is None or not hasattr(rk, "decode_crx_plane"):
        pytest.skip("native CRX fast path not built")
    for bits in (10, 12, 14):
        plane = _scene(rng, 16, 24, bits)
        blob = crx._encode_plane(plane, bits, 2)
        raw = rk.decode_crx_plane(blob, 24, 16, bits, 2)
        got = np.frombuffer(raw, np.uint16).reshape(16, 24)
        assert np.array_equal(got, plane)


# --- full codec (markers + tiles) -------------------------------------------


@pytest.mark.parametrize("tiles", [(1, 1), (2, 1), (1, 2), (2, 2)])
def test_codec_round_trip_tiled(rng, tiles):
    tc, tr = tiles
    m = _scene(rng, 24, 32, 14)
    c = crx.make_cmp1(32, 24, n_bits=14, tile_cols=tc, tile_rows=tr)
    assert np.array_equal(crx.decode_crx(crx.encode_crx(m, c), c), m)


def test_cmp1_pack_parse_round_trip():
    c = crx.make_cmp1(6000, 4000, n_bits=14, tile_cols=2)
    c2 = crx.Cmp1(c.pack())
    assert (c2.f_width, c2.f_height, c2.tile_width, c2.tile_height,
            c2.n_bits, c2.n_planes, c2.cfa_layout, c2.enc_type,
            c2.image_levels) == (6000, 4000, 3000, 4000, 14, 4, 0, 0, 0)


def test_cmp1_rejects_nonsense():
    c = crx.make_cmp1(16, 8)
    good = bytearray(c.pack())
    for mut in [(4, 0xFF),   # version
                (8, 0xFF),   # width sign bit
                (24, 0x02)]:  # 2-bit samples
        blob = bytearray(good)
        blob[mut[0]] = mut[1]
        with pytest.raises(ValueError):
            crx.Cmp1(bytes(blob))


def test_unsupported_modes_rejected(rng):
    c = crx.make_cmp1(16, 8)
    payload = crx.encode_crx(np.zeros((8, 16), np.uint16), c)
    c.enc_type = 3
    with pytest.raises(ValueError, match="lossless"):
        crx.decode_crx(payload, c)
    c.enc_type = 0
    c.image_levels = 4
    with pytest.raises(ValueError, match="levels"):
        crx.decode_crx(payload, c)


# --- C-RAW (wavelet) path ----------------------------------------------------


def test_dwt53_round_trip_exact(rng):
    for shape in [(8, 8), (7, 9), (1, 5), (5, 1), (16, 12), (2, 2)]:
        a = rng.integers(-20000, 20000, size=shape).astype(np.int64)
        back = crx.dwt53_inverse(*crx.dwt53_forward(a))
        assert np.array_equal(back, a), shape


@pytest.mark.parametrize("levels", [1, 2, 3])
def test_craw_q1_is_lossless(rng, levels):
    """5/3 lifting is reversible: levels > 0 with q_detail=1 must
    round-trip bit-exactly — pins the lifting, the band codec, and the
    multi-band marker chain all at once."""
    m = _scene(rng, 24, 32, 14)
    c = crx.make_cmp1(32, 24, levels=levels)
    assert np.array_equal(
        crx.decode_crx(crx.encode_crx(m, c, q_detail=1), c), m)


def test_craw_lossy_close_and_idempotent(rng):
    m = _scene(rng, 32, 48, 14)
    c = crx.make_cmp1(48, 32, levels=2)
    payload = crx.encode_crx(m, c, q_detail=16)
    out = crx.decode_crx(payload, c)
    err = np.abs(out.astype(int) - m.astype(int))
    assert err.max() < 64  # q/2-scale error through 2 levels
    # Re-encoding the decode must be a fixed point (like the ARW2
    # lossy contract).
    out2 = crx.decode_crx(crx.encode_crx(out, c, q_detail=16), c)
    assert np.array_equal(out2, out)
    # And it actually compresses vs the lossless path.
    assert len(payload) < len(crx.encode_crx(m, crx.make_cmp1(48, 32)))


def test_craw_rate_quality_ladder(rng):
    """Bigger quantizers must compress harder and reconstruct worse —
    the C-RAW rate/quality trade is monotone."""
    m = _scene(rng, 32, 48, 14)
    c = crx.make_cmp1(48, 32, levels=2)
    sizes, errs = [], []
    for q in (1, 8, 64):
        payload = crx.encode_crx(m, c, q_detail=q)
        out = crx.decode_crx(payload, c)
        sizes.append(len(payload))
        errs.append(float(np.mean(
            (out.astype(np.float64) - m.astype(np.float64)) ** 2)))
    assert sizes[0] > sizes[1] > sizes[2]
    assert errs[0] == 0.0 and errs[0] < errs[1] < errs[2]


def test_craw_cr3_container_round_trip(tmp_path, rng):
    m = _scene(rng, 32, 48, 14)
    path = tmp_path / "craw.cr3"
    write_synthetic_cr3(path, mosaic=m, levels=2, q_detail=8,
                        model="EOS R10 CRAW")
    img = decode_raw(path)
    assert img.camera_model == "EOS R10 CRAW"
    assert np.abs(img.mosaic.astype(int) - m.astype(int)).max() < 32


def test_craw_band_native_parity(rng):
    if rk is None or not hasattr(rk, "decode_crx_band"):
        pytest.skip("native CRX band decoder not built")
    band = rng.integers(-5000, 5000, size=(16, 24)).astype(np.int32)
    blob = crx._encode_band(band, 2)
    raw = np.frombuffer(rk.decode_crx_band(blob, 24, 16, 2), np.int32)
    assert np.array_equal(raw.reshape(16, 24), band)


def test_marker_chain_errors():
    c = crx.make_cmp1(8, 8)
    payload = bytearray(crx.encode_crx(np.zeros((8, 8), np.uint16), c))
    with pytest.raises(ValueError, match="marker"):
        crx.decode_crx(bytes(payload[:10]), c)  # truncated chain
    bad = bytearray(payload)
    bad[0] = 0xAA  # wrong tile signature
    with pytest.raises(ValueError, match="expected marker"):
        crx.decode_crx(bytes(bad), c)
    bad = bytearray(payload)
    struct.pack_into(">I", bad, 4, 2)  # tile claims 2 payload bytes
    with pytest.raises(ValueError):
        crx.decode_crx(bytes(bad), c)


# --- container wiring --------------------------------------------------------


def test_cr3_decode_raw_round_trip(tmp_path, rng):
    m = _scene(rng, 32, 48, 14)
    path = tmp_path / "r5.cr3"
    write_synthetic_cr3(path, mosaic=m, model="EOS R5 Synth",
                        tile_cols=2)
    img = decode_raw(path)
    assert np.array_equal(img.mosaic, m)
    assert img.camera_model == "EOS R5 Synth"
    assert img.white_level == (1 << 14) - 1
    assert img.cfa_pattern == "RGGB"


def test_cr3_twelve_bit_white_level(rng):
    m = _scene(rng, 16, 24, 12)
    data = write_synthetic_cr3(None, mosaic=m, n_bits=12)
    img = decode_raw(data)
    assert img.white_level == 4095.0
    assert np.array_equal(img.mosaic, m)


def test_cr3_raw_track_locator(rng):
    m = _scene(rng, 16, 24, 14)
    data = write_synthetic_cr3(None, mosaic=m)
    bf = BmffFile(data)
    track = bf.raw_track()
    assert track is not None
    cmp1_payload, offset, size = track
    assert crx.Cmp1(cmp1_payload).f_width == 24
    assert data[offset:offset + size] == crx.encode_crx(
        m, crx.make_cmp1(24, 16))


def test_cr3_without_craw_track_still_quarantines():
    data = write_synthetic_cr3(None)
    with pytest.raises(RawDecodeError, match="ISO-BMFF"):
        decode_raw(data)


def test_cr3_preview_still_extracted_with_sensor_track(rng):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    ).save(buf, format="JPEG")
    m = _scene(rng, 16, 24, 14)
    data = write_synthetic_cr3(None, mosaic=m,
                               preview_jpeg=buf.getvalue())
    assert extract_preview_jpeg(data) is not None
    assert np.array_equal(decode_raw(data).mosaic, m)


def test_corrupt_sensor_payload_quarantines(rng):
    m = _scene(rng, 16, 24, 14)
    base = bytearray(write_synthetic_cr3(None, mosaic=m))
    bf = BmffFile(bytes(base))
    _, offset, size = bf.raw_track()
    for _ in range(30):
        blob = bytearray(base)
        pos = offset + int(rng.integers(0, size))
        blob[pos] ^= 0xFF
        try:
            decode_raw(bytes(blob))
        except RawDecodeError:
            pass  # the contract: RawDecodeError or a clean decode
