"""Kodak DCR/KDC compression-65000 codec and container."""

import numpy as np
import pytest

from raweditor_tpu.native import get_rawkit
from raweditor_tpu.raw.kodak import decode_kodak65000, encode_kodak65000
from raweditor_tpu.raw.decode import decode_raw
from raweditor_tpu.raw.synth import write_synthetic_raw

rk = get_rawkit()


@pytest.mark.parametrize("shape", [(4, 20), (7, 256), (10, 300), (3, 516)])
def test_kodak_round_trip(shape, rng):
    m = rng.integers(0, 4096, size=shape).astype(np.uint16)
    data = encode_kodak65000(m)
    assert np.array_equal(decode_kodak65000(data, shape[1], shape[0]), m)


def test_kodak_extremes(rng):
    for m in (np.zeros((5, 260), np.uint16),
              np.full((5, 260), 4095, np.uint16),
              np.kron(rng.integers(0, 2, size=(3, 65)) * 4095,
                      np.ones((2, 4))).astype(np.uint16)):
        h, w = m.shape
        assert np.array_equal(
            decode_kodak65000(encode_kodak65000(m), w, h), m)


def test_kodak_uncompressed_segment_fallback():
    """A segment whose first length nibble exceeds 12 switches to the
    published six-u16s-per-eight-values layout; bytes built by hand
    from that layout (vals[2]=0xEFF makes the first byte 0xFF)."""
    vals = [0x123, 0x456, 0xEFF, 0xDEF, 0x111, 0x222, 0x333, 0x9FF]
    r = [vals[2 + j] & 0xFFF for j in range(6)]
    for k, src in ((0, vals[0]), (1, vals[1])):
        r[k + 0] |= ((src >> 8) & 15) << 12
        r[k + 2] |= ((src >> 4) & 15) << 12
        r[k + 4] |= (src & 15) << 12
    payload = b"".join(v.to_bytes(2, "little") for v in r)
    assert payload[0] & 15 > 12  # the escape trigger
    out = decode_kodak65000(payload, 8, 1)
    assert out[0].tolist() == vals
    if rk is not None:
        c = np.frombuffer(rk.decode_kodak65000(payload, 8, 1), np.uint16)
        assert c.tolist() == vals


@pytest.mark.skipif(rk is None, reason="native ext not built")
def test_kodak_native_matches_python(rng):
    m = rng.integers(0, 4096, size=(12, 300)).astype(np.uint16)
    data = encode_kodak65000(m)
    c = np.frombuffer(rk.decode_kodak65000(data, 300, 12),
                      np.uint16).reshape(12, 300)
    assert np.array_equal(c, m)


def test_kodak_truncated_quarantines(rng):
    from raweditor_tpu.raw.decode import RawDecodeError

    m = rng.integers(0, 4096, size=(8, 256)).astype(np.uint16)
    data = write_synthetic_raw(None, m, compression="kodak65000",
                               make="EASTMAN KODAK")
    with pytest.raises(RawDecodeError):
        decode_raw(data[: len(data) - 400])


def test_decode_dcr_container(tmp_path, rng):
    m = rng.integers(0, 4096, size=(20, 280)).astype(np.uint16)
    path = tmp_path / "a.dcr"
    write_synthetic_raw(path, m, compression="kodak65000",
                        make="EASTMAN KODAK", model="DCS Pro")
    raw = decode_raw(path)
    assert np.array_equal(raw.mosaic, m)
    assert raw.camera_make == "EASTMAN KODAK"
