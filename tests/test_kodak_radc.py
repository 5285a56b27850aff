"""Kodak RADC codec (DC40/DC50 class) and container.

Validation follows the reconstructed-codec pattern (docs/formats.md):
code-table completeness, encode/decode fixed-point idempotency (the
codec is inherently lossy — the ARW2/RW2 fixture pattern), a
hand-assembled golden stream pinning the bit layout, C++↔Python
differential parity incl. mutation fuzz, and quarantine on stream
inconsistencies. The shared mutation corpus in test_raw_decode.py
also carries a RADC base.
"""

import numpy as np
import pytest

from raweditor_tpu.native import get_rawkit
from raweditor_tpu.raw import kodak_radc as kr
from raweditor_tpu.raw.decode import RawDecodeError, decode_raw
from raweditor_tpu.raw.synth import write_synthetic_raw

rk = get_rawkit()


def test_radc_tables_are_complete_prefix_codes():
    for spec in kr._TABLE_SPEC:
        assert sum(256 >> ln for ln, _ in spec) == 256
    # transition table 0 (after a run) must not contain the run token
    assert 0 not in [v for _, v in kr._TABLE_SPEC[0]]
    # tables 1-8 are complete over the token alphabet 0..8
    for t in range(1, 9):
        assert sorted(v for _, v in kr._TABLE_SPEC[t]) == list(range(9))
    # magnitude classes 1..7 are symmetric over 0, ±1..±k
    for k in range(1, 8):
        vals = sorted(v for _, v in kr._TABLE_SPEC[10 + k])
        assert vals == list(range(-k, k + 1))


@pytest.mark.parametrize("shape", [(4, 8), (8, 16), (12, 24), (16, 48)])
def test_radc_representable_round_trip(shape, rng):
    m = kr.radc_representable(
        rng.integers(0, kr.WHITE + 1, size=shape).astype(np.uint16))
    h, w = shape
    assert np.array_equal(kr.decode_radc(kr.encode_radc(m), w, h), m)


def test_radc_extremes(rng):
    cases = [
        np.zeros((4, 8), np.uint16),
        np.full((4, 8), kr.WHITE, np.uint16),
        np.kron(rng.integers(0, 2, (4, 8)) * kr.WHITE,
                np.ones((2, 2))).astype(np.uint16),
        # smooth ramp exercises runs and small magnitude classes
        (np.add.outer(np.arange(8) * 16, np.arange(40) * 8)
         % 0x4000).astype(np.uint16),
    ]
    for m in cases:
        h, w = m.shape
        rep = kr.radc_representable(m)
        assert np.array_equal(kr.decode_radc(kr.encode_radc(rep), w, h),
                              rep)


def test_radc_long_runs_and_muls(rng):
    """A constant field rides the run path with nreps continuation
    (w2/2 > 9 pairs per pass); non-default multipliers exercise the
    rescale arithmetic."""
    m = kr.radc_representable(np.full((8, 48), 2000, np.uint16))
    assert np.array_equal(kr.decode_radc(kr.encode_radc(m), 48, 8), m)
    rep = kr.decode_radc(
        kr.encode_radc(np.full((8, 48), 2000, np.uint16),
                       muls=[20, 9, 33]), 48, 8)
    for _ in range(8):
        nxt = kr.decode_radc(kr.encode_radc(rep, muls=[20, 9, 33]),
                             48, 8)
        if np.array_equal(nxt, rep):
            break
        rep = nxt
    assert np.array_equal(
        kr.decode_radc(kr.encode_radc(rep, muls=[20, 9, 33]), 48, 8),
        rep)


class _Bits:
    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def tobytes(self):
        bits = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(
            int("".join(map(str, bits[i:i + 8])), 2)
            for i in range(0, len(bits), 8))


def test_radc_golden_stream():
    """Hand-assembled 4x8 stream: three multipliers of 16 (identity
    rescale), every pass coded in direct mode with sample code 10
    (buf = (10*8+4)*16 = 1344). Expected output derived by hand:
    plane value 1344 everywhere; checkerboard positions become
    (1344-2048)*2 + 1344 = -64 -> 0; the tone curve maps 1344 -> 1484
    (segment 2) and 0 -> 0."""
    wr = _Bits()
    for _ in range(3):
        wr.put(16, 6)
    # token 8 codes: table 1 = '11111111' (8 bits), table 8 = '1'
    for _pass in range(4):  # c0 r0, c0 r1, c1, c2
        wr.put(0xFF, 8)     # tree token 8 via table 1
        for _ in range(4):
            wr.put(10, 5)   # direct codes (8-3 bits)
        wr.put(0, 1)        # tree token 8 via table 8 (code '0')
        for _ in range(4):
            wr.put(10, 5)
    got = kr.decode_radc(wr.tobytes(), 8, 4)
    expect = np.zeros((4, 8), np.uint16)
    ys, xs = np.mgrid[0:4, 0:8]
    expect[(ys + xs) % 2 == 0] = 1484
    assert np.array_equal(got, expect)
    assert int(kr._CURVE[1344]) == 1484  # pins the curve segment math
    if rk is not None and hasattr(rk, "decode_radc"):
        nat = np.frombuffer(rk.decode_radc(wr.tobytes(), 8, 4),
                            np.uint16).reshape(4, 8)
        assert np.array_equal(nat, got)


def test_radc_container_round_trip(tmp_path, rng):
    m = kr.radc_representable(
        rng.integers(0, kr.WHITE + 1, size=(8, 16)).astype(np.uint16))
    path = tmp_path / "a.kdc"
    write_synthetic_raw(path, m, bpp=14, compression="radc",
                        make="KODAK", model="DC50 Synth")
    raw = decode_raw(path)
    assert np.array_equal(raw.mosaic, m)
    assert raw.white_level == float(kr.WHITE)
    assert raw.camera_make == "KODAK"


def test_radc_truncated_quarantines(rng):
    m = kr.radc_representable(
        rng.integers(0, kr.WHITE + 1, size=(8, 16)).astype(np.uint16))
    blob = write_synthetic_raw(None, m, bpp=14, compression="radc")
    with pytest.raises(RawDecodeError):
        decode_raw(blob[: len(blob) - 30])


def test_radc_stream_inconsistencies_raise():
    with pytest.raises(ValueError, match="multiples of 4"):
        kr.decode_radc(bytes(64), 6, 4)
    # zero channel multiplier
    wr = _Bits()
    wr.put(0, 6)
    with pytest.raises(ValueError, match="multiplier"):
        kr.decode_radc(wr.tobytes() + bytes(8), 8, 4)
    # empty stream
    with pytest.raises(ValueError, match="truncated"):
        kr.decode_radc(b"", 8, 4)


@pytest.mark.skipif(rk is None or not hasattr(rk, "decode_radc"),
                    reason="native ext without radc")
def test_radc_native_matches_python(rng):
    for shape in [(4, 8), (8, 16), (16, 32)]:
        h, w = shape
        m = kr.radc_representable(
            rng.integers(0, kr.WHITE + 1, size=shape).astype(np.uint16))
        blob = kr.encode_radc(m)
        c = np.frombuffer(rk.decode_radc(blob, w, h),
                          np.uint16).reshape(shape)
        assert np.array_equal(c, m)


@pytest.mark.skipif(rk is None or not hasattr(rk, "decode_radc"),
                    reason="native ext without radc")
def test_radc_native_matches_python_on_mutations(rng):
    """Differential fuzz: both implementations agree on mutated
    streams — same mosaic or both reject."""
    m = kr.radc_representable(
        rng.integers(0, kr.WHITE + 1, size=(8, 16)).astype(np.uint16))
    base = kr.encode_radc(m)
    for _ in range(150):
        blob = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            blob[int(rng.integers(0, len(blob)))] = int(
                rng.integers(0, 256))
        blob = bytes(blob)
        try:
            py = kr.decode_radc(blob, 16, 8)
        except ValueError:
            py = None
        try:
            nat = np.frombuffer(rk.decode_radc(blob, 16, 8),
                                np.uint16).reshape(8, 16)
        except ValueError:
            nat = None
        if py is None or nat is None:
            assert py is None and nat is None
        else:
            assert np.array_equal(py, nat)
