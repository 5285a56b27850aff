"""Samsung SRW v3 codec (compression 32772, NX1 class) and container.

Validation follows the round-2 pattern for reconstructed codecs
(docs/formats.md): encoder/decoder round-trip across every
optimization-flag combination, a hand-assembled golden stream pinning
the bit layout independently of the encoder, C++↔Python parity,
quarantine on every inconsistency, and mutation fuzz (the shared
corpus in test_raw_decode.py also carries an srw3 base).
"""

import numpy as np
import pytest

from raweditor_tpu.native import get_rawkit
from raweditor_tpu.raw import samsung3
from raweditor_tpu.raw.decode import RawDecodeError, decode_raw
from raweditor_tpu.raw.synth import write_synthetic_raw

rk = get_rawkit()


@pytest.mark.parametrize("shape", [(1, 16), (4, 16), (9, 32), (16, 48),
                                   (3, 80)])
def test_srw3_round_trip(shape, rng):
    m = rng.integers(0, 4096, size=shape).astype(np.uint16)
    blob = samsung3.encode_srw3(m)
    assert np.array_equal(
        samsung3.decode_srw3(blob, shape[1], shape[0]), m)


@pytest.mark.parametrize("optflags", range(8))
@pytest.mark.parametrize("depth", [12, 14])
def test_srw3_round_trip_all_optflags(optflags, depth, rng):
    """Every combination of OPT_SKIP / OPT_MV / OPT_QP changes the
    stream syntax; all must round-trip at both sensor depths."""
    m = rng.integers(0, 1 << depth, size=(11, 48)).astype(np.uint16)
    blob = samsung3.encode_srw3(m, optflags=optflags, depth=depth)
    assert np.array_equal(samsung3.decode_srw3(blob, 48, 11), m)


def test_srw3_extremes(rng):
    cases = [
        np.zeros((6, 16), np.uint16),
        np.full((6, 16), 4095, np.uint16),
        np.kron(rng.integers(0, 2, (3, 4)) * 4095,
                np.ones((2, 4))).astype(np.uint16),
        # smooth ramp exercises the adaptive-length flags + block reuse
        (np.add.outer(np.arange(8) * 3, np.arange(64)) % 4096).astype(
            np.uint16),
    ]
    for m in cases:
        h, w = m.shape
        blob = samsung3.encode_srw3(m)
        assert np.array_equal(samsung3.decode_srw3(blob, w, h), m)


class _Bits:
    """Independent MSB-first-in-LE-u32-words writer for the golden."""

    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def tobytes(self):
        words = []
        bits = self.bits + [0] * (-len(self.bits) % 32)
        for i in range(0, len(bits), 32):
            w = 0
            for b in bits[i:i + 32]:
                w = (w << 1) | b
            words.append(w)
        return b"".join(w.to_bytes(4, "little") for w in words)


def test_srw3_golden_block():
    """Hand-assembled single-row stream pinning the exact bit layout:
    QP opcode, motion bit, the four 2-bit length flags against the
    seeded history (keep/inc/explicit/dec), residual order (one color
    plane then the other) and sign extension."""
    wr = _Bits()
    wr.put(0, 2)        # QP opcode 0: scale stays 0
    wr.put(1, 1)        # motion bit 1 -> mode 7 (previous pixels/init)
    wr.put(0, 1)        # length flags present
    # Row 0 contexts: quartets 0,1 -> ctx 2; quartets 2,3 -> ctx 0
    # (seeds [7,7]).
    wr.put(0, 2)        # j0 keep        -> 7   (ctx2 history [7,7])
    wr.put(1, 2)        # j1 increment   -> 8   (ctx2 now [7,8])
    wr.put(3, 2)        # j2 explicit...
    wr.put(5, 4)        # ...5           (ctx0 now [7,5])
    wr.put(2, 2)        # j3 decrement   -> 6   (= ctx0 head 7 - 1)
    diffs = list(range(-8, 8))          # residual i carries i-8
    lens = [7, 7, 7, 7, 8, 8, 8, 8, 5, 5, 5, 5, 6, 6, 6, 6]
    for d, n in zip(diffs, lens):
        wr.put(d & ((1 << n) - 1), n)
    header = bytes(9) + bytes([0]) + (12).to_bytes(2, "little") + \
        (2048).to_bytes(2, "little") + bytes(2)
    payload = header + wr.tobytes()
    got = samsung3.decode_srw3(payload, 16, 1)
    want = np.zeros(16, np.int32)
    for i, d in enumerate(diffs):
        t = ((i & 7) << 1) | (i >> 3)   # row 0: evens then odds
        want[t] = 2048 + d
    assert np.array_equal(got[0], want.astype(np.uint16))
    if rk is not None and hasattr(rk, "decode_srw3"):
        nat = np.frombuffer(rk.decode_srw3(payload, 16, 1), np.uint16)
        assert np.array_equal(nat, got[0])


def test_srw3_golden_motion_mode():
    """Hand-assembled 3-row stream pinning the motion-vector path:
    rows 0-1 in mode 7 (init/previous-pair prediction), row 2 in
    mode 2 — sliding-window offset -2 with averaging — whose green
    class references row-1 (parity-adjusted +1 on even rows) and
    whose other class references row-2, both clamped at the left
    edge. Also pins the explicit 4-bit length escape and the 9-bit
    sign extension."""
    wr = _Bits()

    def lengths(nb):
        wr.put(0, 1)            # length flags present
        for _ in range(4):
            wr.put(3, 2)        # explicit escape...
            wr.put(nb, 4)       # ...nb bits per residual

    def pad_row():
        wr.bits += [0] * (-len(wr.bits) % 128)  # 16-byte alignment

    # Row 0: all pixels 1200 = init 1000 + 200
    wr.put(0, 2)                # QP keep (scale 0)
    wr.put(1, 1)                # motion 7
    lengths(12)
    for _ in range(16):
        wr.put(200, 12)
    pad_row()
    # Row 1: all pixels 1400 = init 1000 + 400
    wr.put(0, 2)
    wr.put(1, 1)
    lengths(12)
    for _ in range(16):
        wr.put(400, 12)
    pad_row()
    # Row 2: motion mode 2 (slide -2, average). Class A (even cols on
    # this even row) refs row1 at col-1 (clamped) averaged with +2 →
    # 1400; class B (odd cols) refs row0 at col-2 (clamped) → 1200.
    wr.put(0, 2)
    wr.put(0, 1)                # motion escape...
    wr.put(2, 3)                # ...mode 2
    lengths(9)
    for _ in range(8):          # first 8 residuals land on even cols
        wr.put(-40 & 0x1FF, 9)
    for _ in range(8):          # then the odd cols
        wr.put(30, 9)
    pad_row()

    header = bytes(9) + bytes([0]) + (12).to_bytes(2, "little") + \
        (1000).to_bytes(2, "little") + bytes(2)
    payload = header + wr.tobytes()
    got = samsung3.decode_srw3(payload, 16, 3)
    want = np.empty((3, 16), np.uint16)
    want[0] = 1200
    want[1] = 1400
    want[2, 0::2] = 1400 - 40
    want[2, 1::2] = 1200 + 30
    assert np.array_equal(got, want)
    if rk is not None and hasattr(rk, "decode_srw3"):
        nat = np.frombuffer(rk.decode_srw3(payload, 16, 3),
                            np.uint16).reshape(3, 16)
        assert np.array_equal(nat, want)


def test_srw3_container_round_trip(tmp_path, rng):
    m = rng.integers(0, 4096, size=(12, 32)).astype(np.uint16)
    path = tmp_path / "a.srw"
    write_synthetic_raw(path, m, compression="srw3", make="SAMSUNG",
                        model="NX1 Synth", srw_wb=True,
                        srw_black=(64, 66, 66, 70))
    raw = decode_raw(path)
    assert np.array_equal(raw.mosaic, m)
    assert raw.camera_make == "SAMSUNG"
    np.testing.assert_allclose(raw.wb_multipliers, [2.0, 1.0, 10 / 7, 1.0],
                               rtol=1e-3)
    assert raw.black_level == pytest.approx(66.5)


def test_srw3_14bit_container(tmp_path, rng):
    m = rng.integers(0, 1 << 14, size=(8, 16)).astype(np.uint16)
    path = tmp_path / "b.srw"
    write_synthetic_raw(path, m, bpp=14, compression="srw3",
                        srw3_optflags=samsung3.OPT_MV)
    raw = decode_raw(path)
    assert np.array_equal(raw.mosaic, m)
    assert raw.white_level == 16383.0


def test_srw3_header_depth_mismatch_quarantines(rng):
    """A 12-bit header inside a 14-bit container is an inconsistency,
    not a guess."""
    m = rng.integers(0, 4096, size=(8, 16)).astype(np.uint16)
    blob = bytearray(write_synthetic_raw(None, m, compression="srw3"))
    payload = samsung3.encode_srw3(m)
    idx = bytes(blob).find(payload)
    assert idx > 0
    blob[idx + 10] = 14  # header now claims 14-bit vs BitsPerSample 12
    with pytest.raises(RawDecodeError):
        decode_raw(bytes(blob))


def test_srw3_truncated_quarantines(rng):
    m = rng.integers(0, 4096, size=(8, 32)).astype(np.uint16)
    blob = write_synthetic_raw(None, m, compression="srw3")
    with pytest.raises(RawDecodeError):
        decode_raw(blob[: len(blob) - 40])


def test_srw3_stream_inconsistencies_raise():
    # motion mode before row 2
    wr = _Bits()
    wr.put(0, 2)   # QP keep
    wr.put(0, 1)   # motion escape
    wr.put(2, 3)   # mode 2 on row 0 -> illegal
    header = bytes(9) + bytes([0]) + (12).to_bytes(2, "little") + \
        (2048).to_bytes(2, "little") + bytes(2)
    with pytest.raises(ValueError, match="before row 2"):
        samsung3.decode_srw3(header + wr.tobytes(), 16, 1)
    # length reuse before any lengths were coded
    wr = _Bits()
    wr.put(0, 2)
    wr.put(1, 1)   # motion 7
    wr.put(1, 1)   # "reuse previous lengths" on the first block
    with pytest.raises(ValueError, match="reuse"):
        samsung3.decode_srw3(header + wr.tobytes(), 16, 1)
    # bad header depth
    bad = bytearray(header + wr.tobytes())
    bad[10] = 11
    with pytest.raises(ValueError, match="depth"):
        samsung3.decode_srw3(bytes(bad), 16, 1)


@pytest.mark.skipif(rk is None or not hasattr(rk, "decode_srw3"),
                    reason="native ext without srw3")
def test_srw3_native_matches_python(rng):
    for optflags in range(8):
        for shape in [(4, 16), (9, 32), (24, 64)]:
            m = rng.integers(0, 4096, size=shape).astype(np.uint16)
            blob = samsung3.encode_srw3(m, optflags=optflags)
            c = np.frombuffer(rk.decode_srw3(blob, shape[1], shape[0]),
                              np.uint16).reshape(shape)
            assert np.array_equal(c, m)


@pytest.mark.skipif(rk is None or not hasattr(rk, "decode_srw3"),
                    reason="native ext without srw3")
def test_srw3_native_matches_python_on_mutations(rng):
    """Differential fuzz: on mutated streams both implementations must
    agree — same mosaic or both reject (ValueError)."""
    m = rng.integers(0, 4096, size=(8, 32)).astype(np.uint16)
    base = samsung3.encode_srw3(m, optflags=0)
    for _ in range(120):
        blob = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            blob[int(rng.integers(0, len(blob)))] = int(
                rng.integers(0, 256))
        blob = bytes(blob)
        try:
            py = samsung3.decode_srw3(blob, 32, 8)
        except ValueError:
            py = None
        try:
            nat = np.frombuffer(rk.decode_srw3(blob, 32, 8),
                                np.uint16).reshape(8, 32)
        except ValueError:
            nat = None
        if py is None or nat is None:
            assert py is None and nat is None
        else:
            assert np.array_equal(py, nat)


def test_srw3_width_not_multiple_of_16_rejected():
    with pytest.raises(ValueError):
        samsung3.encode_srw3(np.zeros((4, 24), np.uint16))
    with pytest.raises(ValueError):
        samsung3.decode_srw3(bytes(64), 24, 4)
