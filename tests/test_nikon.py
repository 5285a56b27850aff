"""Nikon compressed NEF (34713) codec tests: Python↔C++ parity and
container round trips via the synthetic writer."""

import numpy as np
import pytest

from raweditor_tpu.native import get_rawkit
from raweditor_tpu.raw.nikon import (
    NIKON_TREES,
    decode_nikon,
    encode_nikon,
    parse_linearization,
)
from raweditor_tpu.raw.decode import decode_raw
from raweditor_tpu.raw.synth import write_synthetic_raw


def test_tree_tables_are_consistent():
    for bits, values in NIKON_TREES:
        # Leaves may be implicitly zero-padded (32-byte table layout).
        assert len(values) <= sum(bits) <= len(values) + 1
        # Kraft inequality: the canonical code must fit.
        kraft = sum(n * 2.0 ** -(i + 1) for i, n in enumerate(bits))
        assert kraft <= 1.0


@pytest.mark.parametrize("bps", [12, 14])
def test_python_round_trip(bps, rng):
    m = rng.integers(0, 1 << bps, size=(10, 16), dtype=np.uint16)
    strip, meta = encode_nikon(m, bps)
    info = parse_linearization(meta, bps)
    assert info.tree_index == (2 if bps == 12 else 5)
    assert info.split == 0
    out = decode_nikon(strip, 16, 10, bps, info)
    assert (out == m).all()


@pytest.mark.parametrize("bps", [12, 14])
def test_native_matches_python(bps, rng):
    rk = get_rawkit()
    if rk is None:
        pytest.skip("native ext not built")
    m = rng.integers(0, 1 << bps, size=(14, 22), dtype=np.uint16)
    strip, meta = encode_nikon(m, bps)
    info = parse_linearization(meta, bps)
    raw = rk.decode_nikon(
        strip, 22, 14, bps, info.tree_index, int(info.split),
        info.vpred.astype(np.int32).tobytes(), info.curve.tobytes(),
    )
    got = np.frombuffer(raw, np.uint16).reshape(14, 22)
    assert (got == decode_nikon(strip, 22, 14, bps, info)).all()
    assert (got == m).all()


def test_extreme_values_round_trip():
    m = np.array([[0, 4095, 0, 4095], [4095, 0, 4095, 0],
                  [0, 0, 4095, 4095]], dtype=np.uint16)
    strip, meta = encode_nikon(m, 12)
    out = decode_nikon(strip, 4, 3, 12, parse_linearization(meta, 12))
    assert (out == m).all()


def test_lossy_curve_interpolation():
    """ver0=0x44 metadata: sampled curve + interpolation + split row."""
    import struct

    csize = 17
    bps = 12
    max_value = 1 << bps
    step = max_value // (csize - 1)
    samples = (np.arange(csize, dtype=np.int64) ** 2 * 4).astype("<u2")
    meta = bytearray()
    meta += bytes([0x44, 0x20])
    meta += struct.pack("<4H", 100, 200, 300, 400)  # vpred
    meta += struct.pack("<H", csize)
    meta += samples.tobytes()
    meta += b"\0" * (562 - len(meta))
    meta += struct.pack("<H", 7)  # split row
    info = parse_linearization(bytes(meta), bps)
    assert info.split == 7
    assert info.tree_index == 0  # 12-bit lossy
    assert (info.vpred == [[100, 200], [300, 400]]).all()
    # Exact at the sample points, monotone in between.
    assert info.curve[0] == samples[0]
    assert info.curve[step] == samples[1]
    mid = info.curve[step // 2]
    assert samples[0] <= mid <= samples[1]


def test_full_container_round_trip(tmp_path, rng):
    for bps in (12, 14):
        m = rng.integers(0, 1 << bps, size=(20, 30), dtype=np.uint16)
        path = tmp_path / f"d3300_{bps}.nef"
        write_synthetic_raw(path, m, bpp=bps, compression="nikon")
        raw = decode_raw(path)
        assert (raw.mosaic == m).all()


def test_container_python_fallback(tmp_path, rng, monkeypatch):
    monkeypatch.setenv("RAWEDITOR_TPU_NO_NATIVE", "1")
    import raweditor_tpu.native as nat

    monkeypatch.setattr(nat, "_tried", False)
    monkeypatch.setattr(nat, "_cached", None)
    m = rng.integers(0, 4096, size=(8, 12), dtype=np.uint16)
    write_synthetic_raw(tmp_path / "a.nef", m, compression="nikon")
    raw = decode_raw(tmp_path / "a.nef")
    assert (raw.mosaic == m).all()
    monkeypatch.setattr(nat, "_tried", False)
    monkeypatch.setattr(nat, "_cached", None)


def test_lossy_stream_end_to_end():
    """Exercise the lossy path end to end: sampled-curve interpolation,
    the split-row tree switch, and shl-shortcut leaves. A hand-built
    stream of all-zero residuals decodes to curve[vpred] everywhere."""
    import struct

    from raweditor_tpu.raw.nikon import (
        NIKON_TREES,
        _canonical,
        decode_nikon,
        parse_linearization,
    )

    bps = 12
    csize = 17
    max_value = 1 << bps
    step = max_value // (csize - 1)
    # Monotone sampled curve: curve[i] = 2*i at the sample points.
    samples = (np.arange(csize, dtype=np.int64) * step * 2 // 2).astype(
        "<u2"
    )
    vpred_init = 600
    meta = bytearray()
    meta += bytes([0x44, 0x20])
    meta += struct.pack("<4H", *([vpred_init] * 4))
    meta += struct.pack("<H", csize)
    meta += samples.tobytes()
    meta += b"\0" * (562 - len(meta))
    split = 3
    meta += struct.pack("<H", split)

    info = parse_linearization(bytes(meta), bps)
    assert info.tree_index == 0 and info.split == split

    # Find the zero-length leaf (value 0 → diff 0, no extra bits) in
    # both trees and emit h*w codes, switching trees at the split row.
    def zero_code(tree_index):
        table = _canonical(NIKON_TREES[tree_index])
        for (length, code), leaf in table.items():
            if leaf == 0:
                return code, length
        raise AssertionError("no zero leaf")

    h, w = 6, 8
    bits = []
    for row in range(h):
        code, length = zero_code(0 if row < split else 1)
        for _ in range(w):
            bits.extend(int(b) for b in format(code, f"0{length}b"))
    stream = np.packbits(np.array(bits, np.uint8)).tobytes()

    out = decode_nikon(stream, w, h, bps, info)
    expected = info.curve[vpred_init]
    assert (out == expected).all()
    # The interpolated curve is monotone and hits the sample points.
    assert info.curve[0] == samples[0]
    assert (np.diff(info.curve.astype(np.int64)) >= 0).all()


def test_lossy_stream_native_parity():
    """Same hand-built lossy stream through the C++ decoder."""
    rk = get_rawkit()
    if rk is None:
        pytest.skip("native ext not built")
    import struct

    from raweditor_tpu.raw.nikon import (
        NIKON_TREES,
        _canonical,
        decode_nikon,
        parse_linearization,
    )

    bps = 12
    csize = 17
    samples = (np.arange(csize, dtype=np.int64)
               * ((1 << bps) // (csize - 1)) * 2 // 2).astype("<u2")
    meta = bytearray()
    meta += bytes([0x44, 0x20])
    meta += struct.pack("<4H", 600, 600, 600, 600)
    meta += struct.pack("<H", csize)
    meta += samples.tobytes()
    meta += b"\0" * (562 - len(meta))
    meta += struct.pack("<H", 3)
    info = parse_linearization(bytes(meta), bps)

    def zero_code(tree_index):
        table = _canonical(NIKON_TREES[tree_index])
        for (length, code), leaf in table.items():
            if leaf == 0:
                return code, length
        raise AssertionError

    h, w = 6, 8
    bits = []
    for row in range(h):
        code, length = zero_code(0 if row < info.split else 1)
        for _ in range(w):
            bits.extend(int(b) for b in format(code, f"0{length}b"))
    stream = np.packbits(np.array(bits, np.uint8)).tobytes()

    want = decode_nikon(stream, w, h, bps, info)
    raw = rk.decode_nikon(stream, w, h, bps, info.tree_index,
                          int(info.split),
                          info.vpred.astype(np.int32).tobytes(),
                          info.curve.tobytes())
    got = np.frombuffer(raw, np.uint16).reshape(h, w)
    assert (got == want).all()
