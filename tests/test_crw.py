"""Canon CRW: CIFF container + the original Canon codec.

Same strategy as the other codec suites (Python behavioral reference,
synth containers round-tripped through decode_raw, corrupt input
quarantined) plus the structural table self-check and a hand-assembled
decoder-only golden stream.
"""

import numpy as np
import pytest

from raweditor_tpu.native import get_rawkit
from raweditor_tpu.raw import ciff
from raweditor_tpu.raw.decode import (RawDecodeError, decode_raw,
                                      extract_preview_jpeg)

rk = get_rawkit()


def test_tables_structurally_valid():
    """Counts sum to value counts; second trees are a permutation of
    the full {EOB, ZRL} + run 0..15 x size 1..10 set; first trees of
    lengths 0..11 + filler. Pins the published table structure."""
    ciff.validate_tables()


@pytest.mark.parametrize("table", [0, 1, 2])
@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (7, 64), (24, 40)])
def test_stream_round_trip(table, shape, rng):
    m = rng.integers(0, 1024, size=shape).astype(np.uint16)
    s = ciff.encode_canon_stream(m, table)
    assert np.array_equal(
        ciff.decode_canon_stream(s, shape[1], shape[0], table), m)


def test_stream_extremes(rng):
    cases = [
        np.zeros((8, 16), np.uint16),
        np.full((8, 16), 1023, np.uint16),
        np.kron(rng.integers(0, 2, (4, 4)) * 1023,
                np.ones((2, 4))).astype(np.uint16),
        # long zero runs exercise ZRL, sparse spikes the run/size codes
        np.where(np.arange(24 * 64).reshape(24, 64) % 37 == 0,
                 900, 0).astype(np.uint16),
    ]
    for m in cases:
        h, w = m.shape
        assert np.array_equal(
            ciff.decode_canon_stream(ciff.encode_canon_stream(m, 0),
                                     w, h, 0), m)


def test_golden_constant_block():
    """Hand-assembled bitstream (not produced by this repo's encoder):
    an all-512 8x8 band is one 64-diff block = first-tree leaf 0x00
    (third length-5 value: code 11110) + second-tree EOB (second
    length-9 value: code 111111011) = 0xF7 0xEC with zero padding.
    Exercises the canonical code construction against an independently
    derived golden."""
    out = ciff.decode_canon_stream(b"\xf7\xec", 8, 8, 0)
    assert (out == 512).all()


def test_lowbits_plane_layout():
    """Four samples per byte, LSB-first: [0,1,2,3] -> 0b11100100."""
    assert ciff.pack_lowbits(np.array([0, 1, 2, 3])) == b"\xe4"
    assert ciff.unpack_lowbits(b"\xe4", 4).tolist() == [0, 1, 2, 3]


@pytest.mark.parametrize("lowbits,limit", [(True, 4096), (False, 1024)])
def test_crw_file_round_trip(tmp_path, rng, lowbits, limit):
    m = rng.integers(0, limit, size=(16, 32)).astype(np.uint16)
    path = tmp_path / "a.crw"
    ciff.write_crw(path, m, lowbits=lowbits, wb=(2.0, 1.0, 1.5, 1.0),
                   make="Canon", model="EOS Synth", table=1)
    raw = decode_raw(path)
    assert np.array_equal(raw.mosaic, m)
    assert raw.white_level == (4095.0 if lowbits else 1023.0)
    assert raw.cfa_pattern == "RGGB"
    assert raw.camera_model == "EOS Synth"
    np.testing.assert_allclose(raw.wb_multipliers, [2.0, 1.0, 1.5, 1.0])


@pytest.mark.parametrize("table", [0, 1, 2])
def test_crw_all_decoder_tables(table, rng):
    m = rng.integers(0, 4096, size=(64, 96)).astype(np.uint16)
    blob = ciff.write_crw(None, m, table=table)
    assert np.array_equal(decode_raw(blob).mosaic, m)


def test_crw_preview_fast_path(tmp_path, rng):
    from PIL import Image as PILImage
    import io

    buf = io.BytesIO()
    PILImage.new("RGB", (32, 24), (200, 30, 40)).save(buf, format="JPEG")
    jpeg = buf.getvalue()
    m = rng.integers(0, 4096, size=(16, 16)).astype(np.uint16)
    blob = ciff.write_crw(None, m, preview_jpeg=jpeg)
    assert extract_preview_jpeg(blob) == jpeg


def test_crw_truncated_quarantines(rng):
    m = rng.integers(0, 4096, size=(32, 64)).astype(np.uint16)
    blob = ciff.write_crw(None, m)
    for cut in (len(blob) // 3, len(blob) - 40):
        with pytest.raises(RawDecodeError):
            decode_raw(blob[:cut])


def test_crw_corrupt_directory_quarantines(rng):
    m = rng.integers(0, 4096, size=(8, 16)).astype(np.uint16)
    blob = bytearray(ciff.write_crw(None, m))
    blob[-4:] = (0xFFFFFFF0).to_bytes(4, "little")  # directory offset
    with pytest.raises(RawDecodeError):
        decode_raw(bytes(blob))


def test_crw_band_alignment_rejected():
    with pytest.raises(ValueError):
        ciff.encode_canon_stream(np.zeros((8, 12), np.uint16), 0)


@pytest.mark.skipif(rk is None or not hasattr(rk, "decode_canon_crw"),
                    reason="native ext without canon crw")
def test_crw_native_matches_python(rng):
    for table in (0, 1, 2):
        m = rng.integers(0, 1024, size=(24, 48)).astype(np.uint16)
        s = ciff.encode_canon_stream(m, table)
        raw, consumed = rk.decode_canon_crw(s, 48, 24, table)
        c = np.frombuffer(raw, np.uint16).reshape(24, 48)
        assert np.array_equal(c, m)
        assert abs(consumed - len(s)) <= 16


def _all_leaves_mosaic():
    """Rows engineered so the encoder emits every second-tree leaf
    (each run 0..15 x size 1..10 combo, ZRL, EOB) and every first-tree
    length 0..11. Width 128: two 64-blocks per row, so the second
    block's first diff can stack with the DC carry to reach the
    length-11 first-tree leaf."""
    rows = []
    w = 128

    def spike(mag, sign):
        return 512 + (mag if sign else -mag)

    # every (run, size): run zeros at i=1.., then a category-s diff
    for run in range(16):
        for size in range(1, 11):
            row = np.full(w, 512, np.uint16)
            d = 1 << (size - 1)
            i = 1 + run
            v = spike(d, size < 10)
            row[i] = v
            row[i + 2 :: 2] = v  # keep that parity chain constant
            rows.append(row)
    # long zero runs for ZRL (+ run 16..31 via ZRL + run code)
    for run in (16, 20, 35, 47):
        row = np.full(w, 512, np.uint16)
        if 1 + run < 64:
            row[1 + run] = 700
            row[1 + run + 2 :: 2] = 700
        rows.append(row)
    # first-tree lengths 1..9 via the row's opening diff
    for size in range(1, 10):
        row = np.full(w, 512, np.uint16)
        d = 1 << (size - 1)
        row[0] = spike(d, size < 10)
        row[2::2] = row[0]
        rows.append(row)
    # length 10 (opening diff -512) and length 11 (carry-stacked)
    row = np.full(w, 512, np.uint16)
    row[0:64:2] = 0       # block 1: opening diff -512, base[0] ends 0
    row[64::2] = 1023     # block 2: diff +1023 minus carry -512 = 1535
    rows.append(row)
    m = np.stack(rows)
    # pad rows to a multiple of 8 for full bands
    pad = (-len(rows)) % 8
    if pad:
        m = np.vstack([m, np.full((pad, w), 512, np.uint16)])
    return m


def test_all_leaves_round_trip_and_native(rng):
    m = _all_leaves_mosaic()
    h, w = m.shape
    for table in (0, 1, 2):
        s = ciff.encode_canon_stream(m, table)
        assert np.array_equal(ciff.decode_canon_stream(s, w, h, table), m)
        if rk is not None and hasattr(rk, "decode_canon_crw"):
            raw, _ = rk.decode_canon_crw(s, w, h, table)
            assert np.array_equal(
                np.frombuffer(raw, np.uint16).reshape(h, w), m)


def test_all_leaves_mosaic_covers_every_code():
    """Replicate the encoder's leaf-selection rule over the crafted
    mosaic and assert full table coverage (independent tally, not the
    encoder's own)."""
    m = _all_leaves_mosaic()
    h, w = m.shape
    first_seen = set()
    second_seen = set()
    carry = 0
    pnum = 0
    base = [0, 0]
    vals = m.astype(np.int64).reshape(-1)
    for boff in range(0, h * w, 64):
        diffs = []
        for i in range(64):
            if pnum % w == 0:
                base[0] = base[1] = 512
            pnum += 1
            v = int(vals[boff + i])
            diffs.append(v - base[i & 1])
            base[i & 1] = v
        t0 = diffs[0] - carry
        carry = diffs[0]
        first_seen.add(abs(t0).bit_length())
        run = 0
        for d in diffs[1:]:
            if d == 0:
                run += 1
                continue
            while run >= 16:
                second_seen.add(0xF0)
                run -= 16
            second_seen.add((run << 4) | abs(d).bit_length())
            run = 0
        if run:
            second_seen.add(0x00)
    assert first_seen == set(range(12))
    expected = {0x00, 0xF0} | {
        (r << 4) | s for r in range(16) for s in range(1, 11)
    }
    assert second_seen == expected
