"""Fuji RAF container tests (synthetic round trips)."""

import numpy as np
import pytest

from raweditor_tpu.raw.decode import (
    RawDecodeError,
    decode_raw,
    extract_preview_jpeg,
)
from raweditor_tpu.raw.raf import RafFile, is_raf, write_raf
from raweditor_tpu.raw.synth import make_preview_jpeg, write_synthetic_raw


def test_bare_cfa_round_trip(rng):
    m = rng.integers(0, 16384, size=(18, 24), dtype=np.uint16)
    jpeg = make_preview_jpeg(32, 24)
    data = write_raf(m, jpeg=jpeg, model="X-T00")
    assert is_raf(data)
    raw = decode_raw(data)
    assert (raw.mosaic == m).all()
    assert raw.camera_make == "FUJIFILM"
    assert raw.camera_model == "X-T00"
    assert len(raw.cfa_pattern) == 36  # defaults to X-Trans
    # WB from the G R B G record, green-normalized.
    assert np.isclose(raw.wb_multipliers[1], 1.0)
    assert extract_preview_jpeg(data) == jpeg


def test_embedded_tiff_cfa(rng):
    m = rng.integers(0, 16384, size=(18, 24), dtype=np.uint16)
    tiff = write_synthetic_raw(None, m, bpp=14, compression="ljpeg")
    data = write_raf(m, embed_tiff=tiff)
    raw = decode_raw(data)
    assert (raw.mosaic == m).all()
    assert raw.camera_make == "FUJIFILM"


def test_raf_truncated():
    with pytest.raises(RawDecodeError):
        decode_raw(b"FUJIFILMCCD-RAW only-a-header")


def test_raf_section_out_of_bounds(rng):
    m = rng.integers(0, 256, size=(4, 4), dtype=np.uint16)
    data = bytearray(write_raf(m))
    data[0x54:0x58] = (2**31).to_bytes(4, "big")  # jpeg offset → wild
    with pytest.raises(RawDecodeError):
        decode_raw(bytes(data))


def test_raf_fuzz(rng):
    m = rng.integers(0, 16384, size=(10, 12), dtype=np.uint16)
    base = write_raf(m, jpeg=make_preview_jpeg(16, 12))
    for _ in range(60):
        blob = bytearray(base)
        for _ in range(int(rng.integers(1, 8))):
            blob[int(rng.integers(0, len(blob)))] = int(rng.integers(0, 256))
        try:
            decode_raw(bytes(blob))
        except RawDecodeError:
            pass


def test_raf_meta_overrun_quarantines(rng):
    """Metadata records must stay inside the declared meta section."""
    m = rng.integers(0, 256, size=(4, 4), dtype=np.uint16)
    base = write_raf(m)  # no jpeg → meta section starts at 0x6C
    # Inflate the record count far past what the section can hold.
    blob = bytearray(base)
    blob[0x6C:0x70] = (1 << 20).to_bytes(4, "big")
    with pytest.raises(RawDecodeError):
        decode_raw(bytes(blob))
    # Inflate the first record's size past the section end.
    blob = bytearray(base)
    blob[0x72:0x74] = (0x4000).to_bytes(2, "big")
    with pytest.raises(RawDecodeError):
        decode_raw(bytes(blob))
