"""Sony ARW2 (32767) codec tests."""

import numpy as np
import pytest

from raweditor_tpu.raw.arw2 import decode_arw2, encode_arw2
from raweditor_tpu.raw.decode import decode_raw
from raweditor_tpu.raw.synth import write_synthetic_raw


def _smooth_mosaic(rng, h, w):
    """Per-32-column-span data whose 11-bit range is < 128 → every
    block encodes losslessly."""
    m11 = np.empty((h, w), np.int32)
    for p in range(w // 32):
        base = rng.integers(0, 1900)
        m11[:, p * 32 : (p + 1) * 32] = base + rng.integers(
            0, 127, size=(h, 32)
        )
    return (m11 << 1).astype(np.uint16)


def test_lossless_blocks_round_trip(rng):
    m12 = _smooth_mosaic(rng, 8, 96)
    assert (decode_arw2(encode_arw2(m12), 96, 8) == m12).all()


def test_lossy_idempotent(rng):
    wide = rng.integers(0, 0x7FF, size=(4, 64), dtype=np.uint16) << 1
    d1 = decode_arw2(encode_arw2(wide), 64, 4)
    d2 = decode_arw2(encode_arw2(d1), 64, 4)
    assert (d1 == d2).all()


def test_extremes_and_constant_blocks():
    # Constant block (degenerate argmin==argmax handling).
    flat = np.full((2, 32), 1000 << 1, np.uint16)
    assert (decode_arw2(encode_arw2(flat), 32, 2) == flat).all()
    # Full-range block quantizes but stays in range.
    step = (np.arange(64, dtype=np.uint16) * 32 % 0x7FF) << 1
    m = np.tile(step, (2, 1))
    d = decode_arw2(encode_arw2(m), 64, 2)
    assert d.max() <= 0x7FF << 1
    assert np.abs(d.astype(int) - m.astype(int)).max() <= (0x7F << 4)


def test_rejects_bad_width(rng):
    with pytest.raises(ValueError):
        decode_arw2(b"\x00" * 1000, 20, 4)
    with pytest.raises(ValueError):
        encode_arw2(np.zeros((4, 20), np.uint16))


def test_rejects_short_data():
    with pytest.raises(ValueError):
        decode_arw2(b"\x00" * 10, 32, 4)


def test_container_round_trip(tmp_path, rng):
    m12 = _smooth_mosaic(rng, 6, 64)
    path = tmp_path / "shot.arw"
    write_synthetic_raw(path, m12, bpp=12, compression="arw2",
                        make="SONY")
    raw = decode_raw(path)
    assert (raw.mosaic == m12).all()
    assert raw.camera_make == "SONY"
