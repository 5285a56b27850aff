"""Olympus ORF + Panasonic RW2 sensor codecs and containers.

Same strategy as the NEF/ARW2 suites: Python behavioral reference,
C++ fast path asserted byte/array-identical, synth containers
round-tripped through decode_raw, corrupt input quarantined.
"""

import numpy as np
import pytest

from raweditor_tpu.native import get_rawkit
from raweditor_tpu.raw import olympus, panasonic
from raweditor_tpu.raw.decode import (RawDecodeError, decode_raw,
                                      extract_preview_jpeg)
from raweditor_tpu.raw.synth import write_synthetic_orf, write_synthetic_rw2

rk = get_rawkit()


# --- Olympus codec ---------------------------------------------------------


@pytest.mark.parametrize("shape", [(8, 10), (17, 33), (40, 64)])
def test_olympus_round_trip(shape, rng):
    m = rng.integers(0, 4096, size=shape).astype(np.uint16)
    data = olympus.encode_olympus(m)
    out = olympus.decode_olympus(data, shape[1], shape[0])
    assert np.array_equal(out, m)


def test_olympus_extremes_and_smooth(rng):
    # Full-range steps exercise the escape path; smooth ramps exercise
    # the small-nbits adaptive path; constants the carry decay.
    cases = [
        np.full((12, 14), 0, np.uint16),
        np.full((12, 14), 4095, np.uint16),
        (np.add.outer(np.arange(20) * 2, np.arange(26)) % 4096).astype(
            np.uint16
        ),
        np.kron(
            rng.integers(0, 2, size=(6, 7)) * 4095, np.ones((2, 2))
        ).astype(np.uint16),
    ]
    for m in cases:
        h, w = m.shape
        assert np.array_equal(
            olympus.decode_olympus(olympus.encode_olympus(m), w, h), m
        )


@pytest.mark.skipif(rk is None, reason="native ext not built")
def test_olympus_native_matches_python(rng):
    m = rng.integers(0, 4096, size=(24, 30)).astype(np.uint16)
    py_enc = olympus.encode_olympus(m)
    c_enc = rk.encode_olympus(np.ascontiguousarray(m), 30, 24)
    assert py_enc == c_enc
    c_dec = np.frombuffer(rk.decode_olympus(c_enc, 30, 24), np.uint16)
    assert np.array_equal(c_dec.reshape(24, 30), m)


# --- Panasonic codec -------------------------------------------------------


@pytest.mark.parametrize("shape", [(6, 28), (10, 42), (30, 56)])
def test_rw2_round_trip(shape, rng):
    m = panasonic.rw2_representable(rng.integers(0, 4096, size=shape))
    data = panasonic.encode_rw2(m)
    assert len(data) % panasonic.BLOCK == 0
    out = panasonic.decode_rw2(data, shape[1], shape[0])
    assert np.array_equal(out, m)


def test_rw2_multi_block(rng):
    """> 14336 pixels spans multiple 0x4000-byte blocks."""
    m = panasonic.rw2_representable(
        rng.integers(0, 4096, size=(128, 140)))
    assert m.size > panasonic.PIXELS_PER_BLOCK
    out = panasonic.decode_rw2(panasonic.encode_rw2(m), 140, 128)
    assert np.array_equal(out, m)


def test_rw2_representable_properties(rng):
    m = rng.integers(0, 4096, size=(12, 28))
    q = panasonic.rw2_representable(m)
    assert (np.abs(q.astype(int) - np.clip(m, 16, 4095)) <= 15).all()
    # Idempotent: a representable mosaic quantizes to itself.
    assert np.array_equal(panasonic.rw2_representable(q), q)


def test_rw2_rejects_unrepresentable():
    m = np.full((2, 28), 100, np.uint16)
    m[0, 4] = 101  # low-nibble mismatch with the parity leader
    with pytest.raises(ValueError):
        panasonic.encode_rw2(m)
    with pytest.raises(ValueError):
        panasonic.encode_rw2(np.full((2, 28), 5, np.uint16))  # < 16
    with pytest.raises(ValueError):
        panasonic.encode_rw2(np.full((2, 27), 100, np.uint16))  # w % 14


@pytest.mark.skipif(rk is None, reason="native ext not built")
def test_rw2_native_matches_python(rng):
    m = panasonic.rw2_representable(rng.integers(0, 4096, size=(20, 28)))
    py_enc = panasonic.encode_rw2(m)
    c_enc = rk.encode_rw2(np.ascontiguousarray(m), 28, 20)
    assert py_enc == c_enc
    c_dec = np.frombuffer(rk.decode_rw2(c_enc, 28, 20), np.uint16)
    assert np.array_equal(c_dec.reshape(20, 28), m)


# --- Containers ------------------------------------------------------------


def test_decode_orf_compressed(tmp_path, rng):
    m = rng.integers(0, 4096, size=(40, 60)).astype(np.uint16)
    path = tmp_path / "a.orf"
    write_synthetic_orf(path, m, wb_rb=(2.0, 1.5))
    raw = decode_raw(path)
    assert np.array_equal(raw.mosaic, m)
    # WB comes from the Olympus MakerNote (ImageProcessing 0x0100).
    np.testing.assert_allclose(
        raw.wb_multipliers, [2.0, 1.0, 1.5, 1.0], atol=1 / 256
    )
    assert raw.camera_make.startswith("OLYMPUS")
    assert raw.white_level == 4095.0


def test_decode_orf_unpacked16(tmp_path, rng):
    m = rng.integers(0, 4096, size=(12, 16)).astype(np.uint16)
    path = tmp_path / "b.orf"
    write_synthetic_orf(path, m, compression="none16")
    assert np.array_equal(decode_raw(path).mosaic, m)


def test_decode_rw2_container(tmp_path, rng):
    m = panasonic.rw2_representable(rng.integers(0, 4096, size=(40, 56)))
    path = tmp_path / "c.rw2"
    write_synthetic_rw2(path, m, wb_rgb=(520, 256, 390),
                        black_rgb=(16, 16, 16), cfa="GBRG")
    raw = decode_raw(path)
    assert np.array_equal(raw.mosaic, m)
    np.testing.assert_allclose(
        raw.wb_multipliers, [520 / 256, 1.0, 390 / 256, 1.0], rtol=1e-6
    )
    assert raw.cfa_pattern == "GBRG"
    assert raw.black_level == 16.0
    assert raw.white_level == 4095.0
    assert raw.camera_make == "Panasonic"


def test_orf_rw2_previews(tmp_path, rng):
    m = rng.integers(0, 4096, size=(20, 28)).astype(np.uint16)
    orf = tmp_path / "p.orf"
    write_synthetic_orf(orf, m)
    jp = extract_preview_jpeg(orf)
    assert jp is not None and jp[:2] == b"\xff\xd8"
    rw2 = tmp_path / "p.rw2"
    write_synthetic_rw2(rw2, panasonic.rw2_representable(m))
    jp = extract_preview_jpeg(rw2)
    assert jp is not None and jp[:2] == b"\xff\xd8"


def test_orf_rw2_develop_end_to_end(tmp_path, rng):
    """The decoded mosaics feed the standard develop pipeline."""
    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.engine import DevelopEngine

    m = rng.integers(0, 4096, size=(24, 28)).astype(np.uint16)
    orf = tmp_path / "d.orf"
    write_synthetic_orf(orf, m)
    eng = DevelopEngine.open(orf)
    out = eng.full(EditParams(exposure=0.5))
    assert out.shape == (24, 28, 3) and out.dtype == np.uint8

    rw2 = tmp_path / "d.rw2"
    write_synthetic_rw2(rw2, panasonic.rw2_representable(m))
    eng = DevelopEngine.open(rw2)
    out = eng.full(EditParams(exposure=0.5))
    assert out.shape == (24, 28, 3) and out.dtype == np.uint8


def test_rw2_truncated_payload_quarantines(tmp_path, rng):
    m = panasonic.rw2_representable(rng.integers(0, 4096, size=(20, 28)))
    data = write_synthetic_rw2(None, m)
    # Drop the tail: the decoder must raise RawDecodeError, not crash
    # (truncated blocks read as zero bits -> zero-mode pixels decode,
    # but a value > 4098 or structural failure must quarantine).
    for cut in (len(data) - 100, len(data) - panasonic.BLOCK):
        try:
            raw = decode_raw(data[:cut])
            assert raw.mosaic.shape == (20, 28)
        except RawDecodeError:
            pass


def test_orf_truncated_payload_quarantines(tmp_path, rng):
    m = rng.integers(0, 4096, size=(20, 28)).astype(np.uint16)
    data = write_synthetic_orf(None, m)
    try:
        raw = decode_raw(data[: len(data) - 50])
        assert raw.mosaic.shape == (20, 28)
    except RawDecodeError:
        pass
