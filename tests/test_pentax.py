"""Pentax PEF sensor codec and container."""

import numpy as np
import pytest

from raweditor_tpu.native import get_rawkit
from raweditor_tpu.raw import pentax
from raweditor_tpu.raw.decode import decode_raw
from raweditor_tpu.raw.synth import write_synthetic_raw

rk = get_rawkit()


@pytest.mark.parametrize("shape", [(6, 9), (17, 23), (32, 40)])
def test_pentax_round_trip(shape, rng):
    m = rng.integers(0, 4096, size=shape).astype(np.uint16)
    stream, spec = pentax.encode_pentax(m)
    out = pentax.decode_pentax(stream, shape[1], shape[0], 12, spec)
    assert np.array_equal(out, m)


def test_pentax_14bit_round_trip(rng):
    m = rng.integers(0, 16384, size=(12, 16)).astype(np.uint16)
    stream, spec = pentax.encode_pentax(m, bps=14)
    out = pentax.decode_pentax(stream, 16, 12, 14, spec)
    assert np.array_equal(out, m)


def test_pentax_extremes(rng):
    for m in (np.zeros((8, 10), np.uint16),
              np.full((8, 10), 4095, np.uint16),
              np.kron(rng.integers(0, 2, size=(4, 5)) * 4095,
                      np.ones((2, 2))).astype(np.uint16)):
        stream, spec = pentax.encode_pentax(m)
        assert np.array_equal(
            pentax.decode_pentax(stream, 10, 8, 12, spec), m)


@pytest.mark.skipif(rk is None, reason="native ext not built")
def test_pentax_native_matches_python(rng):
    m = rng.integers(0, 4096, size=(24, 30)).astype(np.uint16)
    stream, spec = pentax.encode_pentax(m)
    c = np.frombuffer(rk.decode_pentax(stream, 30, 24, 12, spec, 0),
                      np.uint16).reshape(24, 30)
    assert np.array_equal(c, m)
    assert np.array_equal(
        pentax.decode_pentax(stream, 30, 24, 12, spec), c)


def test_pentax_spec_validation():
    with pytest.raises(ValueError):
        pentax.parse_huff_spec(b"\0")
    spec = bytearray(pentax.make_huff_spec())
    spec[14 + 2 * 13] = 0  # zero code length
    with pytest.raises(ValueError):
        pentax.parse_huff_spec(bytes(spec))


def test_decode_pef_container(tmp_path, rng):
    m = rng.integers(0, 4096, size=(40, 52)).astype(np.uint16)
    path = tmp_path / "a.pef"
    write_synthetic_raw(path, m, compression="pentax",
                        wb_in_makernote=True, wb_neutral=(0.5, 1.0, 0.7),
                        make="PENTAX", model="K-5")
    raw = decode_raw(path)
    assert np.array_equal(raw.mosaic, m)
    # WB from MakerNote 0x0201 (R,G,G2,B levels, green-normalized).
    np.testing.assert_allclose(raw.wb_multipliers,
                               [2.0, 1.0, 1 / 0.7, 1.0], atol=1e-3)


def test_decode_pef_without_spec_quarantines(tmp_path, rng):
    """A compressed PEF whose MakerNote lacks 0x0220 must quarantine
    (UnsupportedRawError is a RawDecodeError)."""
    from raweditor_tpu.raw.decode import RawDecodeError

    m = rng.integers(0, 4096, size=(10, 12)).astype(np.uint16)
    data = bytearray(write_synthetic_raw(None, m, compression="pentax"))
    i = data.find(b"AOC\x00")
    data[i:i + 4] = b"XXX\x00"  # makernote no longer recognized
    with pytest.raises(RawDecodeError):
        decode_raw(bytes(data))


def test_pef_develops_end_to_end(tmp_path, rng):
    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.engine import DevelopEngine

    m = rng.integers(0, 4096, size=(24, 28)).astype(np.uint16)
    path = tmp_path / "d.pef"
    write_synthetic_raw(path, m, compression="pentax")
    out = DevelopEngine.open(path).full(EditParams(exposure=0.3))
    assert out.shape == (24, 28, 3) and out.dtype == np.uint8


@pytest.mark.parametrize("ext", ["srw", "erf", "mos", "kdc"])
def test_uncompressed_tiff_variants_decode(ext, tmp_path, rng):
    """SRW/ERF/MOS/KDC containers are plain TIFF; their uncompressed
    variants ride the generic CFA path (compressed variants quarantine
    with UnsupportedRawError — docs/formats.md)."""
    m = rng.integers(0, 4096, size=(20, 24)).astype(np.uint16)
    path = tmp_path / f"a.{ext}"
    write_synthetic_raw(path, m, make=ext.upper())
    raw = decode_raw(path)
    assert np.array_equal(raw.mosaic, m)


def test_pentax_big_endian_spec_round_trip(rng):
    """encode_pentax honors big_endian specs end to end."""
    m = rng.integers(0, 4096, size=(9, 14)).astype(np.uint16)
    stream, spec = pentax.encode_pentax(m, big_endian=True)
    out = pentax.decode_pentax(stream, 14, 9, 12, spec,
                               big_endian_spec=True)
    assert np.array_equal(out, m)
    # A caller-supplied BE spec takes the same path.
    spec2 = pentax.make_huff_spec(dep=13, big_endian=True)
    stream2, _ = pentax.encode_pentax(m, spec=spec2, big_endian=True)
    out2 = pentax.decode_pentax(stream2, 14, 9, 12, spec2,
                                big_endian_spec=True)
    assert np.array_equal(out2, m)
