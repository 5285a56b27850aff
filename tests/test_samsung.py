"""Samsung SRW v1 codec (compression 32770) and container."""

import numpy as np
import pytest

from raweditor_tpu.native import get_rawkit
from raweditor_tpu.raw import samsung
from raweditor_tpu.raw.decode import RawDecodeError, decode_raw
from raweditor_tpu.raw.synth import write_synthetic_raw

rk = get_rawkit()


@pytest.mark.parametrize("shape", [(4, 16), (9, 32), (16, 48), (3, 16)])
def test_srw1_round_trip(shape, rng):
    m = rng.integers(0, 4096, size=shape).astype(np.uint16)
    data, offs = samsung.encode_srw1(m)
    assert np.array_equal(
        samsung.decode_srw1(data, offs, shape[1], shape[0]), m)


def test_srw1_extremes(rng):
    cases = [
        np.zeros((6, 16), np.uint16),
        np.full((6, 16), 4095, np.uint16),
        np.kron(rng.integers(0, 2, (3, 4)) * 4095,
                np.ones((2, 4))).astype(np.uint16),
        # smooth ramp exercises small adaptive lengths
        (np.add.outer(np.arange(8) * 3, np.arange(32)) % 4096).astype(
            np.uint16),
    ]
    for m in cases:
        data, offs = samsung.encode_srw1(m)
        h, w = m.shape
        assert np.array_equal(samsung.decode_srw1(data, offs, w, h), m)


def test_srw1_cfa_swap_is_involution(rng):
    m = rng.integers(0, 4096, size=(6, 32)).astype(np.uint16)
    assert np.array_equal(samsung._cfa_swap(samsung._cfa_swap(m)), m)
    # and it actually moves the off-diagonal sites
    assert not np.array_equal(samsung._cfa_swap(m), m)


def test_srw1_group_layout():
    """The four length groups are (pixel parity) x (block half):
    published index ((c & 1) << 1) | (c >> 3)."""
    assert samsung._GROUP[:8] == [0, 2, 0, 2, 0, 2, 0, 2]
    assert samsung._GROUP[8:] == [1, 3, 1, 3, 1, 3, 1, 3]
    # evens first, then odds (the published c == 14 -> c = -1 loop)
    assert samsung._ORDER == list(range(0, 16, 2)) + list(range(1, 16, 2))


def test_srw1_container_round_trip(tmp_path, rng):
    m = rng.integers(0, 4096, size=(12, 32)).astype(np.uint16)
    path = tmp_path / "a.srw"
    write_synthetic_raw(path, m, compression="srw1", make="SAMSUNG",
                        model="NX Synth", srw_wb=True,
                        srw_black=(64, 66, 66, 70))
    raw = decode_raw(path)
    assert np.array_equal(raw.mosaic, m)
    assert raw.camera_make == "SAMSUNG"
    np.testing.assert_allclose(raw.wb_multipliers, [2.0, 1.0, 10 / 7, 1.0],
                               rtol=1e-3)
    assert raw.black_level == pytest.approx(66.5)
    assert raw.black_per_site is not None


def test_srw1_truncated_quarantines(rng):
    m = rng.integers(0, 4096, size=(8, 32)).astype(np.uint16)
    blob = write_synthetic_raw(None, m, compression="srw1")
    with pytest.raises(RawDecodeError):
        decode_raw(blob[: len(blob) // 2])


@pytest.mark.skipif(rk is None or not hasattr(rk, "decode_srw1"),
                    reason="native ext without srw1")
def test_srw1_native_matches_python(rng):
    for shape in [(4, 16), (9, 32), (24, 64)]:
        m = rng.integers(0, 4096, size=shape).astype(np.uint16)
        data, offs = samsung.encode_srw1(m)
        c = np.frombuffer(
            rk.decode_srw1(data, np.asarray(offs, "<u4").tobytes(),
                           shape[1], shape[0]), np.uint16).reshape(shape)
        assert np.array_equal(c, m)


def test_srw1_width_not_multiple_of_16_rejected():
    with pytest.raises(ValueError):
        samsung.encode_srw1(np.zeros((4, 24), np.uint16))
