"""Nikon encrypted ColorBalance (0x0097) key schedule + WB extraction.

The real xlat substitution tables are firmware constants that are NOT
shipped (guessing them would silently corrupt WB — see
raw/nikon_crypt.py); the machinery is validated with synthetic
tables: encrypt/decrypt round-trip, keyed sensitivity, end-to-end
decode through a synth NEF, and the neutral fallback when no tables
are available.
"""

import numpy as np
import pytest

from raweditor_tpu.raw import nikon_crypt
from raweditor_tpu.raw.decode import decode_raw
from raweditor_tpu.raw.synth import write_synthetic_raw


@pytest.fixture
def xlat(rng):
    t = (rng.integers(0, 256, size=256, dtype=np.uint8).tobytes(),
         rng.integers(0, 256, size=256, dtype=np.uint8).tobytes())
    nikon_crypt.set_xlat_tables(*t)
    yield t
    nikon_crypt.set_xlat_tables(None)


def test_crypt_is_involution(xlat, rng):
    data = rng.integers(0, 256, size=324, dtype=np.uint8).tobytes()
    enc = nikon_crypt.crypt(data, 12345, 6789, *xlat)
    assert enc != data
    assert nikon_crypt.crypt(enc, 12345, 6789, *xlat) == data


def test_keystream_sensitive_to_keys(xlat):
    a = nikon_crypt.keystream(64, 1001, 5, *xlat)
    assert nikon_crypt.keystream(64, 1002, 5, *xlat) != a
    assert nikon_crypt.keystream(64, 1001, 6, *xlat) != a
    # Only the XOR-fold of the count bytes matters (published rule):
    # 0x030305 has different bytes than 5 but folds to 5 ^ 3 ^ 3 = 5.
    fold_equal = 5 | (3 << 8) | (3 << 16)
    assert fold_equal != 5
    assert nikon_crypt.keystream(64, 1001, fold_equal, *xlat) == a


def test_serial_key_digit_fold():
    assert nikon_crypt.serial_key("123") == 123
    # Non-digits contribute ord(c) % 10.
    assert nikon_crypt.serial_key("1a") == 10 + (ord("a") % 10)
    assert nikon_crypt.serial_key("") == 0


@pytest.mark.parametrize("ver", [200, 204, 205, 210, 216])
def test_color_balance_round_trip(ver, xlat):
    wb = (2.2, 1.0, 1.45, 1.0)
    serial = nikon_crypt.serial_key("6012345")
    block = nikon_crypt.encrypt_color_balance(
        ver, wb, serial, 31337, *xlat)
    got = nikon_crypt.wb_from_color_balance(
        block, serial, 31337, big_endian=False)
    assert got is not None
    np.testing.assert_allclose(got, [2.2, 1.0, 1.45, 1.0], atol=1 / 128)


def test_color_balance_requires_tables(rng):
    nikon_crypt.set_xlat_tables(None)
    t0 = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
    t1 = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
    block = nikon_crypt.encrypt_color_balance(
        204, (2.0, 1.0, 1.5, 1.0), 99, 7, t0, t1)
    assert nikon_crypt.wb_from_color_balance(block, 99, 7, False) is None


def test_color_balance_rejects_bad_blocks(xlat):
    assert nikon_crypt.wb_from_color_balance(b"02", 1, 2, False) is None
    assert nikon_crypt.wb_from_color_balance(b"0100" + b"\0" * 700,
                                             1, 2, False) is None
    assert nikon_crypt.wb_from_color_balance(b"0204" + b"\0" * 10,
                                             1, 2, False) is None


def test_decode_nef_with_encrypted_wb(tmp_path, xlat, rng):
    """End to end: a compressed synth NEF whose only WB source is the
    encrypted 0x0097 block decodes with the right multipliers."""
    m = rng.integers(0, 4096, size=(16, 20), dtype=np.uint16)
    path = tmp_path / "enc.nef"
    write_synthetic_raw(
        path, m, compression="nikon",
        nikon_encrypted_wb=dict(ver=204, wb_rgbg=(2.1, 1.0, 1.35, 1.0),
                                serial="6012345", count=4242,
                                xlat0=xlat[0], xlat1=xlat[1]),
    )
    raw = decode_raw(path)
    assert np.array_equal(raw.mosaic, m)
    np.testing.assert_allclose(
        raw.wb_multipliers, [2.1, 1.0, 1.35, 1.0], atol=1 / 128)


def test_decode_nef_encrypted_wb_neutral_without_tables(tmp_path, rng):
    """Same file, no tables -> neutral WB (the reference's fallback
    contract, raw/loader.rs:93-97) and no decode failure."""
    t0 = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
    t1 = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
    m = rng.integers(0, 4096, size=(16, 20), dtype=np.uint16)
    path = tmp_path / "enc2.nef"
    write_synthetic_raw(
        path, m, compression="nikon",
        nikon_encrypted_wb=dict(ver=204, wb_rgbg=(2.1, 1.0, 1.35, 1.0),
                                serial="6012345", count=4242,
                                xlat0=t0, xlat1=t1),
    )
    nikon_crypt.set_xlat_tables(None)
    raw = decode_raw(path)
    np.testing.assert_array_equal(raw.wb_multipliers, [1, 1, 1, 1])


def test_decode_neutral_fallback_sets_wb_is_default(tmp_path, rng):
    """The API surface distinguishes placeholder WB from parsed WB:
    the no-tables fallback sets wb_is_default, a real parse clears
    it (ADVICE r2: callers could not tell neutral-default apart)."""
    t0 = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
    t1 = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
    m = rng.integers(0, 4096, size=(16, 20), dtype=np.uint16)
    path = tmp_path / "enc3.nef"
    write_synthetic_raw(
        path, m, compression="nikon",
        nikon_encrypted_wb=dict(ver=204, wb_rgbg=(2.1, 1.0, 1.35, 1.0),
                                serial="6012345", count=4242,
                                xlat0=t0, xlat1=t1),
    )
    nikon_crypt.set_xlat_tables(None)
    assert decode_raw(path).wb_is_default is True
    nikon_crypt.set_xlat_tables(t0, t1)
    try:
        assert decode_raw(path).wb_is_default is False
    finally:
        nikon_crypt.set_xlat_tables(None)


def test_inject_xlat_file_cli_workflow(tmp_path, rng):
    """--xlat FILE: 512-byte validation, degenerate-table rejection,
    sha256 receipt, and end-to-end effect through the CLI entry."""
    import hashlib
    import json
    import subprocess
    import sys

    t0 = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
    t1 = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
    good = tmp_path / "xlat.bin"
    good.write_bytes(t0 + t1)
    try:
        digest = nikon_crypt.inject_xlat_file(str(good))
        assert digest == hashlib.sha256(t0 + t1).hexdigest()
        assert nikon_crypt.load_xlat_tables() == (t0, t1)
    finally:
        nikon_crypt.set_xlat_tables(None)

    short = tmp_path / "short.bin"
    short.write_bytes(t0)
    with pytest.raises(ValueError, match="512"):
        nikon_crypt.inject_xlat_file(str(short))
    flat = tmp_path / "flat.bin"
    flat.write_bytes(b"\x42" * 512)
    with pytest.raises(ValueError, match="degenerate"):
        nikon_crypt.inject_xlat_file(str(flat))

    # End to end through the CLI: info --xlat reports the real WB.
    m = rng.integers(0, 4096, size=(16, 20), dtype=np.uint16)
    nef = tmp_path / "cli.nef"
    write_synthetic_raw(
        nef, m, compression="nikon",
        nikon_encrypted_wb=dict(ver=204, wb_rgbg=(2.1, 1.0, 1.35, 1.0),
                                serial="6012345", count=4242,
                                xlat0=t0, xlat1=t1),
    )
    out = subprocess.run(
        [sys.executable, "-m", "raweditor_tpu", "--xlat", str(good),
         "info", str(nef)],
        capture_output=True, text=True, check=True)
    meta = json.loads(out.stdout)
    assert meta["wb_is_default"] is False
    np.testing.assert_allclose(
        meta["wb_multipliers"], [2.1, 1.0, 1.35, 1.0], atol=1 / 64)
    # Without tables: neutral + flagged.
    out = subprocess.run(
        [sys.executable, "-m", "raweditor_tpu", "info", str(nef)],
        capture_output=True, text=True, check=True)
    meta = json.loads(out.stdout)
    assert meta["wb_is_default"] is True
    assert meta["wb_multipliers"] == [1.0, 1.0, 1.0, 1.0]


def test_xlat_tables_from_env_file(tmp_path, rng, monkeypatch):
    nikon_crypt.set_xlat_tables(None)
    t0 = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
    t1 = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
    path = tmp_path / "xlat.bin"
    path.write_bytes(t0 + t1)
    monkeypatch.setenv(nikon_crypt.XLAT_ENV, str(path))
    assert nikon_crypt.load_xlat_tables() == (t0, t1)
    monkeypatch.setenv(nikon_crypt.XLAT_ENV, str(tmp_path / "nope"))
    assert nikon_crypt.load_xlat_tables() is None
