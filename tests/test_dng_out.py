"""DNG export (raw/dng_out.py): the archival round-trip contract.

For any decodable input, decode → write_dng → decode must reproduce the
mosaic bit-exactly and every piece of develop-relevant metadata to
rational-quantization precision, so developing the DNG renders
identically to developing the source (the Adobe-DNG-converter
linearized-conversion model). Beyond-reference capability (the
reference app exports developed JPEG/PNG only, main.rs:1744-1799).
"""

import json
import os

import numpy as np
import pytest

from raweditor_tpu.raw.decode import decode_raw, extract_preview_jpeg
from raweditor_tpu.raw.dng_out import write_dng
from raweditor_tpu.raw.synth import (write_synthetic_linear_dng,
                                     write_synthetic_raw)
from raweditor_tpu.raw.types import RawImage

RNG = np.random.default_rng(1234)


def _mosaic(h=40, w=64, bpp=12):
    return RNG.integers(0, 1 << bpp, size=(h, w), dtype=np.uint16)


def _assert_round_trip(img, compression):
    data = write_dng(None, img, compression=compression)
    back = decode_raw(data)
    assert np.array_equal(back.mosaic, img.mosaic)
    assert np.allclose(back.wb_multipliers, img.wb_multipliers, atol=1e-5)
    assert np.allclose(back.xyz_to_cam, img.xyz_to_cam, atol=1e-3)
    assert back.white_level == img.white_level
    assert abs(back.black_level - img.black_level) < 0.01
    assert back.cfa_pattern == img.cfa_pattern or img.is_linear
    assert back.orientation == img.orientation
    assert back.wb_is_default == img.wb_is_default
    return back


@pytest.mark.parametrize("compression", ["ljpeg", "none"])
def test_cfa_round_trip(compression):
    src = write_synthetic_raw(
        None, _mosaic(), compression="nikon", bpp=12,
        black_level=(64, 66, 66, 70), orientation=6, cfa="GBRG",
        wb_neutral=(0.45, 1.0, 0.62),
        xyz_to_cam=np.array([[0.9, 0.1, 0.0], [-0.2, 1.1, 0.1],
                             [0.05, -0.3, 1.2]], dtype=np.float32),
    )
    img = decode_raw(src)
    back = _assert_round_trip(img, compression)
    assert np.allclose(back.black_per_site, img.black_per_site,
                       atol=0.01)


def test_every_codec_survives_conversion():
    """The convert path is codec-agnostic: whatever decode_raw can
    produce, write_dng must round-trip."""
    for comp in ("none", "ljpeg", "ljpeg4", "arw2", "kodak65000",
                 "pentax"):
        img = decode_raw(write_synthetic_raw(
            None, _mosaic(32, 64), compression=comp, bpp=12))
        back = decode_raw(write_dng(None, img))
        assert np.array_equal(back.mosaic, img.mosaic), comp


def test_14bit_curve_white_preserved():
    """White levels above the nominal bit depth (Nikon curve plateaus)
    must keep their recovered WhiteLevel, and samples wider than 12 bits
    must widen the LJPEG precision."""
    m = RNG.integers(0, 16384, size=(32, 48), dtype=np.uint16)
    img = RawImage(
        mosaic=m,
        wb_multipliers=np.array([2.0, 1.0, 1.5, 1.0], np.float32),
        xyz_to_cam=np.eye(3, dtype=np.float32),
        white_level=15872.0,
    )
    back = decode_raw(write_dng(None, img))
    assert np.array_equal(back.mosaic, m)
    assert back.white_level == 15872.0


def test_xtrans_pattern_round_trip():
    from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN

    cfa = XTRANS_PATTERN  # 36-char 6x6 row-major pattern string
    img = RawImage(
        mosaic=_mosaic(36, 48),
        wb_multipliers=np.array([1.8, 1.0, 1.3, 1.0], np.float32),
        xyz_to_cam=np.eye(3, dtype=np.float32),
        white_level=4095.0,
        cfa_pattern=cfa,
    )
    back = decode_raw(write_dng(None, img))
    assert np.array_equal(back.mosaic, img.mosaic)
    assert back.cfa_pattern == cfa


def test_linear_round_trip():
    src = write_synthetic_linear_dng(
        None, RNG.integers(0, 65535, size=(24, 32, 3), dtype=np.uint16))
    img = decode_raw(src)
    for comp in ("ljpeg", "none"):
        back = decode_raw(write_dng(None, img, compression=comp))
        assert back.is_linear
        assert np.array_equal(back.mosaic, img.mosaic)


def test_default_wb_stays_default():
    """wb_is_default (e.g. CR3 without ColorData, 0x0097 without xlat)
    must NOT be laundered into a confident AsShotNeutral."""
    img = RawImage(
        mosaic=_mosaic(16, 32),
        wb_multipliers=np.ones(4, np.float32),
        xyz_to_cam=np.eye(3, dtype=np.float32),
        white_level=4095.0,
        wb_is_default=True,
    )
    back = decode_raw(write_dng(None, img))
    assert back.wb_is_default
    assert np.allclose(back.wb_multipliers, 1.0)


def test_preview_carried_over(tmp_path):
    src = write_synthetic_raw(None, _mosaic(), compression="none")
    preview = extract_preview_jpeg(src)
    assert preview is not None
    img = decode_raw(src)
    p = tmp_path / "out.dng"
    write_dng(p, img, preview_jpeg=preview)
    assert extract_preview_jpeg(str(p)) == preview


def test_develop_identical_to_source(tmp_path):
    """The product claim: developing the DNG == developing the source."""
    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.engine import DevelopEngine

    src_path = tmp_path / "cam.nef"
    write_synthetic_raw(
        src_path, _mosaic(64, 96), compression="nikon", bpp=12,
        black_level=64, wb_neutral=(0.5, 1.0, 0.7), orientation=1)
    img = decode_raw(str(src_path))
    dng_path = tmp_path / "cam.dng"
    write_dng(dng_path, img)

    params = EditParams(exposure=0.4, contrast=12.0, vibrance=0.3,
                        temperature=0.1)
    out = []
    for p in (src_path, dng_path):
        eng = DevelopEngine.open(str(p), mode="accurate")
        out.append(np.asarray(eng.full(params)))
    assert np.array_equal(out[0], out[1])


def test_writer_rejects_bad_input():
    img = RawImage(
        mosaic=_mosaic().astype(np.float32),
        wb_multipliers=np.ones(4, np.float32),
        xyz_to_cam=np.eye(3, dtype=np.float32),
    )
    with pytest.raises(ValueError, match="uint16"):
        write_dng(None, img)
    ok = RawImage(
        mosaic=_mosaic(),
        wb_multipliers=np.ones(4, np.float32),
        xyz_to_cam=np.eye(3, dtype=np.float32),
    )
    with pytest.raises(ValueError, match="compression"):
        write_dng(None, ok, compression="zip")
    with pytest.raises(ValueError, match="CFA"):
        write_dng(None, RawImage(
            mosaic=_mosaic(),
            wb_multipliers=np.ones(4, np.float32),
            xyz_to_cam=np.eye(3, dtype=np.float32),
            cfa_pattern="RGXB",
        ))


def test_cli_convert(tmp_path):
    from raweditor_tpu.cli import main

    good = tmp_path / "a.nef"
    bad = tmp_path / "b.nef"
    write_synthetic_raw(good, _mosaic(), compression="nikon")
    bad.write_bytes(b"II*\x00garbage-not-a-real-file")
    out_dir = tmp_path / "dng"

    # Batch with one corrupt file: quarantine semantics, exit code 1,
    # but the good file still converts.
    rc = main(["convert", str(good), str(bad),
               "--out-dir", str(out_dir)])
    assert rc == 1
    produced = out_dir / "a.dng"
    assert produced.exists()
    back = decode_raw(str(produced))
    assert np.array_equal(back.mosaic, decode_raw(str(good)).mosaic)
    assert not (out_dir / "b.dng").exists()

    # Existing output refuses without --force.
    assert main(["convert", str(good), "--out-dir", str(out_dir)]) == 1
    assert main(["convert", str(good), "--out-dir", str(out_dir),
                 "--force", "--compression", "none"]) == 0


def test_cli_reference_covers_convert():
    text = open(os.path.join(os.path.dirname(__file__), os.pardir,
                             "docs", "cli.md")).read()
    assert "## `convert`" in text


def test_non_ascii_camera_strings_sanitized():
    """Decoded Make/Model can carry non-ASCII (raw/tiff.py decodes
    with errors='replace', so U+FFFD is reachable); the writers must
    sanitize to '?' instead of crashing with UnicodeEncodeError."""
    img = decode_raw(write_synthetic_raw(None, _mosaic(16, 32)))
    img.camera_make = "NI�KON"
    img.camera_model = "Zé 8"
    back = decode_raw(write_dng(None, img))
    assert back.camera_make == "NI?KON"
    assert back.camera_model == "Z? 8"
