"""Canon CR3 / ISO-BMFF container: box walk, CMT metadata, previews."""

import io

import numpy as np
import pytest
from PIL import Image as PILImage

from raweditor_tpu.raw import bmff
from raweditor_tpu.raw.decode import (RawDecodeError, UnsupportedRawError,
                                      decode_raw, extract_preview_jpeg)


def _jpeg(w, h, color):
    buf = io.BytesIO()
    PILImage.new("RGB", (w, h), color).save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture()
def cr3(tmp_path):
    preview = _jpeg(160, 108, (180, 40, 40))
    thumb = _jpeg(32, 24, (40, 180, 40))
    path = tmp_path / "a.cr3"
    blob = bmff.write_synthetic_cr3(
        path, make="Canon", model="EOS Synth R5",
        width=8192, height=5464,
        preview_jpeg=preview, thumb_jpeg=thumb)
    return path, blob, preview, thumb


def test_box_walk_and_metadata(cr3):
    _, blob, _, _ = cr3
    bf = bmff.BmffFile(blob)
    assert bf.brand() == "crx"
    assert bf.codec_version().startswith("CanonCR3")
    info = bf.camera_info()
    assert info["make"] == "Canon"
    assert info["model"] == "EOS Synth R5"
    assert info["width"] == 8192 and info["height"] == 5464
    assert info["orientation"] == 1


def test_preview_prefers_largest(cr3):
    _, blob, preview, thumb = cr3
    got = bmff.BmffFile(blob).preview_jpeg()
    assert got == preview  # PRVW beats THMB
    assert extract_preview_jpeg(blob) == preview


def test_decode_quarantines_with_rich_message(cr3):
    path, _, _, _ = cr3
    with pytest.raises(UnsupportedRawError) as ei:
        decode_raw(path)
    msg = str(ei.value)
    assert "crx" in msg
    assert "EOS Synth R5" in msg
    assert "CanonCR3" in msg
    # and it is a RawDecodeError, so batch export quarantines it
    assert isinstance(ei.value, RawDecodeError)


def test_describe_plain_dict(cr3):
    _, blob, preview, _ = cr3
    d = bmff.describe(blob)
    assert d["container"] == "ISO-BMFF"
    assert d["brand"] == "crx"
    assert d["model"] == "EOS Synth R5"
    assert d["preview_bytes"] == len(preview)


def test_tiers_from_cr3(tmp_path, cr3):
    """The tier cache builds from the embedded PRVW preview even though
    sensor decode quarantines (reference behavior: previews work for
    formats rawloader can't decode)."""
    path, _, _, _ = cr3
    from raweditor_tpu.pipeline.tiers import generate_tiers

    thumb, instant, working = generate_tiers(str(path), 7,
                                             cache_dir=tmp_path / "cache")
    assert all(p for p in (thumb, instant, working))


def test_info_cli_on_cr3(tmp_path, cr3, capsys):
    import json

    from raweditor_tpu.cli import main

    path, _, preview, _ = cr3
    save = tmp_path / "p.jpg"
    rc = main(["info", str(path), "--save-preview", str(save)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["model"] == "EOS Synth R5"
    assert out["codec"].startswith("CanonCR3")
    assert save.read_bytes() == preview


def test_malformed_bmff_quarantines():
    junk = b"\x00\x00\x00\x0cftypcrx " + b"\xff" * 50
    with pytest.raises(RawDecodeError):
        decode_raw(junk)


def test_uuid_opaque_payload_not_misparsed():
    """A uuid box holding binary junk must stay an opaque leaf."""
    blob = bmff.write_synthetic_cr3(None)
    extra = bmff._box(b"uuid", bytes(16) + b"\x12\x34" * 20)
    bf = bmff.BmffFile(blob + extra)
    assert bf.brand() == "crx"
