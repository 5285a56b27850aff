"""EXIF metadata builder (raw/exif.py) unit coverage; the end-to-end
export paths are covered in test_pipeline.test_export_carries_exif_metadata."""

import io
import struct

import numpy as np
import pytest
from PIL import Image

from raweditor_tpu.raw.exif import SOFTWARE, build_exif, splice_exif


def test_build_exif_structure():
    blob = build_exif("MakeCo", "Model X", 3)
    assert blob[:6] == b"Exif\0\0"
    tiff = blob[6:]
    assert tiff[:4] == b"II*\0"
    (ifd_off,) = struct.unpack_from("<I", tiff, 4)
    (n,) = struct.unpack_from("<H", tiff, ifd_off)
    tags = []
    for i in range(n):
        tag, typ, count = struct.unpack_from(
            "<HHI", tiff, ifd_off + 2 + 12 * i)
        tags.append(tag)
    assert tags == sorted(tags)  # TIFF requires ascending tag order
    assert 0x0112 in tags and 0x010F in tags and 0x0110 in tags
    # readable by our own walker too
    from raweditor_tpu.raw import tiff as T

    tf = T.TiffFile(tiff)
    ifd = next(iter(tf.all_ifds()))
    assert ifd.get(T.MAKE) == "MakeCo"
    assert ifd.get(T.MODEL) == "Model X"
    assert ifd.get_scalar(T.ORIENTATION) == 3
    assert ifd.get(0x0131) == SOFTWARE


def test_build_exif_defaults_and_bad_orientation():
    blob = build_exif()  # no camera info: orientation-only block
    img = Image.new("RGB", (4, 4))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", exif=blob)
    ex = Image.open(io.BytesIO(buf.getvalue())).getexif()
    assert ex[274] == 1
    # out-of-range orientation falls back to 1, never an invalid tag
    blob = build_exif(orientation=42)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", exif=blob)
    assert Image.open(io.BytesIO(buf.getvalue())).getexif()[274] == 1


def test_splice_exif_edges():
    exif = build_exif("A", "B", 1)
    # non-JPEG input passes through untouched
    assert splice_exif(b"not a jpeg", exif) == b"not a jpeg"
    assert splice_exif(b"", exif) == b""
    # oversized payload refuses rather than corrupting the marker
    huge = build_exif("A" * 40000, "B" * 40000, 1)
    jpeg = b"\xff\xd8\xff\xd9"
    assert splice_exif(jpeg, huge) == jpeg
    # normal case: APP1 right after SOI, original bytes intact
    out = splice_exif(jpeg, exif)
    assert out[:2] == b"\xff\xd8" and out[2:4] == b"\xff\xe1"
    assert out.endswith(b"\xff\xd9")
    (seg_len,) = struct.unpack_from(">H", out, 4)
    assert seg_len == len(exif) + 2


def test_codec_bench_tool_smoke():
    """tools/codec_bench.py stays runnable (it is the documented
    source of the per-codec MP/s table)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "tools/codec_bench.py", "--mp", "0.05",
         "--repeats", "1", "--codec", "nikon", "srw3"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    import json

    results = json.loads(out.stdout.strip().splitlines()[-1])
    assert set(results) == {"nikon", "srw3"}
    assert all(v["mps"] > 0 for v in results.values())


def test_out_of_line_values_word_aligned():
    """TIFF requires word-aligned value offsets; odd-length ASCII
    values must be padded so the next out-of-line value starts even
    (regression: values were packed back-to-back)."""
    # All four raws (text + NUL) are odd-length -> every entry after
    # the first would land on an odd offset without padding.
    blob = build_exif("MAKEMAKE", "MODELMODEL", 1,
                      software="SOFTWARE", description="DESCRIPTIONS")
    tiff = blob[6:]
    (ifd_off,) = struct.unpack_from("<I", tiff, 4)
    (n,) = struct.unpack_from("<H", tiff, ifd_off)
    out_of_line = 0
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from("<HHI", tiff, base)
        if typ == 2 and count > 4:  # out-of-line ASCII
            (off,) = struct.unpack_from("<I", tiff, base + 8)
            assert off % 2 == 0, f"tag {tag:#x} at odd offset {off}"
            # count excludes the alignment pad
            assert tiff[off + count - 1] == 0
            out_of_line += 1
    assert out_of_line == 4
    # Still a valid EXIF payload for PIL.
    img = Image.new("RGB", (4, 4))
    buf = io.BytesIO()
    img.save(buf, "JPEG", exif=blob)
