"""Native extension loader.

``get_rawkit()`` returns the compiled ``_rawkit`` module or None; the
callers in raweditor_tpu.raw fall back to the pure-Python
implementations (identical behavior, asserted by tests). Set
RAWEDITOR_TPU_NO_NATIVE=1 to force the Python paths.
"""

from __future__ import annotations

import os

_cached = None
_tried = False


def get_rawkit():
    global _cached, _tried
    if _tried:
        return _cached
    _tried = True
    if os.environ.get("RAWEDITOR_TPU_NO_NATIVE"):
        return None
    try:
        import importlib

        _cached = importlib.import_module("raweditor_tpu.native._rawkit")
    except ImportError:
        _cached = None
    return _cached


# The canonical export list of the CURRENT rawkit.cpp bindings — the
# single source of truth for both tests/test_native.py's stale-binary
# check and the doctor subcommand (the two lists had drifted;
# code-review r3). Extend this when adding a binding.
REQUIRED_EXPORTS = (
    "scan_jpeg_spans", "unpack_bits", "unpack_bits2",
    "decode_ljpeg", "decode_nikon", "decode_arw2",
    "huffman_pack", "decode_canon_crw", "decode_srw1",
    "decode_srw3", "decode_radc", "encode_jpeg_420",
    "encode_jpeg_444", "pack12_rows", "pack14_rows",
    "jpeg_simd",
)
