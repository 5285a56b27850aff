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
