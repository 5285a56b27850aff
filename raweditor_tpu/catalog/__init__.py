"""SQLite catalog: image library + non-destructive edit store."""

from raweditor_tpu.catalog.data import Image
from raweditor_tpu.catalog.library import Library, RAW_EXTENSIONS

__all__ = ["Image", "Library", "RAW_EXTENSIONS"]
