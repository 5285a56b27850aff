"""Shared utilities: device init, timing, logging."""

from raweditor_tpu.utils.device import ensure_backend

__all__ = ["ensure_backend"]
