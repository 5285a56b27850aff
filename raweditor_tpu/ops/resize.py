"""On-device image resizing (XLA) for preview tiers.

The reference Lanczos3-resizes embedded JPEGs on the CPU
(reference: raw/processor.rs:67-88). When tiers are generated from a
*developed* image instead (no embedded preview, or develop-with-edits
tiers), the resize can run on the TPU with ``jax.image.resize`` before
a single small fetch — the survey's native-ledger replacement for the
image-crate resize path.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def tier_shape(full_w: int, full_h: int, target_w: int) -> Tuple[int, int]:
    """Width-constrained aspect-preserving tier size (PIL-rounding, as
    pipeline/tiers.py uses host-side)."""
    scale = target_w / full_w
    return target_w, max(1, round(full_h * scale))


@functools.partial(jax.jit, static_argnames=("out_w", "out_h", "method"))
def resize_rgb(img_u8, out_w: int, out_h: int, method: str = "lanczos3"):
    """(H, W, 3) u8 → (out_h, out_w, 3) u8 on device.

    Default kernel is lanczos3 to match the reference's FilterType
    (reference: raw/processor.rs:74)."""
    x = img_u8.astype(jnp.float32)
    y = jax.image.resize(x, (out_h, out_w, img_u8.shape[-1]), method=method)
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


def develop_tiers(img_u8, widths: Sequence[int] = (256, 384, 1280),
                  method: str = "lanczos3"):
    """All preview tiers of a developed image, resized on device.

    Returns a list of (h, w, 3) u8 device arrays, one per tier width.
    """
    h, w = img_u8.shape[:2]
    out = []
    for tw in widths:
        ow, oh = tier_shape(w, h, tw)
        out.append(resize_rgb(img_u8, ow, oh, method))
    return out


def long_edge_shape(h: int, w: int, long_edge: int) -> Tuple[int, int]:
    """Aspect-preserving (out_h, out_w) with the longer side exactly
    ``long_edge``. Never upscales: returns (h, w) unchanged when the
    image already fits (the convention of every export-resize UI —
    the reference has no export resize at all; this is a
    beyond-reference exporter feature)."""
    if long_edge <= 0 or max(h, w) <= long_edge:
        return h, w
    if w >= h:
        return max(1, round(h * long_edge / w)), long_edge
    return long_edge, max(1, round(w * long_edge / h))


@functools.partial(jax.jit, static_argnames=("out_w", "out_h", "method"))
def resize_rgba_words(words, out_w: int, out_h: int,
                      method: str = "lanczos3"):
    """Batched packed-RGBA resize: (..., H, W) u32 → (..., out_h,
    out_w) u32, on device.

    Unpacks to f32 RGB, Lanczos3-resizes (the reference's FilterType
    for its CPU tier resizes, raw/processor.rs:74), requantizes, and
    repacks — alpha stays opaque. Used by the batch exporter's
    ``long_edge`` option so only the resized pixels cross the link."""
    r = (words & 0xFF).astype(jnp.float32)
    g = ((words >> 8) & 0xFF).astype(jnp.float32)
    b = ((words >> 16) & 0xFF).astype(jnp.float32)
    x = jnp.stack([r, g, b], axis=-1)
    y = jax.image.resize(x, words.shape[:-2] + (out_h, out_w, 3),
                         method=method)

    def q(c):
        return jnp.clip(jnp.round(c), 0, 255).astype(jnp.uint32)

    return (q(y[..., 0]) | (q(y[..., 1]) << 8) | (q(y[..., 2]) << 16)
            | jnp.uint32(0xFF000000))


@functools.partial(jax.jit, static_argnames=("out_w", "out_h", "method"))
def resize_rgb16(img_u16, out_w: int, out_h: int,
                 method: str = "lanczos3"):
    """Batched 16-bit resize: (..., H, W, 3) u16 → (..., out_h, out_w,
    3) u16 on device (the exporter's ``long_edge`` on TIFF output)."""
    x = img_u16.astype(jnp.float32)
    y = jax.image.resize(x, img_u16.shape[:-3] + (out_h, out_w, 3),
                         method=method)
    return jnp.clip(jnp.round(y), 0, 65535).astype(jnp.uint16)
