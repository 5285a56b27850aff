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
