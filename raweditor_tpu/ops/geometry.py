"""Output-stage geometry: straighten (arbitrary-angle rotate) + crop.

Beyond the reference, which renders mosaics as stored (its only
geometry is the view-transform zoom/pan, main.rs:795-930, and we
already apply EXIF orientation on export). These are EXPORT-stage
operations like ``long_edge`` — applied device-side to the developed
image in the single-image engine paths (develop/export CLI,
`DevelopEngine.export*`), not stored edit parameters: the develop
chain, catalog schema, and batch shape-bucketing stay untouched.

Design notes (TPU):

- Rotation is inverse-mapped bilinear sampling: for each output pixel
  the source coordinate is the output coordinate rotated by −θ about
  the frame center. That is two (H_out, W_out) coordinate planes and
  four gathers — the same shape of work as the preview sampler, fused
  by XLA into one program with the interpolation arithmetic.
- The default crop is the largest axis-aligned rectangle with the
  SOURCE aspect ratio inscribed in the rotated frame (the behaviour
  of every "straighten" tool — no black corners, no letterboxing
  decision to make). An explicit crop rectangle overrides it,
  specified in the SOURCE frame's own w×h coordinate box (the frame
  the rotated content pivots inside, sharing its center) — for the
  straighten use-case (small angles) this is the natural "crop the
  picture I see" frame. Content a large rotation carries outside
  that box is unreachable by an explicit crop (use the default
  auto-crop there; a crop region the rotation left empty samples
  clamp-to-edge). Out-of-frame samples clamp to edge.
- Angles are static Python floats: a new angle recompiles (it changes
  the output dims), which is the right trade for an export-stage op —
  interactive straighten previews would go through the engine's
  preview path at fixed size instead.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_F = np.float32


def largest_upright_rect(w: int, h: int, angle_deg: float) -> Tuple[int, int]:
    """(crop_w, crop_h): the largest axis-aligned rectangle with the
    same aspect as (w, h) that fits inside the w×h frame rotated by
    ``angle_deg`` (the classic straighten-crop formula). Identity at
    angle 0."""
    a = abs(math.radians(angle_deg)) % math.pi
    if a > math.pi / 2:
        a = math.pi - a
    if a < 1e-9:
        return w, h
    sin_a, cos_a = math.sin(a), math.cos(a)
    # An upright (cw, ch) rectangle centered in the rotated w×h frame
    # fits iff cw·cos + ch·sin ≤ w and cw·sin + ch·cos ≤ h. With the
    # aspect pinned (cw = (w/h)·ch) both constraints are linear in ch;
    # take the binding one.
    r = w / h
    ch = min(w / (r * cos_a + sin_a), h / (r * sin_a + cos_a))
    cw = r * ch
    # The 1e-6 absorbs float loss at exact right angles (cos(π/2) is
    # ~6e-17, not 0, which would otherwise truncate 64 → 63).
    return max(1, int(cw + 1e-6)), max(1, int(ch + 1e-6))


@functools.partial(
    jax.jit,
    static_argnames=("angle_deg", "out_w", "out_h", "off_x", "off_y"),
)
def _rotate_sample(img_f32, angle_deg: float, out_w: int, out_h: int,
                   off_x: float, off_y: float):
    """Bilinear inverse-map sample of (H, W, C) f32: output pixel
    (y, x) reads the source at R(−θ)·(p_out − c_out) + c_src, where
    c_out is the output-rect center offset (off_x/off_y place the
    rect inside the rotated frame). Clamp-to-edge out of range."""
    h, w = img_f32.shape[0], img_f32.shape[1]
    th = math.radians(angle_deg)
    cos_t, sin_t = math.cos(th), math.sin(th)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0

    # Output pixel (y, x) sits at rotated-frame position
    # (off_x + x, off_y + y); relative to the shared frame center,
    # the source position is that vector rotated by −θ.
    vx = (jnp.arange(out_w, dtype=jnp.float32)[None, :]
          + _F(off_x - cx)) + jnp.zeros((out_h, 1), jnp.float32)
    vy = (jnp.arange(out_h, dtype=jnp.float32)[:, None]
          + _F(off_y - cy)) + jnp.zeros((1, out_w), jnp.float32)
    sx = _F(cos_t) * vx + _F(sin_t) * vy + _F(cx)
    sy = _F(-sin_t) * vx + _F(cos_t) * vy + _F(cy)

    x0 = jnp.clip(jnp.floor(sx), 0, w - 1)
    y0 = jnp.clip(jnp.floor(sy), 0, h - 1)
    fx = jnp.clip(sx - x0, 0.0, 1.0)
    fy = jnp.clip(sy - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    def tap(yi, xi):
        return img_f32[yi, xi]

    top = tap(y0i, x0i) * (1 - fx)[..., None] + tap(y0i, x1i) * fx[..., None]
    bot = tap(y1i, x0i) * (1 - fx)[..., None] + tap(y1i, x1i) * fx[..., None]
    return top * (1 - fy)[..., None] + bot * fy[..., None]


def _resolve_geometry(h: int, w: int, angle_deg: float,
                      crop: Optional[Tuple[int, int, int, int]]):
    """(out_w, out_h, off_x, off_y): the output rectangle in
    rotated-frame pixels. Default = centered largest upright rect of
    the source aspect; explicit crop = (left, top, width, height)."""
    if crop is not None:
        left, top, cw, ch = (int(v) for v in crop)
        if cw <= 0 or ch <= 0:
            raise ValueError(f"crop needs positive size, got {crop}")
        if not (0 <= left and 0 <= top and left + cw <= w
                and top + ch <= h):
            raise ValueError(
                f"crop {crop} exceeds the {w}x{h} frame")
        return cw, ch, float(left), float(top)
    cw, ch = largest_upright_rect(w, h, angle_deg)
    return cw, ch, (w - cw) / 2.0, (h - ch) / 2.0


def _rotate_crop(img, angle_deg, crop, to_f32, from_f32):
    """Shared skeleton for the three dtypes: resolve the rectangle,
    take the identity / pure-crop fast paths, otherwise resample
    (one body — the angle epsilon and slice semantics cannot drift;
    code-review r3)."""
    h, w = img.shape[0], img.shape[1]
    out_w, out_h, off_x, off_y = _resolve_geometry(h, w, angle_deg, crop)
    # Same identity threshold as largest_upright_rect (1e-9): an
    # angle below it already resolves to the identity rectangle, and
    # a mismatched epsilon here ran the full resample for a no-op
    # (code-review r3).
    if (out_w, out_h) == (w, h) and abs(angle_deg) < 1e-9:
        return img
    if abs(angle_deg) < 1e-9:
        # Pure crop: a device slice, no resampling.
        t, l = int(off_y), int(off_x)
        return img[t : t + out_h, l : l + out_w]
    out = _rotate_sample(to_f32(img), float(angle_deg), out_w, out_h,
                         off_x, off_y)
    return from_f32(out)


def rotate_crop_u8(img_u8, angle_deg: float = 0.0,
                   crop: Optional[Tuple[int, int, int, int]] = None):
    """(H, W, 3) u8 → straightened/cropped u8 on device. Positive
    angles rotate the image CLOCKWISE on screen (a horizon that sits
    low on the LEFT is fixed with a positive angle — pinned by
    tests/test_geometry.py's gradient test). ``crop`` is
    (left, top, width, height) in output-frame pixels (after
    rotation); None auto-crops the largest source-aspect rectangle.
    angle 0 + crop None is the identity (returned as-is)."""
    return _rotate_crop(
        img_u8, angle_deg, crop,
        lambda x: x.astype(jnp.float32),
        # floor(c + 0.5): the finish rounding every quantizer in the
        # repo uses (jnp.round's half-to-even diverged on exact
        # halves; code-review r3).
        lambda o: jnp.clip(jnp.floor(o + 0.5), 0, 255).astype(
            jnp.uint8))


def rotate_crop_u16(img_u16, angle_deg: float = 0.0,
                    crop: Optional[Tuple[int, int, int, int]] = None):
    """16-bit variant (TIFF export path)."""
    return _rotate_crop(
        img_u16, angle_deg, crop,
        lambda x: x.astype(jnp.float32),
        lambda o: jnp.clip(jnp.floor(o + 0.5), 0, 65535).astype(
            jnp.uint16))


def rotate_crop_rgba_words_batch(words, angle_deg: float = 0.0,
                                 crop=None):
    """Batched (N, H, W) packed-RGBA variant: the same uniform
    geometry applied to every image of a batch (the exporter's
    ``rotate``/``crop`` options — one compiled program per shape
    bucket, vmapped over images)."""
    if abs(angle_deg) < 1e-9 and crop is None:
        return words
    return jax.vmap(
        lambda w: rotate_crop_rgba_words(w, angle_deg, crop))(words)


def rotate_crop_rgba_words(words, angle_deg: float = 0.0,
                           crop: Optional[Tuple[int, int, int, int]] = None):
    """Packed-RGBA u32 (H, W) variant (the export fast path): unpack,
    resample, repack — one fused program."""

    from raweditor_tpu.ops.extras import (planes_to_words,
                                          words_to_planes)

    def unpack(w32):
        # The shared words contract (values ×255 for the sampler).
        r, g, b = words_to_planes(w32)
        return jnp.stack([r, g, b], axis=-1) * jnp.float32(255.0)

    def repack(o):
        s = jnp.float32(1.0 / 255.0)
        return planes_to_words(
            jnp.clip(o[..., 0] * s, 0, 1),
            jnp.clip(o[..., 1] * s, 0, 1),
            jnp.clip(o[..., 2] * s, 0, 1))

    return _rotate_crop(words, angle_deg, crop, unpack, repack)
