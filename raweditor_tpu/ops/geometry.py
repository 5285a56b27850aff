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
- **Lens corrections** (beyond the reference) compose into the SAME
  inverse map, so straighten + distortion + CA cost one resample:
  ``lens=(k1, k2, ca_r, ca_b)`` applies the radial polynomial
  r_src = r·(1 + k1·r̂² + k2·r̂⁴) about the source frame's center
  (r̂ normalized to the half-diagonal, so k coefficients are
  frame-size invariant). POSITIVE k1 samples outward — content moves
  toward the center — correcting PINCUSHION; negative k1 corrects
  BARREL. ``ca_r``/``ca_b`` add a per-channel magnification delta of
  1e-4 per unit (the first-order lateral-CA model: red/blue fringes
  are the R/B planes rendered at slightly different magnification);
  with either nonzero the R and B planes sample at their own
  coordinates (three gathers instead of one). Correction can pull
  out-of-frame coordinates at the edges; those clamp — crop (or the
  rotation auto-crop) covers the usual cases.
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


def _bilerp(img_f32, sx, sy, channel=None):
    """Clamp-to-edge bilinear gather of (H, W, C) f32 (or one channel
    of it) at fractional source coordinates (sy, sx)."""
    h, w = img_f32.shape[0], img_f32.shape[1]
    x0 = jnp.clip(jnp.floor(sx), 0, w - 1)
    y0 = jnp.clip(jnp.floor(sy), 0, h - 1)
    fx = jnp.clip(sx - x0, 0.0, 1.0)
    fy = jnp.clip(sy - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    if channel is None:
        fx, fy = fx[..., None], fy[..., None]

        def tap(yi, xi):
            return img_f32[yi, xi]
    else:
        plane = img_f32[..., channel]

        def tap(yi, xi):
            return plane[yi, xi]

    top = tap(y0i, x0i) * (1 - fx) + tap(y0i, x1i) * fx
    bot = tap(y1i, x0i) * (1 - fx) + tap(y1i, x1i) * fx
    return top * (1 - fy) + bot * fy


@functools.partial(
    jax.jit,
    static_argnames=("angle_deg", "out_w", "out_h", "off_x", "off_y",
                     "lens", "perspective"),
)
def _rotate_sample(img_f32, angle_deg: float, out_w: int, out_h: int,
                   off_x: float, off_y: float, lens=None,
                   perspective=None):
    """Bilinear inverse-map sample of (H, W, C) f32: output pixel
    (y, x) reads the source at R(−θ)·(p_out − c_out) + c_src, where
    c_out is the output-rect center offset (off_x/off_y place the
    rect inside the rotated frame). ``lens`` optionally composes the
    radial distortion / CA correction about the source center into
    the same map (module docstring); ``perspective`` composes the
    keystone warp before the rotation. Clamp-to-edge out of range."""
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
    if perspective is not None:
        # Keystone (first-order projective) correction, composed
        # before the rotation in frame-normalized coords: kv makes
        # the horizontal sampling scale vary with height (fixes
        # converging VERTICALS — camera tilted up/down), kh the dual
        # (fixes converging horizontals — camera panned). The warp
        # widens one edge and narrows the opposite one, exactly
        # undoing the trapezoid a tilted camera records.
        kv, kh = perspective
        u = vx * _F(1.0 / cx)
        v = vy * _F(1.0 / cy)
        vx = u * (_F(1.0) + _F(kv) * v) * _F(cx)
        vy = v * (_F(1.0) + _F(kh) * u) * _F(cy)
    sx = _F(cos_t) * vx + _F(sin_t) * vy + _F(cx)
    sy = _F(-sin_t) * vx + _F(cos_t) * vy + _F(cy)

    if lens is None:
        return _bilerp(img_f32, sx, sy)
    k1, k2, ca_r, ca_b = lens
    dx = sx - _F(cx)
    dy = sy - _F(cy)
    # r̂² normalized to the half-diagonal: corners sit at r̂ = 1, so
    # the k coefficients mean the same thing at every resolution.
    rn2 = (dx * dx + dy * dy) * _F(1.0 / (cx * cx + cy * cy))
    base = _F(1.0) + _F(k1) * rn2 + _F(k2) * rn2 * rn2
    if ca_r == 0.0 and ca_b == 0.0:
        return _bilerp(img_f32, _F(cx) + dx * base, _F(cy) + dy * base)
    out = []
    for ci, ca in enumerate((ca_r, 0.0, ca_b)):
        f = base * _F(1.0 + ca * 1e-4) if ca else base
        out.append(_bilerp(img_f32, _F(cx) + dx * f, _F(cy) + dy * f,
                           channel=ci))
    return jnp.stack(out, axis=-1)


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


def _resolve_lens(lens):
    """Normalize a lens tuple: None when absent or all-zero (the
    identity / pure-crop fast paths stay available), else the
    validated static (k1, k2, ca_r, ca_b) floats."""
    if lens is None:
        return None
    k1, k2, ca_r, ca_b = (float(v) for v in lens)
    for name, v in (("k1", k1), ("k2", k2), ("ca_r", ca_r),
                    ("ca_b", ca_b)):
        if not math.isfinite(v):
            raise ValueError(f"lens {name} must be finite, got {v}")
    if k1 == 0.0 and k2 == 0.0 and ca_r == 0.0 and ca_b == 0.0:
        return None
    return (k1, k2, ca_r, ca_b)


def _resolve_perspective(perspective):
    """Normalize a (kv, kh) keystone pair: None when absent/zero,
    else validated static floats. Amounts are the raw warp
    coefficients (callers map UI sliders to them); |k| is capped at
    0.95 so the edge scale factor 1+k·v stays positive."""
    if perspective is None:
        return None
    kv, kh = (float(v) for v in perspective)
    for name, v in (("kv", kv), ("kh", kh)):
        if not math.isfinite(v):
            raise ValueError(f"perspective {name} must be finite")
        if abs(v) > 0.95:
            raise ValueError(
                f"perspective {name} must be within ±0.95, got {v}")
    if kv == 0.0 and kh == 0.0:
        return None
    return (kv, kh)


def _rotate_crop(img, angle_deg, crop, to_f32, from_f32, lens=None,
                 perspective=None):
    """Shared skeleton for the three dtypes: resolve the rectangle,
    take the identity / pure-crop fast paths, otherwise resample
    (one body — the angle epsilon and slice semantics cannot drift;
    code-review r3)."""
    h, w = img.shape[0], img.shape[1]
    lens = _resolve_lens(lens)
    perspective = _resolve_perspective(perspective)
    out_w, out_h, off_x, off_y = _resolve_geometry(h, w, angle_deg, crop)
    if perspective is not None and crop is None:
        # Keystone widens one edge's sampling reach by (1+|k|); shrink
        # the default rect by that factor so no output pixel samples
        # outside the frame (the widened edge would otherwise smear
        # clamp-to-edge streaks across its corners — the same reason
        # rotation auto-crops). Shrink amounts keep the parity of the
        # original dims so the centered offsets stay integral and the
        # unwarped center row/column remain exact copies. An explicit
        # crop overrides, exactly like rotation.
        kv, kh = perspective
        new_w = max(1, int(out_w / (1.0 + abs(kv))))
        new_h = max(1, int(out_h / (1.0 + abs(kh))))
        if (out_w - new_w) % 2 and new_w > 1:
            new_w -= 1
        if (out_h - new_h) % 2 and new_h > 1:
            new_h -= 1
        off_x += (out_w - new_w) / 2.0
        off_y += (out_h - new_h) / 2.0
        out_w, out_h = new_w, new_h
    # Same identity threshold as largest_upright_rect (1e-9): an
    # angle below it already resolves to the identity rectangle, and
    # a mismatched epsilon here ran the full resample for a no-op
    # (code-review r3).
    if lens is None and perspective is None:
        if (out_w, out_h) == (w, h) and abs(angle_deg) < 1e-9:
            return img
        if abs(angle_deg) < 1e-9:
            # Pure crop: a device slice, no resampling.
            t, l = int(off_y), int(off_x)
            return img[t : t + out_h, l : l + out_w]
    out = _rotate_sample(to_f32(img), float(angle_deg), out_w, out_h,
                         off_x, off_y, lens=lens,
                         perspective=perspective)
    return from_f32(out)


def rotate_crop_u8(img_u8, angle_deg: float = 0.0,
                   crop: Optional[Tuple[int, int, int, int]] = None,
                   lens=None, perspective=None):
    """(H, W, 3) u8 → straightened/cropped u8 on device. Positive
    angles rotate the image CLOCKWISE on screen (a horizon that sits
    low on the LEFT is fixed with a positive angle — pinned by
    tests/test_geometry.py's gradient test). ``crop`` is
    (left, top, width, height) in output-frame pixels (after
    rotation); None auto-crops the largest source-aspect rectangle.
    ``lens`` = (k1, k2, ca_r, ca_b) composes the distortion/CA
    correction into the same resample (module docstring). angle 0 +
    crop None + no lens is the identity (returned as-is)."""
    return _rotate_crop(
        img_u8, angle_deg, crop,
        lambda x: x.astype(jnp.float32),
        # floor(c + 0.5): the finish rounding every quantizer in the
        # repo uses (jnp.round's half-to-even diverged on exact
        # halves; code-review r3).
        lambda o: jnp.clip(jnp.floor(o + 0.5), 0, 255).astype(
            jnp.uint8), lens=lens, perspective=perspective)


def rotate_crop_u16(img_u16, angle_deg: float = 0.0,
                    crop: Optional[Tuple[int, int, int, int]] = None,
                    lens=None, perspective=None):
    """16-bit variant (TIFF export path)."""
    return _rotate_crop(
        img_u16, angle_deg, crop,
        lambda x: x.astype(jnp.float32),
        lambda o: jnp.clip(jnp.floor(o + 0.5), 0, 65535).astype(
            jnp.uint16), lens=lens, perspective=perspective)


def rotate_crop_rgba_words_batch(words, angle_deg: float = 0.0,
                                 crop=None, lens=None,
                                 perspective=None):
    """Batched (N, H, W) packed-RGBA variant: the same uniform
    geometry applied to every image of a batch (the exporter's
    ``rotate``/``crop``/``lens`` options — one compiled program per
    shape bucket, vmapped over images)."""
    if (abs(angle_deg) < 1e-9 and crop is None
            and _resolve_lens(lens) is None
            and _resolve_perspective(perspective) is None):
        return words
    return jax.vmap(
        lambda w: rotate_crop_rgba_words(
            w, angle_deg, crop, lens=lens,
            perspective=perspective))(words)


def rotate_crop_rgba_words(words, angle_deg: float = 0.0,
                           crop: Optional[Tuple[int, int, int, int]] = None,
                           lens=None, perspective=None):
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

    return _rotate_crop(words, angle_deg, crop, unpack, repack,
                        lens=lens, perspective=perspective)
