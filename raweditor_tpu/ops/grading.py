"""Color grading (split toning): shadow / midtone / highlight tints.

Capability beyond the reference editor, whose color controls end at
temperature/tint + vibrance/saturation (reference:
gpu/shaders.rs:200-246): the three-wheel color-grading panel of every
modern RAW editor — a hue + saturation pair per tonal region
(shadows, midtones, highlights) plus a balance slider that shifts the
shadow/highlight crossover (7 sliders total, params.GRADE_FIELDS).

Placement and dataflow: a POINTWISE stage at the head of the finish
extras (ops/extras.extras_core), immediately after the HSL mixer, on
the transfer-encoded RGB planes in [0, 1]. Pointwise means it fuses
into the develop program on the XLA paths and joins the banded Pallas
post-pass kernel with zero extra HBM traffic — per-pixel arithmetic
only, no stencil, no halo.

Math (f32 throughout, per pixel):

1. Tonal coordinate: y = 0.2126 r + 0.7152 g + 0.0722 b (the chain's
   own Rec.709 luma), then t = clip(y + balance·0.0035, 0, 1) —
   positive balance extends the highlight tint's reach down the
   range, negative extends the shadows', exactly the Lightroom
   balance convention (±100 ⇒ ±0.35 of the range).
2. Region weights over t: w_s = (1−t)², w_m = 2t(1−t), w_h = t².
   They sum to 1 identically (the square of (1−t)+t), so the three
   wheels partition the tonal axis with smooth quadratic crossfades.
3. Each wheel's tint is a ZERO-LUMA chroma direction: the fully
   saturated RGB of its hue (the branch-free HSV triangle formula,
   same form as ops/mixer.py's back-convert) minus that color's own
   Rec.709 luma. Adding a zero-luma vector cannot change y, so
   grading never re-exposes the image — tonality is preserved
   exactly (before the final gamut clamp).
4. Offset and pinning: off = Σ_r w_r · (sat_r/100) · dir(hue_r),
   scaled by STRENGTH = 0.25 (a full wheel pushes chroma by up to
   0.25) and by the endpoint pin p = smoothstep(clip(8·min(y, 1−y)))
   — pure black and pure white stay untinted (the split-toning
   contract: the paper base and the deepest shadow hold), with the
   pin ramping out over the outer 1/8 of the range.
5. out = clip(rgb + p·off, 0, 1).

Identity: all three saturations at 0 make the offset EXACTLY zero
(each term is sat·stuff with a concrete or traced 0.0), so
out = clip(rgb) ≡ rgb for in-range inputs — bit-exact, no epsilon.
Callers still gate the stage statically (EditParams.has_grading()
host-side picks the ``extras`` specialization) so a grading-free
develop never traces it at all, the ops/extras.py discipline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_F = np.float32
_LUMA = (_F(0.2126), _F(0.7152), _F(0.0722))

#: Field order shared with params.GRADE_FIELDS.
GRADE_ORDER = ("shadow_hue", "shadow_sat", "mid_hue", "mid_sat",
               "high_hue", "high_sat", "balance")

#: Slider-unit scales (documented above; tests pin them).
STRENGTH = 0.25
BALANCE_PER_UNIT = 0.0035


def _hue_dir(hue):
    """The zero-luma chroma direction of ``hue`` (degrees, any float —
    wrapped into [0, 360)): fully saturated HSV (h, 1, 1) → RGB by the
    branch-free triangle formula, minus its own Rec.709 luma. Returns
    (dr, dg, db), each in [−1, 1] with 0.2126·dr + 0.7152·dg +
    0.0722·db ≡ 0 (one f32 rounding)."""
    hue = jnp.asarray(hue, jnp.float32)
    h = hue - _F(360.0) * jnp.floor(hue * _F(1.0 / 360.0))
    hp = h * _F(1.0 / 60.0)

    def tri(center, rising):
        a = jnp.abs(hp - _F(center))
        t = (a - _F(1.0)) if rising else (_F(2.0) - a)
        return jnp.clip(t, _F(0.0), _F(1.0))

    r = tri(3.0, True)
    g = tri(2.0, False)
    b = tri(4.0, False)
    y = _LUMA[0] * r + _LUMA[1] * g + _LUMA[2] * b
    return r - y, g - y, b - y


def apply_color_grading(r, g, b, grading):
    """Color grading on [0, 1] encoded RGB planes.

    ``grading`` is the flat 7-sequence (shadow_hue, shadow_sat,
    mid_hue, mid_sat, high_hue, high_sat, balance —
    params.EditParams.grading_values()); each element a traced scalar
    or an array broadcastable against the planes (the batch paths
    pass (N, 1, 1) per-image amounts). Returns (r, g, b) clamped to
    [0, 1]. jnp-only pointwise math — runs identically under XLA and
    inside the Pallas extras kernel."""
    grading = [jnp.asarray(v, jnp.float32) for v in grading]
    if len(grading) != len(GRADE_ORDER):
        raise ValueError(
            f"grading needs {len(GRADE_ORDER)} values, got {len(grading)}")
    s_hue, s_sat, m_hue, m_sat, h_hue, h_sat, balance = grading

    y = _LUMA[0] * r + _LUMA[1] * g + _LUMA[2] * b
    t = jnp.clip(y + balance * _F(BALANCE_PER_UNIT), _F(0.0), _F(1.0))
    w_s = (_F(1.0) - t) * (_F(1.0) - t)
    w_h = t * t
    w_m = _F(2.0) * t * (_F(1.0) - t)

    off_r = jnp.zeros_like(y)
    off_g = jnp.zeros_like(y)
    off_b = jnp.zeros_like(y)
    for w, hue, sat in ((w_s, s_hue, s_sat), (w_m, m_hue, m_sat),
                        (w_h, h_hue, h_sat)):
        dr, dg, db = _hue_dir(hue)
        amt = w * (sat * _F(STRENGTH / 100.0))
        off_r = off_r + amt * dr
        off_g = off_g + amt * dg
        off_b = off_b + amt * db

    # Endpoint pin: smoothstep over the outer 1/8 at both ends.
    u = jnp.clip(_F(8.0) * jnp.minimum(y, _F(1.0) - y), _F(0.0), _F(1.0))
    p = u * u * (_F(3.0) - _F(2.0) * u)

    clip = lambda c: jnp.clip(c, _F(0.0), _F(1.0))  # noqa: E731
    return (clip(r + p * off_r), clip(g + p * off_g),
            clip(b + p * off_b))
