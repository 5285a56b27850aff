"""8-band HSL color mixer (hue / saturation / luminance per band).

Capability beyond the reference editor, whose color controls end at
temperature/tint + vibrance/saturation (reference:
gpu/shaders.rs:200-246): the targeted color-adjustment panel every
modern RAW editor ships — eight hue bands (red, orange, yellow,
green, aqua, blue, purple, magenta), each with a hue-shift,
saturation, and luminance slider (±100; 24 sliders total,
params.MIXER_FIELDS).

Placement and dataflow: a POINTWISE stage at the head of the finish
extras (ops/extras.extras_core) on the transfer-encoded RGB planes in
[0, 1]. Pointwise means it fuses into the develop program on the XLA
paths and joins the banded Pallas post-pass kernel with zero extra
HBM traffic — no stencil, no halo, just per-pixel selects and
arithmetic the VPU eats for free next to the extras tents.

Math (f32 throughout, per pixel):

1. Hue/chroma/value from RGB (the hexagonal HSV projection):
   v = max(r,g,b), c = v − min(r,g,b), hue h ∈ [0, 360) by the
   standard piecewise formula.
2. The 24 sliders are knots on the hue circle at the band centers
   (0, 30, 60, 120, 180, 240, 280, 320)°; the per-pixel amount of
   each control is the CIRCULAR PIECEWISE-LINEAR interpolation of its
   8 knot values at the pixel's hue — the classic mixer behaviour: a
   pixel between orange and yellow is pulled by both sliders,
   proportionally. Zero sliders interpolate to zero everywhere.
3. Apply: hue shifts by 0.30° per slider unit (a full slider is
   ±30°, one band width); saturation scales chroma by (1 + s/100)
   (−100 fully desaturates the band, +100 doubles its chroma, clamped
   into gamut); luminance scales value by 2^(0.0075·l)
   (±100 → ×1.68 / ×0.595).
4. Convert back and blend with the input by a chroma weight
   w = smoothstep(5c): neutrals are untouched BY CONSTRUCTION (their
   hue is quantization noise), and the effect ramps in smoothly over
   c ∈ [0, 0.2] so the gray boundary cannot band.

Identity: all-zero sliders make every interpolated amount zero, so
the transform reduces to the HSV round trip (≤1 ULP before the
blend). Callers gate the stage statically — EditParams.has_mixer()
host-side picks the ``extras`` specialization (ops/develop._extras_of)
— so a mixer-free develop never traces it: bit-exactness of the
default path by construction, the ops/extras.py discipline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_F = np.float32

#: Band order shared with params.MIXER_FIELDS (Lightroom's panel set).
BAND_NAMES = ("red", "orange", "yellow", "green", "aqua", "blue",
              "purple", "magenta")
#: Band-center hues in degrees; the circle closes magenta → red at 360.
BAND_CENTERS = (0.0, 30.0, 60.0, 120.0, 180.0, 240.0, 280.0, 320.0)

#: Slider-unit scales (documented above; tests pin them).
HUE_DEG_PER_UNIT = 0.30
SAT_PER_UNIT = 0.01
LUM_EXP2_PER_UNIT = 0.0075


def _hat_weights(h):
    """Per-band hat weights for the circular piecewise-linear
    interpolation, PURELY ARITHMETIC (no comparisons or selects — the
    mixer must run identically inside the Pallas extras band, where
    deep select chains have mis-fused; clip/min compile to VPU
    min/max either way and are cheaper than mask chains).

    Band i's hat rises linearly from its left neighbor's center and
    falls to its right neighbor's: w_i(h) = clip(min((h − C_{i−1}) /
    Lw, (C_{i+1} − h) / Rw), 0, 1). The circle is closed by a 9th
    knot — red again at 360° — so h ∈ [0, 360) needs no wraparound
    arithmetic; adjacent hats overlap linearly, so Σ w_i ≡ 1 and the
    weighted sum of knot values IS the circular piecewise-linear
    interpolation. Returns 9 weight planes (the 9th reuses knot 0)."""
    ext = list(BAND_CENTERS) + [360.0]
    weights = []
    for i, ci in enumerate(ext):
        left = ext[i - 1] if i > 0 else BAND_CENTERS[-1] - 360.0
        right = ext[i + 1] if i + 1 < len(ext) else 360.0 + BAND_CENTERS[1]
        rise = (h - _F(left)) * _F(1.0 / (ci - left))
        fall = (_F(right) - h) * _F(1.0 / (right - ci))
        weights.append(
            jnp.clip(jnp.minimum(rise, fall), _F(0.0), _F(1.0)))
    return weights


def _interp(weights, knots):
    """Weighted sum of the 8 knot values (each a traced scalar or an
    array broadcastable against the hue plane) under the 9 hat
    weights — knot 0 closes the circle at 360°."""
    n = len(BAND_CENTERS)
    out = None
    for i, w in enumerate(weights):
        v = jnp.asarray(knots[i % n], jnp.float32)
        term = w * v
        out = term if out is None else out + term
    return out


def apply_hsl_mixer(r, g, b, mixer):
    """The mixer on [0, 1] encoded RGB planes.

    ``mixer`` is the flat 24-sequence (hue×8, sat×8, lum×8 in
    BAND_NAMES order — params.EditParams.mixer_values()); each element
    a traced scalar or an array broadcastable against the planes (the
    batch paths pass (N, 1, 1) per-image amounts). Returns (r, g, b)
    clamped to [0, 1]. jnp-only pointwise math — runs identically
    under XLA and inside the Pallas extras kernel."""
    mixer = [jnp.asarray(v, jnp.float32) for v in mixer]
    if len(mixer) != 3 * len(BAND_CENTERS):
        raise ValueError(
            f"mixer needs {3 * len(BAND_CENTERS)} values, got {len(mixer)}")
    hue_k, sat_k, lum_k = mixer[0:8], mixer[8:16], mixer[16:24]

    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = mx - mn
    safe = jnp.where(c > _F(0.0), c, _F(1.0))
    # Hue sextant: only the max==r arm can go negative → mod 6 there.
    hr = (g - b) / safe
    hr = hr - _F(6.0) * jnp.floor(hr * _F(1.0 / 6.0))
    hg = (b - r) / safe + _F(2.0)
    hb = (r - g) / safe + _F(4.0)
    is_r = mx == r
    is_g = jnp.logical_and(jnp.logical_not(is_r), mx == g)
    h = jnp.where(is_r, hr, jnp.where(is_g, hg, hb)) * _F(60.0)

    weights = _hat_weights(h)
    dh = _interp(weights, hue_k) * _F(HUE_DEG_PER_UNIT)
    fs = jnp.maximum(_F(1.0) + _interp(weights, sat_k) * _F(SAT_PER_UNIT),
                     _F(0.0))
    fl = jnp.exp2(_interp(weights, lum_k) * _F(LUM_EXP2_PER_UNIT))

    h2 = h + dh
    h2 = h2 - _F(360.0) * jnp.floor(h2 * _F(1.0 / 360.0))
    v2 = jnp.clip(mx * fl, _F(0.0), _F(1.0))
    c2 = jnp.minimum(jnp.clip(c * fs, _F(0.0), _F(1.0)), v2)

    # Back-convert (h2, c2, v2) → RGB with the branch-free triangle
    # formula (R = clip(|hp−3|−1), G = clip(2−|hp−2|),
    # B = clip(2−|hp−4|), ×chroma): identical to the sextant table,
    # no floor/select ladder.
    hp = h2 * _F(1.0 / 60.0)

    def tri(center, rising):
        a = jnp.abs(hp - _F(center))
        t = (a - _F(1.0)) if rising else (_F(2.0) - a)
        return c2 * jnp.clip(t, _F(0.0), _F(1.0))

    r1 = tri(3.0, True)
    g1 = tri(2.0, False)
    b1 = tri(4.0, False)
    m = v2 - c2

    # Chroma-weighted blend: w = smoothstep over c ∈ [0, 0.2].
    tcw = jnp.clip(c * _F(5.0), _F(0.0), _F(1.0))
    w = tcw * tcw * (_F(3.0) - _F(2.0) * tcw)

    def out(plane, new):
        return jnp.clip(plane + w * (new + m - plane), _F(0.0), _F(1.0))

    return out(r, r1), out(g, g1), out(b, b1)
