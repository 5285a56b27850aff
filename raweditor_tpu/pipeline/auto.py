"""Automatic adjustment suggestions (beyond the reference).

Uses the live-histogram machinery to propose slider values:

- auto exposure: shift the highlight percentile to a target level
  (histogram-driven, like every camera's AE);
- gray-world auto white balance: equalize channel means in linear
  space, expressed through the temperature/tint sliders' ±0.3 linear
  gain model (reference: gpu/shaders.rs:200-205) so the suggestion
  composes with the parity develop chain.

These return EditParams suggestions; nothing is applied implicitly.
"""

from __future__ import annotations

import numpy as np

from raweditor_tpu.params import EditParams


def _is_srgb(engine) -> bool:
    """Which inverse linearizes this engine's renders. The fast-gamma
    variants ('gamma22_poly' / 'srgb_poly') encode the SAME curve to
    u8 accuracy as their exact parents, so they linearize with the
    parent's inverse — exact string comparisons mis-linearized
    fast-gamma sessions (code-review r3)."""
    return str(engine.transfer).startswith("srgb")


def _percentile_from_hist(hist_1d: np.ndarray, pct: float) -> float:
    """Value in [0,1] at the given percentile of a 256-bin histogram."""
    total = hist_1d.sum()
    if total == 0:
        return 1.0
    cum = np.cumsum(hist_1d)
    idx = int(np.searchsorted(cum, pct / 100.0 * total))
    return min(idx, 255) / 255.0


def suggest_exposure(engine, params: EditParams = None,
                     highlight_pct: float = 99.0,
                     target: float = 0.92,
                     max_stops: float = 4.0) -> float:
    """Exposure delta (stops) that moves the highlight percentile of the
    current render to ``target``. Works on the gamma-encoded histogram,
    so the delta is computed back in linear space."""
    params = params or EditParams()
    hist = engine.histogram(params)
    luma_hist = (0.2126 * hist[0] + 0.7152 * hist[1]
                 + 0.0722 * hist[2])
    p = _percentile_from_hist(luma_hist, highlight_pct)
    p = max(p, 1.0 / 255.0)
    # Undo the display transfer to linear, then stops to target.
    srgb = _is_srgb(engine)
    lin = _srgb_to_lin(p) if srgb else p ** 2.2
    target_lin = _srgb_to_lin(target) if srgb else target ** 2.2
    stops = float(np.log2(target_lin / lin))
    return float(np.clip(stops, -max_stops, max_stops))


def _srgb_to_lin(v: float) -> float:
    return v / 12.92 if v <= 0.04045 else ((v + 0.055) / 1.055) ** 2.4


def suggest_white_balance(engine, params: EditParams = None):
    """*Residual* (temperature, tint) relative to the given params, from
    gray-world channel means of the current render.

    Solves the shader's gain model r*(1+0.3t), g*(1+0.3·tint),
    b*(1-0.3t) for the values that equalize the channel means, clamped
    to the slider range. Compose with existing params via
    ``compose_wb`` (or use suggest_auto, which does)."""
    params = params or EditParams()
    hist = engine.histogram(params)
    bins = np.arange(256) / 255.0
    # Undo the engine's display transfer so the means are linear-space.
    if _is_srgb(engine):
        lin = np.where(bins <= 0.04045, bins / 12.92,
                       ((bins + 0.055) / 1.055) ** 2.4)
    else:
        lin = bins ** 2.2
    means = [(hist[c] * lin).sum() / max(hist[c].sum(), 1)
             for c in range(3)]
    r_m, g_m, b_m = (max(m, 1e-6) for m in means)
    # Want r*(1+0.3t) == b*(1-0.3t): t = (b-r)/(0.3(r+b)).
    temp = (b_m - r_m) / (0.3 * (r_m + b_m))
    # Then g*(1+0.3·tint) == mean of balanced r,b (≈ their common value).
    rb = 0.5 * (r_m * (1 + 0.3 * temp) + b_m * (1 - 0.3 * temp))
    tint = (rb / g_m - 1.0) / 0.3
    return (float(np.clip(temp, -1.0, 1.0)),
            float(np.clip(tint, -1.0, 1.0)))


def compose_wb(old: float, residual: float) -> float:
    """Compose two temperature (or tint) corrections under the ±0.3
    linear gain model. The red and blue channels compose with opposite
    signs and don't share an exact solution; the average of the two is
    the least-surprise compromise."""
    from_r = ((1 + 0.3 * old) * (1 + 0.3 * residual) - 1.0) / 0.3
    from_b = (1.0 - (1 - 0.3 * old) * (1 - 0.3 * residual)) / 0.3
    return float(np.clip(0.5 * (from_r + from_b), -1.0, 1.0))


def suggest_levels(engine, params: EditParams = None,
                   lo_pct: float = 0.5, hi_pct: float = 99.5,
                   headroom: float = 0.02):
    """Auto-levels: (blacks, whites) that stretch the current render's
    luminance percentiles to (≈0, ≈1), with a little headroom so the
    tails don't hard-clip. The levels step runs in the linear domain
    ((c - blacks)/(whites - blacks), reference: gpu/shaders.rs:239), so
    the measured display-space percentiles are linearized first, then
    composed with the current blacks/whites (the render already has
    them applied) — re-running on an already-stretched image is a
    ~no-op."""
    params = params or EditParams()
    hist = engine.histogram(params)
    luma_hist = (0.2126 * hist[0] + 0.7152 * hist[1] + 0.0722 * hist[2])
    to_lin = (_srgb_to_lin if _is_srgb(engine)
              else lambda v: v ** 2.2)
    lo = to_lin(_percentile_from_hist(luma_hist, lo_pct))
    hi = to_lin(_percentile_from_hist(luma_hist, hi_pct))
    if hi - lo < 1e-3:  # flat/degenerate render: leave levels alone
        return float(params.blacks), float(params.whites)
    lo = max(lo - headroom, 0.0)
    hi = min(hi + headroom, 1.0)
    old_b = float(params.blacks)
    old_w = float(params.whites)
    span = old_w - old_b
    new_b = old_b + lo * span
    new_w = old_b + hi * span
    return (float(np.clip(new_b, -1.0, 1.0)),
            float(np.clip(new_w, 0.2, 2.0)))


def suggest_contrast(engine, params: EditParams = None,
                     target_spread: float = 0.35,
                     max_delta: float = 30.0) -> float:
    """Contrast *delta* that widens (or narrows) the interquartile
    luminance spread toward ``target_spread`` in linear space. The
    contrast step scales values about 0.5 by (1 + c/100)
    (reference: gpu/shaders.rs:233-234), so the multiplicative gap
    between the current and target spread maps directly onto the
    slider. Conservative clamp; composes with the current params, so
    re-running on a corrected render suggests ~0."""
    params = params or EditParams()
    hist = engine.histogram(params)
    luma_hist = (0.2126 * hist[0] + 0.7152 * hist[1] + 0.0722 * hist[2])
    to_lin = (_srgb_to_lin if _is_srgb(engine)
              else lambda v: v ** 2.2)
    p25 = to_lin(_percentile_from_hist(luma_hist, 25.0))
    p75 = to_lin(_percentile_from_hist(luma_hist, 75.0))
    spread = p75 - p25
    if spread < 1e-3:  # flat render: no meaningful suggestion
        return 0.0
    delta = 100.0 * (target_spread / spread - 1.0)
    return float(np.clip(delta, -max_delta, max_delta))


def suggest_shadows_highlights(engine, params: EditParams = None,
                               shadow_thresh: float = 0.10,
                               highlight_thresh: float = 0.97,
                               shadow_target: float = 0.10,
                               highlight_target: float = 0.01,
                               max_adj: float = 0.8):
    """Scene-aware (shadows, highlights) *deltas* from the current
    render's luminance histogram:

    - a large deep-shadow population (display luminance below
      ``shadow_thresh``) suggests lifting shadows — the shader's
      shadows term scales dark pixels by (1 + (1-lum)*s)
      (reference: gpu/shaders.rs:222-230);
    - a clipped-highlight population above ``highlight_thresh``
      suggests negative highlights (the (1 + lum*h) term).

    Proportional response against the target fractions, conservatively
    clamped; measured on the current render, so after applying the
    suggestion the residual shrinks toward zero (no runaway stacking).
    """
    params = params or EditParams()
    hist = engine.histogram(params)
    luma_hist = (0.2126 * hist[0] + 0.7152 * hist[1] + 0.0722 * hist[2])
    total = max(luma_hist.sum(), 1.0)
    lo_bin = int(round(shadow_thresh * 255))
    hi_bin = int(round(highlight_thresh * 255))
    shadow_frac = float(luma_hist[: lo_bin + 1].sum() / total)
    highlight_frac = float(luma_hist[hi_bin:].sum() / total)
    # Gain 2.0: a fully-black frame (frac 1.0) saturates the clamp; a
    # mild excess produces a gentle lift.
    shadows = 2.0 * max(0.0, shadow_frac - shadow_target)
    highlights = -2.0 * max(0.0, highlight_frac - highlight_target)
    return (float(np.clip(shadows, 0.0, max_adj)),
            float(np.clip(highlights, -max_adj, 0.0)))


def suggest_auto(engine, params: EditParams = None,
                 include_levels: bool = False,
                 include_contrast: bool = False,
                 include_tone: bool = False) -> EditParams:
    """Combined suggestion: residual WB composed onto the current
    params, then an exposure delta measured with the WB applied, and
    optionally auto-levels measured last. Idempotent up to measurement
    noise: a balanced render yields ~zero residuals, so re-running
    `auto` doesn't undo a previous run."""
    params = params or EditParams()
    d_temp, d_tint = suggest_white_balance(engine, params)
    with_wb = params.replace(
        temperature=compose_wb(float(params.temperature), d_temp),
        tint=compose_wb(float(params.tint), d_tint),
    )
    stops = suggest_exposure(engine, with_wb)
    out = with_wb.replace(exposure=float(params.exposure) + stops)
    if include_levels:
        blacks, whites = suggest_levels(engine, out)
        out = out.replace(blacks=blacks, whites=whites)
    if include_contrast:
        # Measured against the params so far — with include_levels the
        # stretch is accounted for, so the two don't double-correct.
        delta = suggest_contrast(engine, out)
        out = out.replace(contrast=float(np.clip(
            float(out.contrast) + delta, -100.0, 100.0)))
    if include_tone:
        d_sh, d_hl = suggest_shadows_highlights(engine, out)
        out = out.replace(
            shadows=float(np.clip(float(out.shadows) + d_sh, -1.0, 1.0)),
            highlights=float(np.clip(float(out.highlights) + d_hl,
                                     -1.0, 1.0)),
        )
    return out
