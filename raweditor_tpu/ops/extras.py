"""Finish extras: luma sharpening + edge-preserving denoise.

Capability beyond the reference editor, whose develop chain ends at
vibrance + gamma (reference: gpu/shaders.rs:171-267 has no spatial
output filtering). These are the two most-requested develop controls
its 10-slider model lacks; both are small fixed-radius stencils.

Placement: the extras run on the TRANSFER-ENCODED RGB planes in
[0, 1], after the gamma/sRGB encode and immediately before output
quantization (ops/develop.py ``finish_to_*``). That is the classic
image-domain placement — unsharp masking acts on the perceptually
uniform signal (halo energy is symmetric in display space, not skewed
by the linear-light highlights), and the noise the denoiser targets is
what survives into the output after the transfer's shadow boost.

The pipeline (radius-2 receptive field in total):

1. Opponent split: luma y = 0.2126 r + 0.7152 g + 0.0722 b (the
   chain's own Rec.709 constants), chroma cr = r − y, cb = b − y.
2. Chroma denoise: two 3×3 tent passes over cr/cb (radius 2), blended
   by ``denoise``/100. Chroma noise is the visually dominant component
   of high-ISO RAW noise and smoothing it barely costs acutance.
3. Luma denoise: one 3×3 bilateral-lite pass — tent spatial weights ×
   a rational range kernel 1/(1 + (Δy/σ)²), σ ramping 0.02→0.08 with
   strength — blended by the same ``denoise``/100. Edges (Δy ≫ σ) keep
   weight ≈ 0 and stay crisp.
4. Sharpen: unsharp mask on the (denoised) luma,
   y′ = y + (y − tent3(y)) · ``sharpen``/100. Luma-only sharpening
   adds no color fringing by construction.
5. Rebuild: r = y′ + cr′, b = y′ + cb′, g from the luma identity, all
   clamped to [0, 1] for the quantizers (USM overshoot would otherwise
   wrap the u8/u16 casts).

Zero-strength behaviour: with both amounts 0 the math reduces to
y + 0 and c + 0 — but the opponent round trip (y + (r − y)) can shift
values by 1 ULP of f32, i.e. occasionally 1 LSB after quantization.
Bit-exactness of the default path is therefore guaranteed statically:
the develop entry points only call into this module when their static
``extras`` flag is set (params.EditParams.has_finish_extras decides
host-side), so an unedited develop never traces these ops at all.

Two executions of the same math (single source of truth:
:func:`extras_core`, parameterized over ±1-shift closures):

- **XLA in-chain** (:func:`apply_finish_extras`): fused into the
  develop program pre-quantization. Semantically the reference, but
  XLA materializes each composed stencil stage through HBM — measured
  12.7 ms on top of a 1.5 ms develop @24 MP (the same pathology that
  sent the 'grad' demosaic in-kernel; docs/performance.md).
- **Pallas post-pass** (ops/pallas_develop.pallas_finish_extras_rgba):
  one fused kernel over the packed-RGBA u32 words ANY develop lane
  emits — unpack u8→[0,1], same core, requantize. One extra HBM round
  trip total. Operating post-quantization adds ≤1/255 of input noise,
  inside the fast lanes' ±1 LSB contract.

All helpers accept batched (..., H, W) planes — the batch exporter
vmaps over images. Boundary handling is clamp-to-edge, like every
other stencil in the chain. The radius-2 receptive field exceeds the
row-sharded develop's fixed halo, so the exporter routes
extras-enabled batches data-parallel, exactly like the 'grad'
demosaic (parallel/batch.py HALO_DEMOSAICS policy).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_F = np.float32
_LUMA_R, _LUMA_G, _LUMA_B = _F(0.2126), _F(0.7152), _F(0.0722)


def _pad_shift_fns():
    """Clamp-to-edge ±1 shift closures over (..., H, W) planes for the
    XLA path: ``up(x)`` is the value one row up (row 0 replicates),
    etc. Corner taps compose (``lf(up(x))``) exactly like an edge pad
    in both dims."""

    def up(x):
        return jnp.concatenate([x[..., :1, :], x[..., :-1, :]], axis=-2)

    def dn(x):
        return jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)

    def lf(x):
        return jnp.concatenate([x[..., :, :1], x[..., :, :-1]], axis=-1)

    def rt(x):
        return jnp.concatenate([x[..., :, 1:], x[..., :, -1:]], axis=-1)

    return up, dn, lf, rt


def tone_curve(y, curve):
    """Parametric tone curve on encoded luma: four region sliders
    (shadows / darks / lights / highlights, ±100) move the interior
    knots of a uniform 6-knot piecewise-linear remap (knot x = 0, .2,
    .4, .6, .8, 1; full slider = ±0.15 lift at its knot; endpoints
    pinned so black stays black and white stays white). Monotonicity
    is guaranteed structurally: a forward-max / backward-min cascade
    keeps the knot values strictly ascending before interpolation —
    opposing extreme sliders soft-limit each other instead of
    inverting the curve (the Lightroom parametric-curve behaviour).
    At zero sliders the interpolation reduces to 0.2·Σ clip(5y−i) ≡ y
    exactly (modulo one f32 rounding), so the curve is identity by
    construction, not by approximation."""
    amts = [jnp.asarray(c, jnp.float32) * _F(0.15 / 100.0)
            for c in curve]
    eps = _F(1e-3)
    # Per-knot bounds spaced by eps so the cascades can never push a
    # knot past the pinned endpoints: knot i lives in
    # [(i+1)·eps, 1−(4−i)·eps], and since each ceiling is exactly eps
    # above the previous one, the forward max (k[i] ≥ k[i−1]+eps)
    # stays under its own ceiling — out-of-range sliders (the engine
    # accepts any float) soft-limit instead of inverting the top
    # segment (code-review r3: four +600 sliders compounded the old
    # cascade to k=1.002 and a negative final-segment slope).
    k = [jnp.clip(_F(0.2 * (i + 1)) + a, _F((i + 1) * 1e-3),
                  _F(1.0 - (4 - i) * 1e-3))
         for i, a in enumerate(amts)]
    for i in range(1, 4):          # forward: ascending floors
        k[i] = jnp.maximum(k[i], k[i - 1] + eps)
    for i in range(2, -1, -1):     # backward: ascending ceilings
        k[i] = jnp.minimum(k[i], k[i + 1] - eps)
    t = jnp.clip(y, _F(0.0), _F(1.0)) * _F(5.0)
    out = jnp.zeros_like(y)
    prev = _F(0.0)
    for i, kn in enumerate(k + [_F(1.0)]):
        out = out + (kn - prev) * jnp.clip(t - _F(float(i)), _F(0.0),
                                           _F(1.0))
        prev = kn
    return out


def radial_sq(h, w, rows=None, cols=None):
    """Normalized radial-distance² plane for the vignette: 0 at the
    frame center, 1 at the corners. ``rows``/``cols`` override the
    default output-grid iotas (the Pallas kernel passes its global-row
    band iota; the full-frame XLA paths use the plain grid)."""
    cy, cx = _F((h - 1) / 2.0), _F((w - 1) / 2.0)
    if rows is None:
        rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    if cols is None:
        cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    ry = (rows - cy) * _F(1.0 / max(cy, 1.0))
    rx = (cols - cx) * _F(1.0 / max(cx, 1.0))
    return (ry * ry + rx * rx) * _F(0.5)


def _clarity_blur(y):
    """The clarity base layer: a large-radius low-pass via a resize
    pyramid — downsample ~16× per axis (bilinear), one 3×3 tent on the
    small grid, upsample back. Radius scales with the frame (~3% of
    each dimension), so previews and full-res exports share the same
    look. Three HBM-bound resize passes + a tiny stencil: XLA handles
    them well (no composed-stencil pathology — this is why clarity is
    NOT part of the in-kernel extras_core; the Pallas band can't see
    the whole frame anyway)."""
    import jax

    h, w = y.shape[-2], y.shape[-1]
    sh, sw = max(h // 16, 4), max(w // 16, 4)
    small = jax.image.resize(y, y.shape[:-2] + (sh, sw), "linear")
    up_, dn_, lf_, rt_ = _pad_shift_fns()
    sv = (up_(small) + small * _F(2.0)) + dn_(small)
    small = ((lf_(sv) + sv * _F(2.0)) + rt_(sv)) * _F(1.0 / 16.0)
    return jax.image.resize(small, y.shape, "linear")


def apply_clarity(r, g, b, clarity):
    """Clarity (±100): midtone local contrast on encoded luma,
    y′ = y + (c/100)·0.5·(y − blur(y))·4y(1−y) — the midtone weight
    suppresses halos at the tonal extremes; negative values give the
    soft-glow 'negative clarity' look. Identity at 0 by construction
    (the correction term is scaled by the amount)."""
    clarity = jnp.asarray(clarity, jnp.float32)
    y = _LUMA_R * r + _LUMA_G * g + _LUMA_B * b
    cr = r - y
    cb = b - y
    detail = y - _clarity_blur(y)
    wgt = _F(4.0) * y * (_F(1.0) - y)
    y = y + clarity * _F(0.005) * detail * wgt
    r = y + cr
    b = y + cb
    g = (y - _LUMA_R * r - _LUMA_B * b) * _F(1.0 / 0.7152)
    clip = lambda c: jnp.clip(c, _F(0.0), _F(1.0))  # noqa: E731
    return clip(r), clip(g), clip(b)


def words_to_planes(words):
    """Packed-RGBA u32 → [0, 1] f32 planes (the words-domain extras
    contract: u8 values rescaled by 1/255). One definition shared by
    every words-domain pass (code-review r3)."""
    scale = _F(1.0 / 255.0)
    return ((words & 0xFF).astype(jnp.float32) * scale,
            ((words >> 8) & 0xFF).astype(jnp.float32) * scale,
            ((words >> 16) & 0xFF).astype(jnp.float32) * scale)


def planes_to_words(r, g, b):
    """[0, 1] f32 planes → packed-RGBA u32 with the finish rounding
    floor(c·255 + 0.5) and opaque alpha."""

    def q(c):
        return jnp.floor(c * _F(255.0) + _F(0.5)).astype(jnp.uint32)

    return (q(r) | (q(g) << 8) | (q(b) << 16) | jnp.uint32(0xFF000000))


def apply_clarity_words(words, clarity):
    """Clarity on packed-RGBA words — the fast lane's standalone pass
    (runs between the develop kernel and the extras post-pass; the
    pyramid needs the whole frame, which the Pallas band can't see)."""
    r, g, b = words_to_planes(words)
    return planes_to_words(*apply_clarity(r, g, b, clarity))


def apply_dehaze(r, g, b, amount):
    """Dehaze (±100) on encoded [0, 1] planes: veil estimation +
    atmospheric-scattering inversion, the Lightroom-class haze
    control.

    Per image (reductions keep the leading batch axes):

    1. Veil color A per channel: the max of the 16×-downsampled plane
       (robust to isolated hot pixels), clamped to [0.55, 1] — haze is
       a BRIGHT veil; clamping keeps dark frames from inventing one.
    2. Haze proxy: the dark channel dk = min_c(c/A_c), low-passed by
       the clarity pyramid blur (the transmission field is smooth by
       nature; the shared blur keeps look consistent across sizes).
    3. Positive amounts invert the scattering model I = J·t + A(1−t):
       t = max(1 − 0.85·(a/100)·blur(dk), 0.15),
       J = (I − A)/t + A. Hazy regions (dk → 1) get deep contrast
       restoration; clear regions (dk → 0, t → 1) are untouched.
    4. Negative amounts ADD the veil: out = I + 0.5·(|a|/100)·(A − I)
       — the artistic "haze" look.

    Identity at 0 by construction (t ≡ 1 and the negative blend is
    scaled by the amount). A whole-frame stage like clarity — the per
    -image A reduction and the pyramid blur can't live in the banded
    Pallas kernel — so it shares clarity's wiring: the "full" extras
    mode, its own words pass on the fast lanes, and per-image amounts
    under the batch exporter. Zoomed previews estimate A over the
    viewport (the vignette/clarity approximation; exports are
    full-frame and exact)."""
    import jax

    amount = jnp.asarray(amount, jnp.float32)
    a = amount * _F(0.01)
    h, w = r.shape[-2], r.shape[-1]
    sh, sw = max(h // 16, 4), max(w // 16, 4)

    def veil(c):
        small = jax.image.resize(c, c.shape[:-2] + (sh, sw), "linear")
        return jnp.clip(small.max(axis=(-2, -1), keepdims=True),
                        _F(0.55), _F(1.0))

    ar, ag, ab = veil(r), veil(g), veil(b)
    dk = jnp.minimum(jnp.minimum(r / ar, g / ag), b / ab)
    dkb = jnp.clip(_clarity_blur(dk), _F(0.0), _F(1.0))
    t = jnp.maximum(
        _F(1.0) - _F(0.85) * jnp.clip(a, _F(0.0), _F(1.0)) * dkb,
        _F(0.15))
    v = _F(0.5) * jnp.clip(-a, _F(0.0), _F(1.0))
    pos = a >= _F(0.0)

    def out(c, ac):
        dehazed = (c - ac) / t + ac
        hazed = c + v * (ac - c)
        return jnp.clip(jnp.where(pos, dehazed, hazed),
                        _F(0.0), _F(1.0))

    return out(r, ar), out(g, ag), out(b, ab)


def apply_dehaze_words(words, amount):
    """Dehaze on packed-RGBA words — the fast lane's standalone pass,
    composed BEFORE clarity (remove the veil, then work the local
    contrast), mirroring apply_finish_extras' plane order."""
    r, g, b = words_to_planes(words)
    return planes_to_words(*apply_dehaze(r, g, b, amount))


def apply_grain(r, g, b, amount, size=0.0):
    """Film grain (amount 0–100, size 0–100) on encoded [0, 1]
    planes — the LAST finish stage (grain must not be re-sharpened or
    denoised, so it lands after every other extra).

    Monochrome (luma-correlated) grain, the film look: one noise
    offset shared by all three channels so it never reads as chroma
    noise. The noise field is DETERMINISTIC — a fixed-key
    ``jax.random`` normal per frame shape — so the same edit always
    produces the same bytes (exports are reproducible, a batch
    contract). ``size`` blends a 2×-coarser octave (upsampled
    bilinear, variance-compensated) over the per-pixel octave:
    0 = fine digital-film grain, 100 = soft coarse grain.

    The amplitude rides a midtone weight √(4y(1−y)) — film grain is
    strongest in the midtones and vanishes at the tonal extremes
    (deep blacks stay clean, highlights don't speckle). Full slider =
    ±0.10 peak-normal luma offset before clamping. Identity at 0 by
    construction (the offset is scaled by the amount); callers gate
    statically (the "grain" extras-mode part) so a grain-free render
    never traces the noise generation."""
    import jax

    amount = jnp.asarray(amount, jnp.float32)
    size = jnp.asarray(size, jnp.float32)
    h, w = r.shape[-2], r.shape[-1]
    key = jax.random.PRNGKey(0x9A417)
    kf, kc = jax.random.split(key)
    fine = jax.random.normal(kf, (h, w), jnp.float32)
    ch, cw = max(h // 2, 1), max(w // 2, 1)
    coarse = jax.image.resize(
        jax.random.normal(kc, (ch, cw), jnp.float32), (h, w), "linear")
    s = jnp.clip(size * _F(0.01), _F(0.0), _F(1.0))
    # The bilinear upsample of the coarse octave loses ~45% of its
    # std; 1.8 restores comparable visual amplitude at size=100.
    noise = fine * (_F(1.0) - s) + coarse * (s * _F(1.8))
    a = jnp.clip(amount * _F(0.01), _F(0.0), _F(1.0))
    y = _LUMA_R * r + _LUMA_G * g + _LUMA_B * b
    wgt = jnp.sqrt(jnp.maximum(
        _F(4.0) * y * (_F(1.0) - y), _F(0.0)))
    d = a * _F(0.10) * noise * wgt
    clip = lambda c: jnp.clip(c + d, _F(0.0), _F(1.0))  # noqa: E731
    return clip(r), clip(g), clip(b)


def apply_grain_words(words, amount, size=0.0):
    """Film grain on packed-RGBA words — the fast lane's standalone
    pass, composed AFTER the banded extras kernel (grain is the last
    stage on every route)."""
    r, g, b = words_to_planes(words)
    return planes_to_words(*apply_grain(r, g, b, amount, size))


def extras_core(r, g, b, sharpen, denoise, curve, vignette, r2,
                up, dn, lf, rt, mixer=None, grading=None,
                stencils=True):
    """The extras math on encoded [0, 1] planes, parameterized over
    ±1-shift closures so the XLA path (edge-pad shifts) and the Pallas
    kernel (roll + edge-fixup shifts, ops/pallas_develop.py) share one
    definition. Tents are separable (row pass then column pass);
    ``curve`` is the 4-tuple of parametric tone-curve sliders
    (:func:`tone_curve`, applied on the denoised luma before the
    unsharp mask so sharpening acts on the final tonality);
    ``vignette`` (±100) scales luma by 1 + (v/100)·0.75·r² — negative
    darkens corners (artistic), positive lifts them (lens-falloff
    correction), center always unchanged — with ``r2`` the
    :func:`radial_sq` plane of the caller's grid; returns (r, g, b)
    clamped to [0, 1].

    ``mixer`` is None (statically off) or the 24-tuple of HSL-mixer
    amounts (ops/mixer.py), and ``grading`` None or the 7-tuple of
    color-grading amounts (ops/grading.py) — both applied POINTWISE
    (mixer first, then grading) before the stencil stages, so they
    join the Pallas band and the XLA chain identically. ``stencils``
    is a STATIC flag: False skips every stencil/curve/vignette stage
    at trace time (the pointwise-only extras modes — an in-chain XLA
    render would otherwise materialize the tent stages for sliders
    known to be zero)."""
    if mixer is not None:
        from raweditor_tpu.ops.mixer import apply_hsl_mixer

        r, g, b = apply_hsl_mixer(r, g, b, mixer)
    if grading is not None:
        from raweditor_tpu.ops.grading import apply_color_grading

        r, g, b = apply_color_grading(r, g, b, grading)
    if not stencils:
        # Pointwise-only: the mixer/grading already clamped to [0, 1].
        return r, g, b
    sharpen = jnp.asarray(sharpen, jnp.float32)
    denoise = jnp.asarray(denoise, jnp.float32)
    vignette = jnp.asarray(vignette, jnp.float32)

    def tent3(x):
        xv = (up(x) + x * _F(2.0)) + dn(x)
        return ((lf(xv) + xv * _F(2.0)) + rt(xv)) * _F(1.0 / 16.0)

    y = _LUMA_R * r + _LUMA_G * g + _LUMA_B * b
    cr = r - y
    cb = b - y

    s = jnp.clip(denoise * _F(0.01), _F(0.0), _F(1.0))
    cr = cr + (tent3(tent3(cr)) - cr) * s
    cb = cb + (tent3(tent3(cb)) - cb) * s

    # Bilateral-lite luma pass: tent spatial × rational range weights.
    sigma = _F(0.02) + _F(0.06) * s
    inv_s2 = _F(1.0) / (sigma * sigma)
    u, d = up(y), dn(y)
    taps = ((lf(u), _F(1.0)), (u, _F(2.0)), (rt(u), _F(1.0)),
            (lf(y), _F(2.0)), (rt(y), _F(2.0)),
            (lf(d), _F(1.0)), (d, _F(2.0)), (rt(d), _F(1.0)))
    num = y * _F(4.0)
    den = jnp.full_like(y, _F(4.0))
    for t, wgt in taps:
        dlt = t - y
        w_ = wgt / (_F(1.0) + dlt * dlt * inv_s2)
        num = num + t * w_
        den = den + w_
    y = y + (num / den - y) * s

    y = tone_curve(y, curve)

    y = y * (_F(1.0) + vignette * _F(0.0075) * r2)

    a = jnp.maximum(sharpen, _F(0.0)) * _F(0.01)
    y = y + (y - tent3(y)) * a

    r = y + cr
    b = y + cb
    g = (y - _LUMA_R * r - _LUMA_B * b) * _F(1.0 / 0.7152)
    clip = lambda c: jnp.clip(c, _F(0.0), _F(1.0))  # noqa: E731
    return clip(r), clip(g), clip(b)


def _is_static_zero(v) -> bool:
    """True when ``v`` is a host-side (non-traced) scalar equal to 0 —
    Python numbers, numpy scalars, and concrete 0-d arrays all
    qualify (code-review r3: the isinstance(int, float) form missed
    numpy zeros)."""
    import jax

    if isinstance(v, jax.core.Tracer):
        return False
    try:
        return float(v) == 0.0
    except (TypeError, ValueError):
        return False


_ZERO_CURVE = (0.0, 0.0, 0.0, 0.0)


def apply_finish_extras(r, g, b, sharpen, denoise, curve=_ZERO_CURVE,
                        vignette=0.0, clarity=0.0, dehaze=0.0,
                        mixer=None, grading=None, grain=None,
                        stencils=True):
    """Sharpen + denoise + parametric tone curve + vignette on
    transfer-encoded [0, 1] RGB planes — the XLA in-chain execution of
    :func:`extras_core`.

    All amounts are traced scalars (slider moves never recompile);
    ``curve`` is (shadows, darks, lights, highlights); the vignette's
    radial plane is this grid's own (zoomed previews therefore
    approximate it over the viewport — exports are full-frame and
    exact); ``mixer``/``grading``/``stencils`` as in
    :func:`extras_core`; ``grain`` is None (statically off) or the
    (amount, size) pair for :func:`apply_grain`. All static in
    structure: dehaze runs first, then clarity, then the mixer, then
    grading, then the stencil stages, then grain LAST — the same
    order as the words-domain composition, so every route agrees.
    Returns (r, g, b) clamped to [0, 1]."""
    if not _is_static_zero(dehaze):
        # Same statically-known-zero skip as clarity below: the veil
        # estimate + pyramid blur never trace for a zero slider.
        r, g, b = apply_dehaze(r, g, b, dehaze)
    if not _is_static_zero(clarity):
        # A statically-known zero (the "clarity off" sentinel from
        # develop._extras_of, or any concrete host-side zero — numpy
        # scalars included) skips the whole-frame pyramid at trace
        # time; a traced scalar always runs it. Without this, every
        # sharpen-only in-chain render paid ~3 full-frame resize
        # passes for a zero slider (code-review r3).
        r, g, b = apply_clarity(r, g, b, clarity)
    up, dn, lf, rt = _pad_shift_fns()
    r2 = radial_sq(r.shape[-2], r.shape[-1])
    r, g, b = extras_core(r, g, b, sharpen, denoise, curve, vignette,
                          r2, up, dn, lf, rt, mixer=mixer,
                          grading=grading, stencils=stencils)
    if grain is not None:
        r, g, b = apply_grain(r, g, b, *grain)
    return r, g, b


def finish_extras_rgba_words(words, sharpen, denoise,
                             curve=_ZERO_CURVE, vignette=0.0,
                             clarity=0.0, dehaze=0.0, mixer=None,
                             grading=None, grain=None, stencils=True):
    """Behavioral reference for the Pallas post-pass: packed-RGBA u32
    (..., H, W) → u32, extras applied on the quantized u8 values
    rescaled to [0, 1], requantized with the finish rounding
    (floor(c·255 + 0.5)). The kernel mirrors this exactly."""
    r, g, b = words_to_planes(words)
    r, g, b = apply_finish_extras(r, g, b, sharpen, denoise, curve,
                                  vignette, clarity, dehaze,
                                  mixer=mixer, grading=grading,
                                  grain=grain, stencils=stencils)
    return planes_to_words(r, g, b)
