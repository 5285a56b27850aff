"""Finish extras: luma sharpening + edge-preserving denoise.

Capability beyond the reference editor, whose develop chain ends at
vibrance + gamma (reference: gpu/shaders.rs:171-267 has no spatial
output filtering). These are the two most-requested develop controls
its 10-slider model lacks; both are small fixed-radius stencils, so on
TPU they fuse into the same HBM-bound develop program as everything
else — enabling them never adds a device round trip.

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


def _shifts3(x):
    """``s(dy, dx)`` → the plane shifted so each output pixel reads its
    (dy, dx) neighbor, clamp-to-edge, for dy/dx in {-1, 0, 1}. One
    edge pad, nine static slices — XLA fuses the lot."""
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pad, mode="edge")

    def s(dy, dx):
        return xp[..., 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    return s


def _tent3(x):
    """3×3 tent ([1,2,1]⊗[1,2,1] / 16) with clamp-to-edge."""
    s = _shifts3(x)
    return (
        (s(-1, -1) + s(-1, 1) + s(1, -1) + s(1, 1))
        + (s(-1, 0) + s(0, -1) + s(0, 1) + s(1, 0)) * _F(2.0)
        + x * _F(4.0)
    ) * _F(1.0 / 16.0)


def _bilateral3(y, sigma):
    """One 3×3 bilateral-lite pass on luma: tent spatial weights × the
    rational range kernel 1/(1 + (Δ/σ)²). σ may be a traced scalar."""
    s = _shifts3(y)
    inv_s2 = _F(1.0) / (sigma * sigma)
    num = y * _F(4.0)
    den = jnp.full_like(y, _F(4.0))
    for dy, dx, wgt in ((-1, -1, 1.0), (-1, 0, 2.0), (-1, 1, 1.0),
                        (0, -1, 2.0), (0, 1, 2.0),
                        (1, -1, 1.0), (1, 0, 2.0), (1, 1, 1.0)):
        n = s(dy, dx)
        d = n - y
        w = _F(wgt) / (_F(1.0) + d * d * inv_s2)
        num = num + n * w
        den = den + w
    return num / den


def apply_finish_extras(r, g, b, sharpen, denoise):
    """Sharpen + denoise on transfer-encoded [0, 1] RGB planes.

    ``sharpen``/``denoise`` are traced scalars (slider moves never
    recompile); returns (r, g, b) clamped to [0, 1]. See the module
    docstring for the pipeline."""
    sharpen = jnp.asarray(sharpen, jnp.float32)
    denoise = jnp.asarray(denoise, jnp.float32)

    y = _LUMA_R * r + _LUMA_G * g + _LUMA_B * b
    cr = r - y
    cb = b - y

    s = jnp.clip(denoise * _F(0.01), _F(0.0), _F(1.0))
    cr = cr + (_tent3(_tent3(cr)) - cr) * s
    cb = cb + (_tent3(_tent3(cb)) - cb) * s

    sigma = _F(0.02) + _F(0.06) * s
    y = y + (_bilateral3(y, sigma) - y) * s

    a = jnp.maximum(sharpen, _F(0.0)) * _F(0.01)
    y = y + (y - _tent3(y)) * a

    r = y + cr
    b = y + cb
    g = (y - _LUMA_R * r - _LUMA_B * b) * _F(1.0 / 0.7152)
    clip = lambda c: jnp.clip(c, _F(0.0), _F(1.0))  # noqa: E731
    return clip(r), clip(g), clip(b)
