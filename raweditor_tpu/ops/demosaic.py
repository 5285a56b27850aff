"""Bayer demosaic kernels.

The reference demosaics per-fragment in WGSL with a nearest-neighbor
stencil over a "GBRG" pattern read through a deliberate y+1 CFA offset
(reference: gpu/shaders.rs:104-158), with clamp-to-edge neighbor loads
(reference: gpu/shaders.rs:161-169). With the offset folded in, the
effective pattern in storage coordinates is:

    row 0 (even y):  R  G2 R  G2 ...   R at even cols
    row 1 (odd  y):  G1 B  G1 B  ...   B at odd cols

Per-pixel stencil (storage coords, all loads clamped to the image):

    y even, x even  (R):  r = v(x,y)    g = v(x+1,y)  b = v(x,y-1)
    y even, x odd   (G2): g = v(x,y)    r = v(x-1,y)  b = v(x,y-1)
    y odd,  x even  (G1): g = v(x,y)    b = v(x+1,y)  r = v(x,y+1)
    y odd,  x odd   (B):  b = v(x,y)    g = v(x-1,y)  r = v(x-1,y+1)

TPU-first design: instead of a scalar per-pixel loop, the stencil is six
clamp-padded shifted views combined with broadcasted parity masks — pure
element-wise VPU work that XLA fuses into the develop chain with no
materialized intermediates. Channels are kept as separate (H, W) planes
throughout: a trailing channel axis of 3 would waste 125/128 TPU lanes.

A Malvar-He-Cutler bilinear upgrade is provided behind ``method=``
for accurate mode.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _shifted(padded, dy: int, dx: int, h: int, w: int, pad: int = 1):
    """View of the ``pad``-px edge-padded mosaic shifted by (dy, dx)."""
    return padded[pad + dy : pad + dy + h, pad + dx : pad + dx + w]


def parity_masks(h: int, w: int, phase=(0, 0)):
    """(H,1) row-parity and (1,W) col-parity boolean masks.

    ``phase`` = (row, col) offsets of the CFA: (0,0) labels the R site
    at (0,0) (RGGB, the reference's effective pattern); other Bayer
    phases (GRBG/GBRG/BGGR) are pure translations expressed by shifting
    the parity labels — the data never moves."""
    py, px = phase
    ye = ((jnp.arange(h, dtype=jnp.int32)[:, None] + py) % 2) == 0
    xe = ((jnp.arange(w, dtype=jnp.int32)[None, :] + px) % 2) == 0
    return ye, xe


# Bayer pattern string → (row, col) parity phase: the R site's position
# mod 2 in the 2×2 repeat.
CFA_PHASES = {"RGGB": (0, 0), "GRBG": (0, 1), "GBRG": (1, 0),
              "BGGR": (1, 1)}


def phase_of(cfa_pattern: str):
    """(row, col) phase for a 2×2 Bayer pattern string; raises for
    non-Bayer CFAs (e.g. X-Trans)."""
    try:
        return CFA_PHASES[cfa_pattern.upper()]
    except KeyError:
        raise ValueError(f"unsupported CFA pattern {cfa_pattern!r}")


def _combine(v, left, right, up, down, downleft, ye, xe):
    """Apply the per-site channel selection table (module docstring)."""
    r = jnp.where(ye, jnp.where(xe, v, left), jnp.where(xe, down, downleft))
    g = jnp.where(ye, jnp.where(xe, right, v), jnp.where(xe, v, left))
    b = jnp.where(ye, up, jnp.where(xe, right, v))
    return r, g, b


def demosaic_nearest(mosaic, phase=(0, 0)):
    """Nearest-neighbor demosaic, bit-matching the reference shader.

    Args:
      mosaic: (H, W) float32 normalized mosaic.
      phase: CFA parity phase (see parity_masks).

    Returns:
      (r, g, b) float32 (H, W) planes.
    """
    h, w = mosaic.shape
    p = jnp.pad(mosaic, ((1, 1), (1, 1)), mode="edge")
    ye, xe = parity_masks(h, w, phase)
    return _combine(
        mosaic,
        _shifted(p, 0, -1, h, w),
        _shifted(p, 0, 1, h, w),
        _shifted(p, -1, 0, h, w),
        _shifted(p, 1, 0, h, w),
        _shifted(p, 1, -1, h, w),
        ye,
        xe,
    )


def demosaic_nearest_vpadded(padded, row_offset, phase=(0, 0)):
    """Nearest demosaic of a row block carrying a 1-row vertical halo.

    For row-sharded (spatial/context-parallel) develop: ``padded`` is
    (h+2, W) — rows [1:h+1] are this shard's block, rows 0 and h+1 the
    halo rows received from the neighbor shards (or clamped copies at
    the global image edges). ``row_offset`` is the block's global
    starting row, needed for CFA parity; it may be a traced scalar.

    Returns (r, g, b) float32 (h, W) planes for the block.
    """
    hp2, w = padded.shape
    h = hp2 - 2
    p = jnp.pad(padded, ((0, 0), (1, 1)), mode="edge")
    rows = jnp.arange(h, dtype=jnp.int32) + row_offset + phase[0]
    ye = (rows[:, None] % 2) == 0
    xe = ((jnp.arange(w, dtype=jnp.int32)[None, :] + phase[1]) % 2) == 0
    return _combine(
        p[1 : 1 + h, 1 : 1 + w],
        p[1 : 1 + h, 0:w],
        p[1 : 1 + h, 2 : 2 + w],
        p[0:h, 1 : 1 + w],
        p[2 : 2 + h, 1 : 1 + w],
        p[2 : 2 + h, 0:w],
        ye,
        xe,
    )


def demosaic_nearest_sampled(mosaic, yi, xi, phase=(0, 0)):
    """Nearest-neighbor demosaic evaluated only at sampled positions.

    This is the preview/histogram path: the reference renders the
    full-res texture into a small target, so each output fragment
    evaluates the demosaic stencil at one nearest-sampled *full-res*
    coordinate (reference: gpu/pipeline.rs:440-465 + shaders.rs:183-192).
    Doing the same — gather the stencil taps at the sampled coordinates,
    then run the small develop — gives exact parity and touches ~5% of
    the data.

    Args:
      mosaic: (H, W) float32 normalized mosaic.
      yi: (Hp,) int32 sampled full-res row indices (already in-bounds).
      xi: (Wp,) int32 sampled full-res col indices (already in-bounds).

    Returns:
      (r, g, b) float32 (Hp, Wp) planes.
    """
    h, w = mosaic.shape
    yc = jnp.clip(yi, 0, h - 1)
    xc = jnp.clip(xi, 0, w - 1)
    y_dn = jnp.clip(yi + 1, 0, h - 1)
    y_up = jnp.clip(yi - 1, 0, h - 1)
    x_rt = jnp.clip(xi + 1, 0, w - 1)
    x_lt = jnp.clip(xi - 1, 0, w - 1)

    # Two-stage take (rows then cols) keeps the gathers regular; the row
    # gather pulls only the needed scanlines out of HBM.
    rows_c = jnp.take(mosaic, yc, axis=0)
    rows_dn = jnp.take(mosaic, y_dn, axis=0)
    rows_up = jnp.take(mosaic, y_up, axis=0)

    v = jnp.take(rows_c, xc, axis=1)
    left = jnp.take(rows_c, x_lt, axis=1)
    right = jnp.take(rows_c, x_rt, axis=1)
    up = jnp.take(rows_up, xc, axis=1)
    down = jnp.take(rows_dn, xc, axis=1)
    downleft = jnp.take(rows_dn, x_lt, axis=1)

    ye = ((yc[:, None] + phase[0]) % 2) == 0
    xe = ((xc[None, :] + phase[1]) % 2) == 0
    return _combine(v, left, right, up, down, downleft, ye, xe)


# ---------------------------------------------------------------------------
# Accurate-mode upgrade: bilinear demosaic. Same RGGB layout as the
# parity stencil (R at even-row/even-col).
# ---------------------------------------------------------------------------


def _conv_taps(padded, taps, h, w, pad: int = 1):
    """Sum of weighted shifted views; taps = {(dy, dx): weight}."""
    acc = None
    for (dy, dx), wgt in taps.items():
        t = _shifted(padded, dy, dx, h, w, pad) * np.float32(wgt)
        acc = t if acc is None else acc + t
    return acc


@functools.lru_cache(maxsize=None)
def _bilinear_taps():
    hmean = {(0, -1): 0.5, (0, 1): 0.5}
    vmean = {(-1, 0): 0.5, (1, 0): 0.5}
    plus = {(0, -1): 0.25, (0, 1): 0.25, (-1, 0): 0.25, (1, 0): 0.25}
    diag = {(-1, -1): 0.25, (-1, 1): 0.25, (1, -1): 0.25, (1, 1): 0.25}
    return hmean, vmean, plus, diag


def demosaic_bilinear(mosaic, phase=(0, 0)):
    """Bilinear demosaic on the RGGB layout (accurate mode).

    Interpolates each missing channel from its nearest same-channel
    neighbors instead of copying one of them. Pure shifted-view algebra;
    fuses like the nearest kernel.
    """
    h, w = mosaic.shape
    p = jnp.pad(mosaic, ((1, 1), (1, 1)), mode="edge")
    hmean, vmean, plus, diag = _bilinear_taps()

    v = mosaic
    hm = _conv_taps(p, hmean, h, w)
    vm = _conv_taps(p, vmean, h, w)
    pm = _conv_taps(p, plus, h, w)
    dm = _conv_taps(p, diag, h, w)

    ye, xe = parity_masks(h, w, phase)

    # R: at R sites v; at G2 (even row, odd col) horizontal mean; at G1
    # (odd row, even col) vertical mean; at B sites diagonal mean.
    r = jnp.where(ye, jnp.where(xe, v, hm), jnp.where(xe, vm, dm))
    # G: at G sites v; at R and B sites (row/col parity equal) the
    # plus-mean of the 4 G neighbors.
    g = jnp.where(ye == xe, pm, v)
    # B: at B sites v; at G1 horizontal mean; at G2 vertical mean; at R diagonal.
    b = jnp.where(ye, jnp.where(xe, dm, vm), jnp.where(xe, hm, v))
    return r, g, b


@functools.lru_cache(maxsize=None)
def _malvar_taps():
    """Malvar–He–Cutler (ICASSP 2004) 5×5 gradient-corrected kernels,
    /8-normalized. Four filters, each applied to the raw mosaic (the
    Bayer neighborhoods put the right colors at fixed offsets):
    G at R/B, R/B at a G whose same-color neighbors are horizontal,
    the 90°-rotated case, and R-at-B / B-at-R (diagonal)."""
    g_cross = {(0, 0): 0.5, (-1, 0): 0.25, (1, 0): 0.25, (0, -1): 0.25,
               (0, 1): 0.25, (-2, 0): -0.125, (2, 0): -0.125,
               (0, -2): -0.125, (0, 2): -0.125}
    rb_row = {(0, 0): 0.625, (0, -1): 0.5, (0, 1): 0.5,
              (0, -2): -0.125, (0, 2): -0.125,
              (-1, -1): -0.125, (-1, 1): -0.125,
              (1, -1): -0.125, (1, 1): -0.125,
              (-2, 0): 0.0625, (2, 0): 0.0625}
    rb_col = {(dx, dy): w for (dy, dx), w in rb_row.items()}
    rb_diag = {(0, 0): 0.75, (-1, -1): 0.25, (-1, 1): 0.25,
               (1, -1): 0.25, (1, 1): 0.25,
               (-2, 0): -0.1875, (2, 0): -0.1875,
               (0, -2): -0.1875, (0, 2): -0.1875}
    return g_cross, rb_row, rb_col, rb_diag


def demosaic_malvar(mosaic, phase=(0, 0)):
    """Malvar–He–Cutler gradient-corrected linear demosaic (accurate
    mode). Quality upgrade over bilinear: the 5×5 kernels add a
    Laplacian correction from the co-sited channel, which sharpens
    edges and suppresses zippering. Same shifted-view algebra as the
    other kernels, so XLA fuses it into the develop chain; ~3× the
    taps of bilinear but still VPU-cheap. Outputs are floored at 0
    (the correction can overshoot on hard edges); exact on constant
    and linear-gradient scenes (all kernels have zero first moments).
    """
    h, w = mosaic.shape
    p = jnp.pad(mosaic, ((2, 2), (2, 2)), mode="edge")
    g_cross, rb_row, rb_col, rb_diag = _malvar_taps()

    v = mosaic
    gc = _conv_taps(p, g_cross, h, w, pad=2)
    kr = _conv_taps(p, rb_row, h, w, pad=2)
    kc = _conv_taps(p, rb_col, h, w, pad=2)
    kd = _conv_taps(p, rb_diag, h, w, pad=2)

    ye, xe = parity_masks(h, w, phase)

    # Same site layout as demosaic_bilinear, with the gradient-corrected
    # filters in place of the plain means.
    r = jnp.where(ye, jnp.where(xe, v, kr), jnp.where(xe, kc, kd))
    g = jnp.where(ye == xe, gc, v)
    b = jnp.where(ye, jnp.where(xe, kd, kc), jnp.where(xe, kr, v))
    zero = jnp.zeros((), mosaic.dtype)
    return (jnp.maximum(r, zero), jnp.maximum(g, zero),
            jnp.maximum(b, zero))


def demosaic(mosaic, method: str = "nearest", phase=(0, 0)):
    if method == "nearest":
        return demosaic_nearest(mosaic, phase)
    if method == "bilinear":
        return demosaic_bilinear(mosaic, phase)
    if method == "malvar":
        return demosaic_malvar(mosaic, phase)
    if method == "grad":
        # The gradient-weighted generic-CFA interpolator works on any
        # repeating pattern, Bayer included (ops/cfa_generic.py).
        from raweditor_tpu.ops.cfa_generic import demosaic_grad_generic

        pattern = {v: k for k, v in CFA_PHASES.items()}[tuple(phase)]
        return demosaic_grad_generic(mosaic, pattern, 2, 2)
    raise ValueError(f"unknown demosaic method: {method!r}")
