"""Generic repeating-CFA nearest-neighbor demosaic (X-Trans et al).

The Bayer stencil in ops/demosaic.py replicates the reference shader
bit-for-bit. This module goes beyond the reference: any repeating CFA
grid (notably Fuji X-Trans 6×6, reachable through DNG containers with
CFARepeatPatternDim 6×6) demosaics by, for every cell of the repeat
pattern and every missing channel, reading the nearest sensor site of
that channel. The offsets are computed at trace time from the pattern;
the kernel itself is a sum of masked shifted views — the same fused
element-wise form as the Bayer path, just with more taps (X-Trans needs
~10 distinct shifts).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

# Canonical X-Trans pattern (Fuji sensors), rows of 6.
XTRANS_PATTERN = (
    "GBGGRG"
    "RGRBGB"
    "GBGGRG"
    "GRGGBG"
    "BGBRGR"
    "GRGGBG"
)

_CHAN = {"R": 0, "G": 1, "B": 2}


@functools.lru_cache(maxsize=16)
def nearest_offsets(pattern: str, ph: int, pw: int):
    """For each pattern cell and channel, the offset (dy, dx) of the
    nearest site of that channel (Euclidean, deterministic tie-break by
    (|dy|+|dx|, dy, dx)). Returns {(py, px, chan): (dy, dx)}."""
    if len(pattern) != ph * pw:
        raise ValueError("pattern length != ph*pw")
    grid = np.array([_CHAN[c] for c in pattern.upper()]).reshape(ph, pw)
    # Candidate offsets ordered by distance.
    radius = max(ph, pw)
    cands = sorted(
        ((dy, dx) for dy in range(-radius, radius + 1)
         for dx in range(-radius, radius + 1)),
        key=lambda o: (o[0] ** 2 + o[1] ** 2, abs(o[0]) + abs(o[1]),
                       o[0], o[1]),
    )
    table: Dict[Tuple[int, int, int], Tuple[int, int]] = {}
    for py in range(ph):
        for px in range(pw):
            for chan in range(3):
                for dy, dx in cands:
                    if grid[(py + dy) % ph, (px + dx) % pw] == chan:
                        table[(py, px, chan)] = (dy, dx)
                        break
                else:
                    raise ValueError(
                        f"channel {chan} absent from pattern"
                    )
    return table


def demosaic_nearest_generic(mosaic, pattern: str, ph: int, pw: int):
    """Nearest-site demosaic for a (ph, pw)-repeating CFA.

    mosaic: (H, W) float32; returns (r, g, b) planes. Edge handling is
    clamp-to-edge, consistent with the Bayer path.
    """
    h, w = mosaic.shape
    table = nearest_offsets(pattern, ph, pw)
    max_off = max(max(abs(dy), abs(dx)) for dy, dx in table.values())
    p = jnp.pad(mosaic, ((max_off, max_off), (max_off, max_off)),
                mode="edge")

    def shifted(dy, dx):
        return p[max_off + dy : max_off + dy + h,
                 max_off + dx : max_off + dx + w]

    rows = jnp.arange(h, dtype=jnp.int32)[:, None] % ph
    cols = jnp.arange(w, dtype=jnp.int32)[None, :] % pw

    planes = []
    for chan in range(3):
        # Group pattern cells by their offset so each distinct shift is
        # materialized once.
        by_offset: Dict[Tuple[int, int], list] = {}
        for py in range(ph):
            for px in range(pw):
                by_offset.setdefault(table[(py, px, chan)], []).append(
                    (py, px)
                )
        acc = jnp.zeros((h, w), mosaic.dtype)
        for (dy, dx), cells in by_offset.items():
            mask = jnp.zeros((h, w), bool)
            for py, px in cells:
                mask = mask | ((rows == py) & (cols == px))
            acc = jnp.where(mask, shifted(dy, dx), acc)
        planes.append(acc)
    return tuple(planes)


def demosaic_nearest_generic_sampled(mosaic, yi, xi, pattern: str,
                                     ph: int, pw: int):
    """Generic-CFA demosaic evaluated only at sampled full-res positions
    (the preview/histogram path): gather each needed tap at the sampled
    coordinates, then select per pattern cell — touches ~taps/decimation²
    of the data instead of developing the full frame."""
    h, w = mosaic.shape
    table = nearest_offsets(pattern, ph, pw)
    yc = jnp.clip(yi, 0, h - 1)
    xc = jnp.clip(xi, 0, w - 1)

    offsets = sorted(set(table.values()))
    gathered = {}
    row_cache = {}
    for dy, dx in offsets:
        if dy not in row_cache:
            row_cache[dy] = jnp.take(
                mosaic, jnp.clip(yc + dy, 0, h - 1), axis=0
            )
        gathered[(dy, dx)] = jnp.take(
            row_cache[dy], jnp.clip(xc + dx, 0, w - 1), axis=1
        )

    cy = (yc % ph)[:, None]
    cx = (xc % pw)[None, :]
    planes = []
    for chan in range(3):
        by_offset = {}
        for py in range(ph):
            for px in range(pw):
                by_offset.setdefault(table[(py, px, chan)], []).append(
                    (py, px)
                )
        acc = jnp.zeros((yc.shape[0], xc.shape[0]), mosaic.dtype)
        for off, cells in by_offset.items():
            mask = jnp.zeros((yc.shape[0], xc.shape[0]), bool)
            for py, px in cells:
                mask = mask | ((cy == py) & (cx == px))
            acc = jnp.where(mask, gathered[off], acc)
        planes.append(acc)
    return tuple(planes)


def demosaic_xtrans(mosaic, pattern: str = XTRANS_PATTERN):
    """Fuji X-Trans 6×6 nearest demosaic."""
    return demosaic_nearest_generic(mosaic, pattern, 6, 6)


def is_xtrans(cfa_pattern: str) -> bool:
    return len(cfa_pattern) == 36


def generic_cfa_method(method: str) -> str:
    """Map a Bayer demosaic choice onto the generic-CFA tier: nearest
    and the generic methods pass through; Bayer quality requests
    (bilinear/malvar) upgrade to the isotropic 'smooth' interpolator."""
    return method if method in ("nearest", "smooth", "grad") else "smooth"


# ---------------------------------------------------------------------------
# Normalized-convolution ("smooth") generic demosaic — quality upgrade
# over nearest for non-Bayer CFAs (X-Trans accurate mode). Each missing
# channel is the tent-weighted mean of the same-channel sites in a
# window, computed as conv(value·mask)/conv(mask). On a Bayer RGGB grid
# with the radius-1 tent this reduces exactly to demosaic_bilinear
# (pinned by test), which anchors the implementation.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _tent_kernel(radius: int) -> np.ndarray:
    t = np.minimum(np.arange(2 * radius + 1) + 1,
                   np.arange(2 * radius, -1, -1) + 1).astype(np.float32)
    return np.outer(t, t)


@functools.lru_cache(maxsize=32)
def _smooth_radius(pattern: str, ph: int, pw: int, chan: int) -> int:
    """Smallest tent radius whose periodic window always contains at
    least one site of ``chan`` (so the denominator never vanishes)."""
    grid = np.array([_CHAN[c] for c in pattern.upper()]).reshape(ph, pw)
    for radius in (1, 2, 3, max(ph, pw)):
        ok = all(
            any(grid[(py + dy) % ph, (px + dx) % pw] == chan
                for dy in range(-radius, radius + 1)
                for dx in range(-radius, radius + 1))
            for py in range(ph) for px in range(pw)
        )
        if ok:
            return radius
    raise ValueError(f"channel {chan} absent from pattern")


@functools.lru_cache(maxsize=32)
def _dir_radius(pattern: str, ph: int, pw: int, chan: int,
                axis: int) -> int:
    """Smallest 1-D tent radius along ``axis`` (0 = vertical) whose
    window always contains a site of ``chan``, or 0 if no radius up to
    the pattern period works (channel too sparse along that axis)."""
    grid = np.array([_CHAN[c] for c in pattern.upper()]).reshape(ph, pw)
    period = ph if axis == 0 else pw
    for radius in range(1, period + 1):
        ok = all(
            any(grid[(py + (d if axis == 0 else 0)) % ph,
                     (px + (d if axis == 1 else 0)) % pw] == chan
                for d in range(-radius, radius + 1))
            for py in range(ph) for px in range(pw)
        )
        if ok:
            return radius
    return 0


def _nc_1d(mosaic, mask_fn, h, w, radius: int, axis: int):
    """1-D normalized tent convolution of (value·mask)/(mask) along
    ``axis``; mask extends periodically past the frame, values
    edge-clamp."""
    import jax

    t = np.minimum(np.arange(2 * radius + 1) + 1,
                   np.arange(2 * radius, -1, -1) + 1).astype(np.float32)
    k = t[None, :] if axis == 1 else t[:, None]
    pad = ((0, 0), (radius, radius)) if axis == 1 else \
        ((radius, radius), (0, 0))

    def conv_valid(x):
        return jax.lax.conv_general_dilated(
            x[None, None], jnp.asarray(k)[None, None],
            window_strides=(1, 1), padding="VALID",
        )[0, 0]

    mask_p = mask_fn(pad)
    pad_v = jnp.pad(mosaic, pad, mode="edge") * mask_p
    return conv_valid(pad_v) / conv_valid(mask_p)


def demosaic_grad_generic(mosaic, pattern: str, ph: int, pw: int):
    """Gradient-weighted demosaic for a (ph, pw)-repeating CFA — the
    quality tier above "smooth" (beyond the reference, which only does
    nearest Bayer):

    1. The dense channel (G) interpolates directionally: separate 1-D
       normalized convolutions along rows and columns, blended by
       inverse directional gradients of the raw mosaic — edges keep
       their sharp axis instead of being averaged across.
    2. R/B interpolate in color-difference space (R−G, B−G) with the
       2-D tent normalized convolution, then add G back — the classic
       chroma-smoothness prior that kills zippering.
    3. Two chroma-refinement iterations: smooth the color differences
       with a normalized 3×3 tent and rebuild each channel from its
       own sensor sites plus the smoothed chroma — the
       Markesteijn-style cleanup pass (+3.4 dB over the unrefined
       reconstruction on the edge-rich ladder scene).

    A constant mosaic reconstructs to three equal constant planes
    (pinned by test), and on smooth scenes the result strictly beats
    "smooth" in PSNR (also pinned).
    """
    h, w = mosaic.shape
    grid_np = np.array(
        [_CHAN[c] for c in pattern.upper()]).reshape(ph, pw)
    grid = jnp.asarray(grid_np)

    def chan_mask(chan, pad):
        ys = (jnp.arange(-pad[0][0], h + pad[0][1], dtype=jnp.int32)) % ph
        xs = (jnp.arange(-pad[1][0], w + pad[1][1], dtype=jnp.int32)) % pw
        return (grid[ys[:, None], xs[None, :]] == chan).astype(
            mosaic.dtype)

    # --- G: directional interpolation, gradient-blended -------------
    g_chan = _CHAN["G"]
    rh = _dir_radius(pattern, ph, pw, g_chan, axis=1)
    rv = _dir_radius(pattern, ph, pw, g_chan, axis=0)
    if rh == 0 or rv == 0:
        # Channel too sparse for 1-D windows (exotic pattern): fall
        # back to the isotropic interpolator wholesale.
        return demosaic_smooth_generic(mosaic, pattern, ph, pw)
    gh = _nc_1d(mosaic, lambda pad: chan_mask(g_chan, pad), h, w, rh, 1)
    gv = _nc_1d(mosaic, lambda pad: chan_mask(g_chan, pad), h, w, rv, 0)
    pe = jnp.pad(mosaic, 1, mode="edge")
    dh = jnp.abs(pe[1:-1, 2:] - pe[1:-1, :-2])
    dv = jnp.abs(pe[2:, 1:-1] - pe[:-2, 1:-1])
    eps = jnp.asarray(1e-4, mosaic.dtype)
    wh = 1.0 / (dh + eps)
    wv = 1.0 / (dv + eps)
    g = (wh * gh + wv * gv) / (wh + wv)
    at_g = chan_mask(g_chan, ((0, 0), (0, 0))) > 0
    g = jnp.where(at_g, mosaic, g)

    # --- R/B: color-difference interpolation -------------------------
    import jax

    planes = [None, g, None]
    for name in ("R", "B"):
        chan = _CHAN[name]
        r2 = _smooth_radius(pattern, ph, pw, chan)
        k = _tent_kernel(r2)
        pad = ((r2, r2), (r2, r2))
        mask_p = chan_mask(chan, pad)
        diff = jnp.pad(mosaic - g, r2, mode="edge") * mask_p

        def conv_valid(x):
            return jax.lax.conv_general_dilated(
                x[None, None], jnp.asarray(k)[None, None],
                window_strides=(1, 1), padding="VALID",
            )[0, 0]

        interp = g + conv_valid(diff) / conv_valid(mask_p)
        at_site = mask_p[r2: r2 + h, r2: r2 + w] > 0
        planes[chan] = jnp.where(at_site, mosaic, interp)

    # --- chroma refinement (2 iterations) -----------------------------
    rpl, gpl, bpl = planes
    k3 = _tent_kernel(1)
    k3 = (k3 / k3.sum()).astype(np.float32)
    at = [chan_mask(c, ((0, 0), (0, 0))) > 0 for c in range(3)]

    def conv_same(x):
        xp = jnp.pad(x, 1, mode="edge")
        return jax.lax.conv_general_dilated(
            xp[None, None], jnp.asarray(k3)[None, None],
            window_strides=(1, 1), padding="VALID",
        )[0, 0]

    for _ in range(2):
        cb = conv_same(rpl - gpl)
        cr = conv_same(bpl - gpl)
        gpl = jnp.where(at[1], mosaic,
                        jnp.where(at[0], mosaic - cb, mosaic - cr))
        rpl = jnp.where(at[0], mosaic, gpl + cb)
        bpl = jnp.where(at[2], mosaic, gpl + cr)
    return rpl, gpl, bpl


def demosaic_smooth_generic(mosaic, pattern: str, ph: int, pw: int):
    """Normalized-convolution demosaic for a (ph, pw)-repeating CFA.

    At sensor sites the raw value passes through; elsewhere each channel
    is conv(value·mask)/conv(mask) with a tent kernel sized per channel
    (radius 1 suffices for dense channels like X-Trans G, radius 2 for
    the sparse R/B). Values are edge-clamped; the mask extends
    periodically past the frame, so the denominator is positive
    everywhere by construction.
    """
    import jax

    h, w = mosaic.shape
    grid = jnp.asarray(
        np.array([_CHAN[c] for c in pattern.upper()]).reshape(ph, pw)
    )

    def conv_valid(x, k):
        return jax.lax.conv_general_dilated(
            x[None, None], jnp.asarray(k)[None, None],
            window_strides=(1, 1), padding="VALID",
        )[0, 0]

    planes = []
    for chan in range(3):
        r = _smooth_radius(pattern, ph, pw, chan)
        k = _tent_kernel(r)
        ys = (jnp.arange(-r, h + r, dtype=jnp.int32)) % ph
        xs = (jnp.arange(-r, w + r, dtype=jnp.int32)) % pw
        mask_p = (grid[ys[:, None], xs[None, :]] == chan).astype(
            mosaic.dtype
        )
        pad_v = jnp.pad(mosaic, r, mode="edge") * mask_p
        sm = conv_valid(pad_v, k) / conv_valid(mask_p, k)
        at_site = mask_p[r : r + h, r : r + w] > 0
        planes.append(jnp.where(at_site, mosaic, sm))
    return tuple(planes)
