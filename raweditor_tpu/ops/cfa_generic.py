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
def channel_grid(pattern: str = XTRANS_PATTERN, ph: int = 6,
                 pw: int = 6):
    """(ph, pw) int32 ndarray of channel ids (0=R, 1=G, 2=B) for a
    repeating pattern string — the one definition shared by the WB
    eyedropper, highlight reconstruction, and the quality scoreboard
    (each previously rebuilt it; code-review r4)."""
    import numpy as np

    if len(pattern) != ph * pw:
        raise ValueError(
            f"pattern length {len(pattern)} != {ph}x{pw}")
    return np.array([[_CHAN[pattern[r * pw + c]] for c in range(pw)]
                     for r in range(ph)], dtype=np.int32)


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


@functools.lru_cache(maxsize=32)
def _smooth_radius(pattern: str, ph: int, pw: int, chan: int) -> int:
    """Smallest tent radius whose periodic window always contains at
    least one site of ``chan`` (so the denominator never vanishes)."""
    grid = np.array([_CHAN[c] for c in pattern.upper()]).reshape(ph, pw)
    # Every radius up to the period: skipping 4..period-1 handed
    # period->=5 patterns an oversized, blurrier tent (code-review r3).
    for radius in range(1, max(ph, pw) + 1):
        ok = all(
            any(grid[(py + dy) % ph, (px + dx) % pw] == chan
                for dy in range(-radius, radius + 1)
                for dx in range(-radius, radius + 1))
            for py in range(ph) for px in range(pw)
        )
        if ok:
            return radius
    raise ValueError(f"channel {chan} absent from pattern")




def _periodic_mask(grid_np: np.ndarray, chan: int, h: int, w: int,
                   pad, dtype):
    """The channel-site mask over (h+pad) x (w+pad). Built through
    the iota-select tiler (_tile_periodic) — the gather form
    (grid[ys % ph, xs % pw]) serializes at 24 MP, and jnp.tile
    relayouts; both measured far slower."""
    base = (grid_np == chan).astype(np.float32)
    hh = h + pad[0][0] + pad[0][1]
    ww = w + pad[1][0] + pad[1][1]
    return _tile_periodic(base, hh, ww, -pad[0][0], -pad[1][0], dtype)


def _tent_weights(radius: int) -> np.ndarray:
    return np.minimum(np.arange(2 * radius + 1) + 1,
                      np.arange(2 * radius, -1, -1) + 1).astype(np.float32)



def _tile_periodic(core: np.ndarray, h: int, w: int, off_y: int,
                   off_x: int, dtype):
    """Materialize a (ph, pw)-periodic array so output[0, 0] reads
    core[off_y % ph, off_x % pw], via iota-compare selects grouped by
    distinct value — pure elementwise. (jnp.tile's interleaved
    reshape relayouts: measured 10.8 ms vs 2.1 ms per 24 MP use.)"""
    import jax

    ph, pw = core.shape
    rolled = np.roll(np.roll(core, -(off_y % ph), 0), -(off_x % pw), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) % ph
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % pw
    values = np.unique(rolled)
    acc = jnp.full((h, w), np.asarray(values[0], dtype=dtype))
    for v in values[1:]:
        mask = None
        for py in range(ph):
            for px in range(pw):
                if rolled[py, px] == v:
                    term = (rows == py) & (cols == px)
                    mask = term if mask is None else mask | term
        acc = jnp.where(mask, np.asarray(v, dtype=dtype), acc)
    return acc


def _periodic_den_1d(grid_np, chan, radius, axis):
    """(ph, pw) core of the VALID 1-D tent conv over the periodic
    channel mask: den[i] = f((i - pad) % period). Computed in f32 with
    the same shifted-add order as _tent_valid_axis, so tiling it is
    bit-identical to convolving the tiled mask."""
    t = _tent_weights(radius)
    base = (grid_np == chan).astype(np.float32)
    core = None
    for k in range(2 * radius + 1):
        term = np.float32(t[k]) * np.roll(base, -k, axis)
        core = term if core is None else core + term
    return core


def _periodic_den_2d(grid_np, chan, radius):
    core = _periodic_den_1d(grid_np, chan, radius, 0)
    out = None
    t = _tent_weights(radius)
    for k in range(2 * radius + 1):
        term = np.float32(t[k]) * np.roll(core, -k, 1)
        out = term if out is None else out + term
    return out


def _tent_valid_axis(xp, radius: int, axis: int):
    """VALID 1-D tent convolution along ``axis`` as a shifted-add —
    XLA fuses this into elementwise work, where a 1-channel
    lax.conv on a 24 MP plane lowers catastrophically on TPU
    (measured 0.6 img/s vs 178 for the stencil paths)."""
    t = _tent_weights(radius)
    n_out = xp.shape[axis] - 2 * radius
    acc = None
    for k in range(2 * radius + 1):
        idx = [slice(None)] * xp.ndim
        idx[axis] = slice(k, k + n_out)
        term = np.float32(t[k]) * xp[tuple(idx)]
        acc = term if acc is None else acc + term
    return acc


def _tent_valid(xp, radius: int):
    """VALID 2-D tent convolution (separable: outer(t, t))."""
    return _tent_valid_axis(_tent_valid_axis(xp, radius, 0), radius, 1)


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
    edge-clamp. Shifted-add form (see _tent_valid_axis)."""
    pad = ((0, 0), (radius, radius)) if axis == 1 else \
        ((radius, radius), (0, 0))
    grid_np, chan = mask_fn
    ph, pw = grid_np.shape
    mask_p = _periodic_mask(grid_np, chan, h, w, pad, mosaic.dtype)
    pad_v = jnp.pad(mosaic, pad, mode="edge") * mask_p
    den_core = _periodic_den_1d(grid_np, chan, radius, 0 if axis == 0
                                else 1)
    den = _tile_periodic(den_core, h, w,
                         -pad[0][0], -pad[1][0], mosaic.dtype)
    return _tent_valid_axis(pad_v, radius, axis) / den


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

    def chan_mask(chan, pad):
        return _periodic_mask(grid_np, chan, h, w, pad, mosaic.dtype)

    # --- G: directional interpolation, gradient-blended -------------
    g_chan = _CHAN["G"]
    rh = _dir_radius(pattern, ph, pw, g_chan, axis=1)
    rv = _dir_radius(pattern, ph, pw, g_chan, axis=0)
    if rh == 0 or rv == 0:
        # Channel too sparse for 1-D windows (exotic pattern): fall
        # back to the isotropic interpolator wholesale.
        return demosaic_smooth_generic(mosaic, pattern, ph, pw)
    gh = _nc_1d(mosaic, (grid_np, g_chan), h, w, rh, 1)
    gv = _nc_1d(mosaic, (grid_np, g_chan), h, w, rv, 0)
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
    planes = [None, g, None]
    for name in ("R", "B"):
        chan = _CHAN[name]
        r2 = _smooth_radius(pattern, ph, pw, chan)
        pad = ((r2, r2), (r2, r2))
        mask_p = chan_mask(chan, pad)
        diff = jnp.pad(mosaic - g, r2, mode="edge") * mask_p
        den = _tile_periodic(_periodic_den_2d(grid_np, chan, r2),
                             h, w, -r2, -r2, mosaic.dtype)
        interp = g + _tent_valid(diff, r2) / den
        at_site = mask_p[r2: r2 + h, r2: r2 + w] > 0
        planes[chan] = jnp.where(at_site, mosaic, interp)

    # --- chroma refinement (2 iterations) -----------------------------
    rpl, gpl, bpl = planes
    at = [chan_mask(c, ((0, 0), (0, 0))) > 0 for c in range(3)]

    def conv_same(x):  # normalized 3x3 tent (sum 16), separable
        return _tent_valid(jnp.pad(x, 1, mode="edge"), 1) * np.float32(
            1.0 / 16.0)

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
    h, w = mosaic.shape
    grid_np = np.array(
        [_CHAN[c] for c in pattern.upper()]).reshape(ph, pw)

    planes = []
    for chan in range(3):
        r = _smooth_radius(pattern, ph, pw, chan)
        mask_p = _periodic_mask(grid_np, chan, h, w,
                                ((r, r), (r, r)), mosaic.dtype)
        pad_v = jnp.pad(mosaic, r, mode="edge") * mask_p
        den = _tile_periodic(_periodic_den_2d(grid_np, chan, r),
                             h, w, -r, -r, mosaic.dtype)
        sm = _tent_valid(pad_v, r) / den
        at_site = mask_p[r : r + h, r : r + w] > 0
        planes.append(jnp.where(at_site, mosaic, sm))
    return tuple(planes)
