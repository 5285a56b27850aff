"""Hand-fused Pallas TPU kernel for the full develop pipeline.

One kernel does what the reference's whole fragment shader does
(reference: gpu/shaders.rs:104-267): demosaic + 10-slider edit stack +
gamma + RGBA8 pack — reading the u16 mosaic from HBM once and writing
the packed u32 RGBA output once. Differences from the XLA path
(ops/develop.py):

- The edit stack's linear algebra is constant-folded on the host side
  of the trace (`_fold_scalars`): white balance, temp/tint gains and
  exposure fold into the 3×3 matrix; contrast+levels fold into one
  affine (A, B); black-level normalization folds into a single
  multiply plus a constant vector through the matrix. ~40% fewer VPU
  ops per pixel. Folding reassociates float math, so outputs may differ
  from the reference shader by ±1 LSB of 8-bit sRGB (within the
  BASELINE parity budget; the bit-exact path remains the default).
- Row blocks are DMA'd HBM→VMEM straight from the unpadded mosaic:
  each block fetches a (block_h+16)-row window whose
  8-row-tile-aligned start is clamped into the image, a dynamic sublane roll realigns it, and the first /
  last image rows get clamp-to-edge fixup selects — no prologue pad
  pass (a full extra HBM read+write at 24 MP, ~10% of the kernel).
  X-neighbors come from lane rolls with edge-column fixups,
  replicating clamp-to-edge (reference: gpu/shaders.rs:161-169).

Use ``pallas_develop_rgba`` as a drop-in for ``develop_rgba`` where
±1 LSB is acceptable (batch export fast mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raweditor_tpu.params import EditParams

_F = np.float32
_LUMA = (_F(0.2126), _F(0.7152), _F(0.0722))
N_SCALARS = 24

# Fast-gamma polynomials (see color.GAMMA22_POLY / color.SRGB_POLY —
# single source of truth shared with the XLA fast transfers). The
# kernel uses them pre-scaled by 255 with the +0.5 rounding bias folded
# into the constant term: the quantizer's `*255 + 0.5` then costs
# nothing (the clamp happens at 255.5 in the scaled domain instead).
from raweditor_tpu.color import GAMMA22_POLY as _GAMMA_POLY
from raweditor_tpu.color import SRGB_POLY as _SRGB_POLY

_GAMMA_POLY255 = tuple(float(c) * 255.0 for c in _GAMMA_POLY[:-1]) + (
    float(_GAMMA_POLY[-1]) * 255.0 + 0.5,)
_SRGB_POLY255 = tuple(float(c) * 255.0 for c in _SRGB_POLY[:-1]) + (
    float(_SRGB_POLY[-1]) * 255.0 + 0.5,)


def _largest_even_divisor(h: int, cap: int = 128) -> int:
    """Largest block height that divides h, is a multiple of 8 (VMEM
    row-tiling), is ≤ cap, and leaves room for the (block_h+16)-row
    halo window inside the image (h ≥ d+16 — the pad-free kernel
    clamps its tile-aligned DMA windows into the unpadded mosaic). 0
    when none exists (caller falls back to the height-pad rescue)."""
    best = 0
    for d in range(8, min(cap, h - 16) + 1, 8):
        if h % d == 0:
            best = d
    return best


def _grad_block_height(h: int, bh: int, cap: int = 128) -> int:
    """Block height adjustment for demosaic='grad'. Grad computes its
    stages over the whole (bh+8)-row band, so tiny block heights (all
    that heights like 4016 = 16·251 admit) cost ~(bh+8)/bh in stage
    compute. Returns 0 — forcing the callers' 128-row height-pad
    rescue — when edge-padding is cheaper overall: extra rows times
    the padded block's overhead vs the natural block's
    (cross-multiplied comparison; XLA fuses the pad into the same
    program, measured 3.00 vs 3.12 ms total at 24 MP)."""
    if not bh or h % 128 == 0:
        return bh
    hp = -(-h // 128) * 128
    bhp = _largest_even_divisor(hp, cap)
    if bhp and hp * (bhp + 8) * bh < h * (bh + 8) * bhp:
        return 0
    return bh


def _roll_friendly_divisor(h: int, cap: int, side: int,
                           band_pad: int = 8) -> int:
    """Largest valid block height whose stage-array row count
    (bh + band_pad — the bh+8 band for grad, bh itself for smooth) is
    a multiple of the CFA period ``side`` — the precondition for the
    generic kernels' roll-based mask fast path. 0 when none."""
    top = min(cap, h - 16)
    for d in range(top - top % 8, 7, -8):
        if h % d == 0 and (d + band_pad) % side == 0:
            return d
    return 0


def _block_and_wmult(h: int, block_h, pattern, demosaic):
    """Shared launcher policy for (block height, width-pad multiple).

    Block height: the generic-CFA grad kernel's live set (stage arrays
    + parity indicators + per-tap masks) spills VMEM registers at
    production widths — bh=128 needs ~163 MB against the 128 MB
    budget, while bh=64 fits and measured fastest (8.0 ms vs 9.6 at
    bh=32 @24 MP). For pattern-grad, prefer a band that is a multiple
    of the CFA period: the kernel's mask fast path (rolls instead of
    indicator selects) needs it, and it outweighs a slightly larger
    natural block. (Smooth deliberately does NOT take this path:
    common heights like 4016 admit no qualifying divisor, and paying
    the width pad without the rolls measured slower — 6.73 vs
    6.05 ms; smooth routes to XLA anyway.)

    Width: pattern-grad pads to lcm(128, side) so wrapped columns keep
    their CFA parity — but ONLY when the chosen block actually
    satisfies the kernel's roll precondition ((bh+8) % side == 0);
    padding without the rolls is a pure loss (same 6.73-vs-6.05
    measurement), e.g. with an explicit block_h that doesn't qualify.
    """
    bh_cap = 64 if (pattern is not None and demosaic == "grad") else 128
    bh = block_h or _largest_even_divisor(h, bh_cap)
    if block_h is None and pattern is not None and demosaic == "grad":
        side = int(len(pattern) ** 0.5)
        bh = _roll_friendly_divisor(h, bh_cap, side) or bh
    if block_h is None and demosaic == "grad":
        bh = _grad_block_height(h, bh, bh_cap)
    wmult = 128
    if pattern is not None and demosaic == "grad" and bh:
        import math

        side = int(len(pattern) ** 0.5)
        if (bh + 8) % side == 0:
            wmult = 128 * side // math.gcd(128, side)
    return bh, wmult


def _fold_scalars(params: EditParams, wb, cam_matrix, white_level,
                  black_level, matrix_transpose: bool):
    """Pack the whole edit stack into (24,) f32 of folded constants."""
    p = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    wb = jnp.asarray(wb, jnp.float32)
    m = jnp.asarray(cam_matrix, jnp.float32)
    if matrix_transpose:
        m = m.T
    # Channel gains: WB then temp/tint (reference: gpu/shaders.rs:195-205).
    g = wb * jnp.stack([
        1.0 + p.temperature * 0.3,
        1.0 + p.tint * 0.3,
        1.0 - p.temperature * 0.3,
    ])
    # Fold gains into matrix columns, exposure into the whole matrix.
    m = m * g[None, :] * jnp.exp2(p.exposure)
    # Normalization x*s + b (black level folded).
    s = 1.0 / (jnp.asarray(white_level, jnp.float32) - black_level)
    b = -jnp.asarray(black_level, jnp.float32) * s
    # The +b offset rides through demosaic (pure selection) and the
    # matrix (linear): out = m@(s*x) + m@[b,b,b].
    c0 = m @ jnp.full((3,), b, jnp.float32)
    # Contrast about 0.5 then levels → one affine per channel
    # (reference: gpu/shaders.rs:233-239).
    cf = 1.0 + p.contrast / 100.0
    inv = 1.0 / (p.whites - p.blacks + 1e-4)
    A = cf * inv
    B = ((0.5 - 0.5 * cf) - p.blacks) * inv
    vec = jnp.concatenate([
        m.reshape(-1),                      # 0..8
        c0,                                 # 9..11
        jnp.stack([
            s,                              # 12 norm scale
            A, B,                           # 13,14 contrast+levels affine
            p.highlights, p.shadows,        # 15,16
            1.0 + p.saturation / 100.0,     # 17
            p.vibrance,                     # 18
            -b,                             # 19 black*s (demosaic floor)
            1.0 + p.shadows,                # 20 shadows tone affine
        ]),
        jnp.zeros((N_SCALARS - 21,), jnp.float32),
    ])
    return vec


def _shift_x(arr, direction: int, edge_col, dist: int = 1):
    """Clamp-to-edge neighbor along lanes. direction=+1 → value of the
    left neighbor (x-dist); -1 → right neighbor (x+dist). The edge
    column replicates, matching a ``mode="edge"`` pad of width dist."""
    w = arr.shape[-1]
    shift = dist if direction > 0 else w - dist  # roll is mod-w
    rolled = pltpu.roll(arr, shift, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    if direction == 1:
        return jnp.where(col < dist, edge_col, rolled)
    return jnp.where(col >= w - dist, edge_col, rolled)


def _demosaic_smooth_taps(tap_row, grows, img_h, center, up, down, left,
                          right, sc, i, bh, w, cfa_phase, method: str):
    """In-kernel bilinear / Malvar–He–Cutler demosaic. The arithmetic
    is ops/demosaic.py's tap tables hand-factored over the sums the
    four kernels share (hsum/vsum/±2 pairs/diag4) — ~45% fewer VPU ops
    than evaluating each kernel's taps independently; the tap-table
    equivalence is asserted below at trace time so the tables remain
    the single source of truth. Reassociation shifts results by ≤1 ULP
    pre-quantization — inside the ±1 LSB accurate-mode contract
    (tests/test_pallas_develop.py::TestAccurateMode). Clamp-to-edge
    comes from the global-row fixup selects on the y-taps
    (``up``/``down`` arrive fixed; the ±2 taps are fixed here) and the
    replicated edge columns in _shift_x."""
    from raweditor_tpu.ops.demosaic import _bilinear_taps, _malvar_taps

    ul = _shift_x(up, 1, up[:, 0:1])
    ur = _shift_x(up, -1, up[:, w - 1 : w])
    dl = _shift_x(down, 1, down[:, 0:1])
    dr = _shift_x(down, -1, down[:, w - 1 : w])
    hsum = left + right
    vsum = up + down
    diag4 = (ul + ur) + (dl + dr)

    row0 = i * bh + cfa_phase[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1) + cfa_phase[1]
    ye = (rows % 2) == 0
    xe = (cols % 2) == 0
    v = center

    if method == "bilinear":
        hmean, vmean, plus, diag = _bilinear_taps()
        assert (hmean == {(0, -1): 0.5, (0, 1): 0.5}
                and vmean == {(-1, 0): 0.5, (1, 0): 0.5}
                and set(plus.values()) == {0.25}
                and set(diag.values()) == {0.25})
        hm = hsum * _F(0.5)
        vm = vsum * _F(0.5)
        pm = (hsum + vsum) * _F(0.25)
        dm = diag4 * _F(0.25)
        r = jnp.where(ye, jnp.where(xe, v, hm), jnp.where(xe, vm, dm))
        g = jnp.where(ye == xe, pm, v)
        b = jnp.where(ye, jnp.where(xe, dm, vm), jnp.where(xe, hm, v))
        return r, g, b

    # Clamp-to-edge for the ±2 rows: row 1's up-2 is row 0 (= its
    # up), row 0's up-2 is itself (= its fixed up); mirrored below.
    up2 = jnp.where(grows <= 1, up, tap_row(-2))
    down2 = jnp.where(grows >= img_h - 2, down, tap_row(2))
    left2 = _shift_x(center, 1, center[:, 0:1], dist=2)
    right2 = _shift_x(center, -1, center[:, w - 1 : w], dist=2)
    h2 = left2 + right2   # (0,∓2) pair
    v2 = up2 + down2      # (∓2,0) pair

    g_cross, rb_row, rb_col, rb_diag = _malvar_taps()
    assert g_cross == {(0, 0): 0.5, (-1, 0): 0.25, (1, 0): 0.25,
                       (0, -1): 0.25, (0, 1): 0.25, (-2, 0): -0.125,
                       (2, 0): -0.125, (0, -2): -0.125, (0, 2): -0.125}
    assert rb_row == {(0, 0): 0.625, (0, -1): 0.5, (0, 1): 0.5,
                      (0, -2): -0.125, (0, 2): -0.125,
                      (-1, -1): -0.125, (-1, 1): -0.125,
                      (1, -1): -0.125, (1, 1): -0.125,
                      (-2, 0): 0.0625, (2, 0): 0.0625}
    assert rb_col == {(dx, dy): wgt for (dy, dx), wgt in rb_row.items()}
    assert rb_diag == {(0, 0): 0.75, (-1, -1): 0.25, (-1, 1): 0.25,
                       (1, -1): 0.25, (1, 1): 0.25, (-2, 0): -0.1875,
                       (2, 0): -0.1875, (0, -2): -0.1875, (0, 2): -0.1875}
    s2 = h2 + v2
    gc = v * _F(0.5) + (hsum + vsum) * _F(0.25) - s2 * _F(0.125)
    kr = (v * _F(0.625) + hsum * _F(0.5) - (h2 + diag4) * _F(0.125)
          + v2 * _F(0.0625))
    kc = (v * _F(0.625) + vsum * _F(0.5) - (v2 + diag4) * _F(0.125)
          + h2 * _F(0.0625))
    kd = v * _F(0.75) + diag4 * _F(0.25) - s2 * _F(0.1875)
    r = jnp.where(ye, jnp.where(xe, v, kr), jnp.where(xe, kc, kd))
    g = jnp.where(ye == xe, gc, v)
    b = jnp.where(ye, jnp.where(xe, kd, kc), jnp.where(xe, kr, v))
    # The gradient correction can undershoot on hard edges; the XLA
    # path clamps the normalized value at 0, which in this kernel's
    # pre-black-fold units is the black level (sc(19) = black*s).
    floor = sc(19)
    return (jnp.maximum(r, floor), jnp.maximum(g, floor),
            jnp.maximum(b, floor))


def _band_realign(v, off, i, bh, w):
    """Roll + slice the (bh+16)-row scratch window so the consumed band
    [off−4, off+bh+4) sits at rows [0, bh+8): the multi-stage grad
    kernels then compute over bh+8 rows instead of bh+16 (the saving
    matters most at small block heights) and the final output slice is
    the static rows [4, bh+4). Rows that wrap (at the clamped
    top/bottom windows) carry out-of-image global rows, where every
    shift's clamp fixup cuts the dependency chain — they are never
    consumed. Returns (band array, global-row iota, column iota)."""
    n = v.shape[0]
    band = bh + 8
    v = pltpu.roll(v, jax.lax.rem(n + 4 - off, n), axis=0)[0:band]
    gw = jax.lax.broadcasted_iota(jnp.int32, (band, w), 0) + (i * bh - 4)
    cols = jax.lax.broadcasted_iota(jnp.int32, (band, w), 1)
    return v, gw, cols


def _clamp_shift_fns(gw, w, true_h):
    """±1 clamp-to-edge shift closures over a band whose global rows
    are ``gw``: values clamp at image row 0 / the last TRUE image row
    (pre-pad — clone rows from the height-pad rescue must not leak
    into composed stages) and at the replicated edge columns."""
    n = gw.shape[0]

    def up(a):  # value one row up, clamp-to-edge at image row 0
        return jnp.where(gw == 0, a, pltpu.roll(a, 1, axis=0))

    def dn(a):  # one row down, clamp at the last TRUE image row
        return jnp.where(gw == true_h - 1, a,
                         pltpu.roll(a, n - 1, axis=0))

    def lf(a):
        return _shift_x(a, 1, a[:, 0:1])

    def rt(a):
        return _shift_x(a, -1, a[:, w - 1 : w])

    return up, dn, lf, rt


def _clampw_fn(cols, true_w, w):
    """Stage-output re-replication across the width-pad lanes (the
    clone columns violate CFA parity, so multi-stage kernels must
    re-assert the true edge value after every stage). Identity when
    nothing is padded."""
    if true_w == w:
        return lambda a: a
    return lambda a: jnp.where(cols >= true_w,
                               a[:, true_w - 1 : true_w], a)


def _parity_indicators(rows, cols, side):
    """Row/column parity indicator lists — the building blocks of the
    periodic site masks and constant tiles (the iota-compare select
    pattern, docs/performance.md XLA pathology #2)."""
    return ([rows % side == p for p in range(side)],
            [cols % side == j for j in range(side)])


def _site_mask_fn(grid, rind, cind):
    """``mask(chan, dy, dx)``: channel-site mask at tap offset
    (dy, dx), periodic in GLOBAL coordinates by construction — the
    indicators are reindexed, never clamped, which is exactly the XLA
    path's periodic-mask-over-edge-padded-values semantics."""
    side = len(rind)

    def mask(chan, dy, dx):
        m = None
        for p in range(side):
            cm = None
            for b in range(side):
                if grid[p, b] == chan:
                    t = cind[(b - dx) % side]
                    cm = t if cm is None else (cm | t)
            if cm is None:
                continue
            term = rind[(p - dy) % side] & cm
            m = term if m is None else (m | term)
        return m

    return mask


def _tile_consts_fn(rind, cind):
    """``tile(core, off_y, off_x)``: materialize the (side, side)
    numpy constant array periodically — output(y, x) =
    core[(y+off_y) % side, (x+off_x) % side] — via indicator selects
    grouped by distinct value (normalized-convolution denominators)."""
    side = len(rind)
    shape = rind[0].shape

    def tile(core, off_y, off_x):
        values = np.unique(core)
        acc = jnp.full(shape, _F(values[0]))
        for val in values[1:]:
            m = None
            for a in range(side):
                for b in range(side):
                    if core[a, b] == val:
                        t = (rind[(a - off_y) % side]
                             & cind[(b - off_x) % side])
                        m = t if m is None else (m | t)
            acc = jnp.where(m, _F(val), acc)
        return acc

    return tile


def _chroma_refine(v, rpl, gpl, bpl, at_g, at_r, at_b, up, dn, lf, rt,
                   clampw):
    """Two chroma-refinement iterations (the Markesteijn-style cleanup
    shared by the Bayer and generic grad kernels): normalized 3×3 tent
    smoothing of the color differences in _tent_valid's column-then-row
    summation order, channels rebuilt from their sensor sites."""

    def tent3(x):
        xv = (up(x) + x * 2.0) + dn(x)
        return ((lf(xv) + xv * 2.0) + rt(xv)) * _F(1.0 / 16.0)

    for _ in range(2):
        cb = clampw(tent3(rpl - gpl))
        cr = clampw(tent3(bpl - gpl))
        gpl = clampw(jnp.where(at_g, v, jnp.where(at_r, v - cb, v - cr)))
        rpl = clampw(jnp.where(at_r, v, gpl + cb))
        bpl = clampw(jnp.where(at_b, v, gpl + cr))
    return rpl, gpl, bpl


def _demosaic_grad_window(v, off, i, bh, w, cfa_phase, true_h,
                          true_w):
    """In-kernel gradient-weighted Bayer demosaic — the quality tier
    above Malvar (mirrors ops/cfa_generic.demosaic_grad_generic
    specialized to the 2×2 Bayer grid; reference has no such mode):

    1. G interpolates directionally (horizontal/vertical neighbor
       means blended by inverse raw gradients).
    2. R/B interpolate in color-difference space (value − G) from
       their neighbor class (row pair / column pair / diagonal quad)
       and add G back.
    3. Two chroma-refinement iterations: 3×3 tent smoothing of the
       color differences, channels rebuilt from their sensor sites.

    Every stage is a composed ±1-pixel stencil, so the receptive field
    is 4 rows/cols — inside the scratch window's 8-row halo. Stages
    are computed over the full (block_h+16)-row window ``v`` (a ~12%
    row overhead at block_h=128); window rows outside the consumed
    [off−4, off+bh+4) band hold wrapped values that nothing reads.
    Clamp-to-edge at the *image* boundary is repaired per shift by
    global-row/edge-column selects — out-of-window rows are consumed
    only when they are out-of-image, where the fixups supply them
    (the tile-aligned window start guarantees a full 4-row halo
    otherwise). Offset-invariance: every stage is a convex combination
    or a difference, so the folded black offset (see _fold_scalars)
    rides through exactly like the linear stencils; the inverse-
    gradient weights see raw *differences*, where the offset cancels.
    Numerically this reproduces the XLA path's normalized-convolution
    arithmetic: (2a+2b)/4 ≡ (a+b)·0.5 exactly in f32, and the diagonal
    / tent summation orders below copy _tent_valid's column-then-row
    grouping — residual reassociation stays inside the kernel's ±1 LSB
    contract (pinned by tests).

    ``true_h``/``true_w`` are the pre-pad image dims: the launchers'
    edge-pad rescues (width → lane multiple, height → when no valid
    block divisor exists) clone edge pixels, which is exact for the
    single-shot linear stencils but breaks grad — the clone columns/
    rows violate CFA parity, so intermediates computed there carry
    wrong site classes into the composed stages. Grad therefore clamps
    its shifts at the TRUE edges and re-replicates each stage output
    across the padded lanes (``clampw``), which reproduces the XLA
    path's per-stage edge pads exactly."""
    v, gw, cols = _band_realign(v, off, i, bh, w)
    ye = ((gw + cfa_phase[0]) % 2) == 0
    xe = ((cols + cfa_phase[1]) % 2) == 0
    at_g = ye != xe
    up, dn, lf, rt = _clamp_shift_fns(gw, w, true_h)
    clampw = _clampw_fn(cols, true_w, w)

    # --- G: directional interpolation, inverse-gradient blend --------
    u, d, l, r = up(v), dn(v), lf(v), rt(v)
    eps = _F(1e-4)
    wh = 1.0 / (jnp.abs(r - l) + eps)
    wv = 1.0 / (jnp.abs(d - u) + eps)
    g = clampw(jnp.where(
        at_g, v,
        (wh * ((l + r) * _F(0.5)) + wv * ((u + d) * _F(0.5)))
        / (wh + wv)))

    # --- R/B: color-difference interpolation -------------------------
    # diff is exactly 0 at G sites (g passes the raw value through), so
    # each class formula only ever sums taps of its own channel.
    diff = v - g
    dl, dr, du, dd = lf(diff), rt(diff), up(diff), dn(diff)
    hpair = (dl + dr) * _F(0.5)
    vpair = (du + dd) * _F(0.5)
    # Column-then-row grouping matches _tent_valid's summation order.
    diag = ((lf(du) + lf(dd)) + (rt(du) + rt(dd))) * _F(0.25)
    rpl = clampw(jnp.where(ye, jnp.where(xe, v, g + hpair),
                           jnp.where(xe, g + vpair, g + diag)))
    bpl = clampw(jnp.where(ye, jnp.where(xe, g + diag, g + vpair),
                           jnp.where(xe, g + hpair, v)))
    # At non-G sites the ye selector is equivalent to an R-site test
    # (non-G & even row → even col), so the shared refinement's at_r
    # form composes identically.
    rpl, gpl, bpl = _chroma_refine(
        v, rpl, g, bpl, at_g, ye & xe,
        jnp.logical_and(~ye, ~xe), up, dn, lf, rt, clampw)

    # The block's rows sit at [4, bh+4) after the up-front realign.
    return rpl[4 : 4 + bh], gpl[4 : 4 + bh], bpl[4 : 4 + bh]


def _demosaic_smooth_generic(grows, w, pattern, center, up, down, left,
                             right):
    """In-kernel normalized-convolution demosaic for a repeating CFA
    whose per-channel smooth radius is 1 (X-Trans qualifies for all
    three channels) — the generic-CFA accurate tier
    (ops/cfa_generic.demosaic_smooth_generic), fused:
    conv3×3_tent(value·mask) / den with channel-site masks assembled
    from reindexed row/column parity indicators (the iota-compare
    select pattern — docs/performance.md XLA pathology #2) and the
    6×6-periodic denominators materialized from the same trace-time
    numpy cores the XLA path tiles (_periodic_den_2d). Values
    clamp-to-edge (the taps arrive fixed); masks continue periodically
    past the frame by construction — (gw+dy) % side needs no clamping
    — which is exactly the XLA path's padded-value × periodic-mask
    semantics. Summation follows _tent_valid's column-then-row order
    (t=1 and t=2 multiplies are f32-exact), so the result usually
    matches the XLA lane bit-for-bit; residual ULPs stay inside the
    kernel's ±1 LSB contract."""
    from raweditor_tpu.ops.cfa_generic import _CHAN, _periodic_den_2d

    side = int(len(pattern) ** 0.5)
    grid = np.array([_CHAN[c] for c in pattern.upper()]).reshape(side,
                                                                 side)
    bh = grows.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1)
    rind, cind = _parity_indicators(grows, cols, side)
    mask_at = _site_mask_fn(grid, rind, cind)
    tile_consts = _tile_consts_fn(rind, cind)
    ul = _shift_x(up, 1, up[:, 0:1])
    ur = _shift_x(up, -1, up[:, w - 1 : w])
    dl = _shift_x(down, 1, down[:, 0:1])
    dr = _shift_x(down, -1, down[:, w - 1 : w])
    taps = {(-1, -1): ul, (-1, 0): up, (-1, 1): ur,
            (0, -1): left, (0, 0): center, (0, 1): right,
            (1, -1): dl, (1, 0): down, (1, 1): dr}

    if bh % side == 0 and w % side == 0:
        # Roll-based masks (see _demosaic_grad_generic_window): when
        # both array dims are multiples of the CFA period, a circular
        # roll of the base site mask IS its periodic shift.
        basef = [jnp.where(mask_at(c, 0, 0), _F(1.0), _F(0.0))
                 for c in range(3)]

        def mv_fn(chan):
            def mv(dy, dx):
                m = basef[chan]
                if dy:
                    m = pltpu.roll(m, (-dy) % bh, axis=0)
                if dx:
                    m = pltpu.roll(m, (-dx) % w, axis=1)
                return taps[(dy, dx)] * m
            return mv
    else:
        def mv_fn(chan):
            def mv(dy, dx):
                return jnp.where(mask_at(chan, dy, dx), taps[(dy, dx)],
                                 _F(0.0))
            return mv

    planes = []
    for chan in range(3):
        mv = mv_fn(chan)
        colsum = {dx: (mv(-1, dx) + mv(0, dx) * 2.0) + mv(1, dx)
                  for dx in (-1, 0, 1)}
        num = (colsum[-1] + colsum[0] * 2.0) + colsum[1]
        den = tile_consts(_periodic_den_2d(grid, chan, 1), -1, -1)
        planes.append(jnp.where(mask_at(chan, 0, 0), center, num / den))
    return tuple(planes)


def _demosaic_grad_generic_window(v, off, i, bh, w, pattern, true_h,
                                  true_w):
    """In-kernel gradient-weighted demosaic for a repeating CFA whose
    directional-G and smooth radii are all 1 (X-Trans qualifies) —
    ops/cfa_generic.demosaic_grad_generic, fused. Same band machinery
    and offset-invariance argument as the Bayer `_demosaic_grad_window`
    (every stage is a convex combination or a difference; composed ±1
    stencils, 4-row receptive field inside the realigned bh+8 band).
    The CFA structure enters through per-tap site masks built from
    reindexed row/column parity indicators: masks continue PERIODICALLY
    past the frame by construction ((gw+dy) % side needs no clamp)
    while tap values clamp at the TRUE image edges — exactly the XLA
    path's padded-value × periodic-mask semantics, including the pad
    rescues (a clamped tap into the clone pad reads the re-replicated
    stage value = the true edge value, and its mask keys off the
    unclamped parity). Normalized-convolution denominators are the
    same trace-time numpy cores the XLA path tiles. Summation follows
    _tent_valid's column-then-row order; residual ULPs stay inside the
    ±1 LSB contract (pinned by tests)."""
    from raweditor_tpu.ops.cfa_generic import (_CHAN, _periodic_den_1d,
                                               _periodic_den_2d)

    side = int(len(pattern) ** 0.5)
    grid = np.array([_CHAN[c] for c in pattern.upper()]).reshape(side,
                                                                 side)
    v, gw, cols = _band_realign(v, off, i, bh, w)
    rind, cind = _parity_indicators(gw, cols, side)
    mask = _site_mask_fn(grid, rind, cind)
    tile_consts = _tile_consts_fn(rind, cind)
    up, dn, lf, rt = _clamp_shift_fns(gw, w, true_h)
    clampw = _clampw_fn(cols, true_w, w)

    g_chan = _CHAN["G"]
    at_g = mask(g_chan, 0, 0)
    at_r = mask(0, 0, 0)
    at_b = mask(2, 0, 0)

    band = gw.shape[0]
    if band % side == 0 and w % side == 0:
        # Fast masks: when BOTH band dims are multiples of the pattern
        # period, a circular roll of the base site mask is exactly its
        # periodic shift (the wrapped rows/cols land on the same
        # parity), so each tap mask costs ≤2 rolls of an f32 0/1 plane
        # instead of an 11-op indicator select — the launchers pick
        # roll-qualifying block heights and pad the width to
        # lcm(128, side) to hit this path (~25% of the kernel at
        # 24 MP). Multiplying by the 0/1 plane equals the masked
        # select (and IS the XLA path's padded-value × mask form).
        basef = {c: jnp.where(mask(c, 0, 0), _F(1.0), _F(0.0))
                 for c in (0, g_chan, 2)}

        def mask_mul(chan, dy, dx, tap):
            m = basef[chan]
            if dy:
                m = pltpu.roll(m, (-dy) % band, axis=0)
            if dx:
                m = pltpu.roll(m, (-dx) % w, axis=1)
            return tap * m
    else:
        def mask_mul(chan, dy, dx, tap):
            return jnp.where(mask(chan, dy, dx), tap, _F(0.0))

    # --- G: directional normalized 1-D convs, inverse-gradient blend --
    u, d, l, r = up(v), dn(v), lf(v), rt(v)
    vg = jnp.where(at_g, v, _F(0.0))
    gh_num = ((mask_mul(g_chan, 0, -1, l) + vg * 2.0)
              + mask_mul(g_chan, 0, 1, r))
    gv_num = ((mask_mul(g_chan, -1, 0, u) + vg * 2.0)
              + mask_mul(g_chan, 1, 0, d))
    den_h = tile_consts(_periodic_den_1d(grid, g_chan, 1, 1), 0, -1)
    den_v = tile_consts(_periodic_den_1d(grid, g_chan, 1, 0), -1, 0)
    gh = gh_num / den_h
    gv = gv_num / den_v
    eps = _F(1e-4)
    wh = 1.0 / (jnp.abs(r - l) + eps)
    wv = 1.0 / (jnp.abs(d - u) + eps)
    g = clampw(jnp.where(at_g, v, (wh * gh + wv * gv) / (wh + wv)))

    # --- R/B: color-difference interpolation (radius-1 tent) ----------
    # Built per column offset with masks created and released inside
    # the loop — the earlier all-9-taps-upfront form held ~18 mask +
    # 9 shift arrays live at once and spilled VMEM registers at
    # production widths.
    diff = v - g
    du, dd = up(diff), dn(diff)
    num = {0: None, 2: None}
    for dx in (-1, 0, 1):
        if dx == -1:
            dtaps = (lf(du), lf(diff), lf(dd))
        elif dx == 1:
            dtaps = (rt(du), rt(diff), rt(dd))
        else:
            dtaps = (du, diff, dd)
        for chan in (0, 2):
            colsum = ((mask_mul(chan, -1, dx, dtaps[0])
                       + mask_mul(chan, 0, dx, dtaps[1]) * 2.0)
                      + mask_mul(chan, 1, dx, dtaps[2]))
            term = colsum * 2.0 if dx == 0 else colsum
            num[chan] = term if num[chan] is None else num[chan] + term
    den_r = tile_consts(_periodic_den_2d(grid, 0, 1), -1, -1)
    den_b = tile_consts(_periodic_den_2d(grid, 2, 1), -1, -1)
    rpl = clampw(jnp.where(at_r, v, g + num[0] / den_r))
    bpl = clampw(jnp.where(at_b, v, g + num[2] / den_b))
    rpl, gpl, bpl = _chroma_refine(v, rpl, g, bpl, at_g, at_r, at_b,
                                   up, dn, lf, rt, clampw)

    return rpl[4 : 4 + bh], gpl[4 : 4 + bh], bpl[4 : 4 + bh]


def _develop_block(sc, scratch, i, block_h, cfa_phase, gamma,
                   pattern=None, demosaic: str = "nearest", *,
                   off, img_h: int, output: str = "rgba",
                   true_h: int = None, true_w: int = None):
    """Shared kernel body: develop one (block_h+16, W) scratch window.
    ``sc`` maps a folded-scalar index to its value; ``i`` is the block's
    row-grid index; ``off`` is the (dynamic) sublane offset of the
    block's first row inside the scratch window (8 for interior blocks,
    0 when the window clamped at the image top, up to 16 at the
    bottom);
    ``img_h`` is the full image height (for the clamp-to-edge fixups).
    ``pattern`` switches the demosaic from the Bayer parity stencil to
    a generic repeating-CFA nearest-site table (all X-Trans nearest
    offsets are within ±1, so the same five taps serve both).
    ``demosaic`` picks the Bayer stencil: "nearest" (parity path,
    reference: gpu/shaders.rs:104-158), "bilinear", or "malvar" (the
    5×5 gradient-corrected kernels — the scratch window's halo covers
    them; see ops/demosaic.py for the tap tables, which this mirrors
    exactly). Returns the (block_h, W) packed-RGBA u32 block."""
    s = sc(12)
    # Mosaic can't cast u16→f32 directly; widen through int32.
    v_all = scratch[:].astype(jnp.int32).astype(jnp.float32) * s
    bh = block_h
    w = v_all.shape[1]
    n = bh + 16

    def tap_row(d):
        # Center-relative row tap: rows [off+d, off+d+bh) of the window
        # = image rows [i*bh+d, ...), via one dynamic sublane roll
        # (unaligned VMEM row slices are not allowed — 8-row tiling —
        # so realignment is circular rolls taking the leading bh rows).
        return pltpu.roll(
            v_all, jax.lax.rem(n - off - d, n), axis=0)[0:bh, :]

    if demosaic == "grad":
        # Multi-stage stencil: works on the whole window, not the
        # center-relative taps below.
        th = img_h if true_h is None else true_h
        tw = w if true_w is None else true_w
        if pattern is None:
            r, g, b = _demosaic_grad_window(v_all, off, i, bh, w,
                                            cfa_phase, th, tw)
        else:
            r, g, b = _demosaic_grad_generic_window(v_all, off, i, bh,
                                                    w, pattern, th, tw)
        return _finish_block(sc, r, g, b, bh, w, gamma, output)

    # Rows that a clamped window can't supply (above row 0 / below row
    # img_h-1) wrap around the scratch; the global-row selects repair
    # them to clamp-to-edge semantics.
    grows = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0) + i * bh
    center = tap_row(0)
    up = jnp.where(grows == 0, center, tap_row(-1))
    down = jnp.where(grows == img_h - 1, center, tap_row(1))
    left = _shift_x(center, 1, center[:, 0:1])
    right = _shift_x(center, -1, center[:, w - 1 : w])

    if pattern is None and demosaic in ("bilinear", "malvar"):
        r, g, b = _demosaic_smooth_taps(
            tap_row, grows, img_h, center, up, down, left, right, sc,
            i, bh, w, cfa_phase, demosaic,
        )
    elif pattern is not None and demosaic == "smooth":
        r, g, b = _demosaic_smooth_generic(
            grows, w, pattern, center, up, down, left, right)
    elif pattern is None:
        downleft = _shift_x(down, 1, down[:, 0:1])
        # CFA parity in global coordinates (the y+1 offset is folded
        # into the site table, see ops/demosaic.py).
        rows = grows + cfa_phase[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1) + cfa_phase[1]
        ye = (rows % 2) == 0
        xe = (cols % 2) == 0

        r = jnp.where(ye, jnp.where(xe, center, left),
                      jnp.where(xe, down, downleft))
        g = jnp.where(ye, jnp.where(xe, right, center),
                      jnp.where(xe, center, left))
        b = jnp.where(ye, up, jnp.where(xe, right, center))
    else:
        from raweditor_tpu.ops.cfa_generic import nearest_offsets

        side = int(len(pattern) ** 0.5)
        table = nearest_offsets(pattern, side, side)
        taps = {(0, 0): center, (0, -1): left, (0, 1): right,
                (-1, 0): up, (1, 0): down}
        rows = grows
        cols = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1)
        ry = rows % side
        cx = cols % side
        planes = []
        for chan in range(3):
            by_offset = {}
            for py in range(side):
                for px in range(side):
                    by_offset.setdefault(
                        table[(py, px, chan)], []
                    ).append((py, px))
            acc = taps[(0, 0)]
            for off, cells in by_offset.items():
                if off == (0, 0):
                    continue
                if off not in taps:
                    raise ValueError(
                        f"pattern needs offset {off}; only ±1 supported"
                    )
                mask = None
                for py, px in cells:
                    m = (ry == py) & (cx == px)
                    mask = m if mask is None else (mask | m)
                acc = jnp.where(mask, taps[off], acc)
            planes.append(acc)
        r, g, b = planes

    return _finish_block(sc, r, g, b, bh, w, gamma, output)


def _finish_block(sc, r, g, b, bh, w, gamma, output):
    """Edit stack + transfer + pack on (bh, W) camera-RGB planes (the
    post-demosaic tail of _develop_block)."""
    # Folded matrix + offset.
    r2 = sc(0) * r + sc(1) * g + sc(2) * b + sc(9)
    g2 = sc(3) * r + sc(4) * g + sc(5) * b + sc(10)
    b2 = sc(6) * r + sc(7) * g + sc(8) * b + sc(11)
    r, g, b = r2, g2, b2

    # Highlights/shadows (shared luminance read,
    # reference: gpu/shaders.rs:222-230). The shadows leg expands to
    # (1+s) - lum*s (one FMA with the folded 1+s), and the
    # contrast+levels gain A multiplies the tone factor once instead
    # of each channel.
    lum = _LUMA[0] * r + _LUMA[1] * g + _LUMA[2] * b
    toneA = (1.0 + lum * sc(15)) * (sc(20) - lum * sc(16)) * sc(13)
    B = sc(14)
    r = r * toneA + B
    g = g * toneA + B
    b = b * toneA + B

    # Saturation + vibrance, fused into one mix (algebraically exact):
    # the luma weights sum to 1, so luma is invariant under the
    # saturation mix, and the post-saturation spread is (mx-mn)*|sf| —
    # the vibrance factor (reference: gpu/shaders.rs:243-257, computed
    # there on the saturated channels) therefore folds into a single
    # lerp about the shared luma. Saves one luma dot product and one
    # full mix pass per pixel.
    luma = _LUMA[0] * r + _LUMA[1] * g + _LUMA[2] * b
    mx = jnp.maximum(r, jnp.maximum(g, b))
    mn = jnp.minimum(r, jnp.minimum(g, b))
    sf = sc(17)
    vf = 1.0 + sc(18) * (1.0 - (mx - mn) * jnp.abs(sf))
    f = sf * vf
    r = luma + (r - luma) * f
    g = luma + (g - luma) * f
    b = luma + (b - luma) * f

    # Transfer curve, clamp, quantize, pack RGBA. The poly branches run
    # in the ×255 domain (the rounding bias is folded into the constant
    # coefficient), so quantization is just a clamp at 255.5 + floor —
    # `min(c,1)*255 + 0.5` ≡ `min(c*255 + 0.5, 255.5)` (monotone).
    def q(c):
        c = jnp.maximum(c, 0.0)
        if gamma == "poly":
            sq = jnp.sqrt(jnp.sqrt(jnp.minimum(c, 1.0)))
            acc = _F(_GAMMA_POLY255[0])
            for k in _GAMMA_POLY255[1:]:
                acc = acc * sq + _F(k)
            v = acc
        elif gamma == "srgb":
            # IEC 61966-2-1 piecewise encode (matches color.srgb_encode).
            c = jnp.minimum(c, 1.0)
            lo = c * _F(12.92)
            hi = _F(1.055) * jnp.power(c, _F(1.0 / 2.4)) - _F(0.055)
            v = jnp.where(c <= _F(0.0031308), lo, hi) * 255.0 + 0.5
        elif gamma == "srgb_poly":
            # Fast sRGB (matches color.srgb_poly_encode): exact linear
            # segment, polynomial pow branch.
            c = jnp.minimum(c, 1.0)
            sq = jnp.sqrt(jnp.sqrt(c))
            acc = _F(_SRGB_POLY255[0])
            for k in _SRGB_POLY255[1:]:
                acc = acc * sq + _F(k)
            v = jnp.where(c <= _F(0.0031308),
                          c * _F(12.92 * 255.0) + 0.5, acc)
        else:
            v = jnp.power(c, _F(1.0 / 2.2)) * 255.0 + 0.5
        v = jnp.minimum(v, 255.5)
        # f32→u32 unsupported in Mosaic; go through int32 (values 0..255).
        return jnp.floor(v).astype(jnp.int32)

    if output == "rgba":
        return (q(r).astype(jnp.uint32) | (q(g).astype(jnp.uint32) << 8)
                | (q(b).astype(jnp.uint32) << 16) | jnp.uint32(0xFF000000))

    # output == "ycbcr420": JPEG planes straight out of the kernel — the
    # exporter's separate conversion pass (ops/jpeg.py) re-reads the
    # 4 B/px RGBA words from HBM; emitting Y (u8) + an NV12-style
    # interleaved CbCr plane here writes 1.5 B/px and skips that pass
    # entirely (~6 B/px less HBM traffic per develop). Color math is
    # rgba_words_to_ycbcr420's, applied to the same quantized u8 values;
    # FMA-contraction differences between fusion contexts and the chroma
    # 4-sum reassociation shift results by ≤1 step on each plane —
    # inside the Pallas path's ±1 LSB contract (pinned by test).
    return _emit_ycbcr420(q(r), q(g), q(b), bh, w)


def _emit_ycbcr420(rq, gq, bq, bh, w):
    """Quantized int32 RGB (bh, w) → (Y u8 (bh, w), NV12-interleaved
    CbCr u8 (bh/2, w)) — the in-kernel JPEG-plane emission shared by
    the develop kernels and the finish-extras post-pass."""
    rf = rq.astype(jnp.float32)
    gf = gq.astype(jnp.float32)
    bf = bq.astype(jnp.float32)
    yf = _F(0.299) * rf + _F(0.587) * gf + _F(0.114) * bf
    cbf = (_F(128.0) - _F(0.168735892) * rf - _F(0.331264108) * gf
           + _F(0.5) * bf)
    crf = (_F(128.0) + _F(0.5) * rf - _F(0.418687589) * gf
           - _F(0.081312411) * bf)
    # f32→u8 is unsupported in Mosaic (like f32→u32 in _finish_block);
    # narrow through int32 — values are already clamped to 0..255.
    yq = jnp.clip(jnp.round(yf), 0.0, 255.0).astype(jnp.int32) \
        .astype(jnp.uint8)
    # 2×2 box via one sublane roll (row pairs never cross a block: bh is
    # even and blocks start on even image rows) + one lane roll (w is
    # even — the launcher guards both), then interleave Cb/Cr along
    # lanes: out[i, 2j] = Cb(i, j), out[i, 2j+1] = Cr(i, j) — the lane
    # roll does the w/2 compaction a strided slice can't express in
    # Mosaic. Even output rows are then taken by a minor-preserving
    # reshape.
    vcb = cbf + pltpu.roll(cbf, bh - 1, axis=0)   # row k + row k+1
    vcr = crf + pltpu.roll(crf, bh - 1, axis=0)
    scb = vcb + pltpu.roll(vcb, w - 1, axis=1)    # + col pair → 4-sum
    scr = vcr + pltpu.roll(vcr, w - 1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1)
    inter = jnp.where(col % 2 == 0, scb,
                      pltpu.roll(scr, 1, axis=1)) * _F(0.25)
    inter = inter.reshape(bh // 2, 2, w)[:, 0, :]  # even rows only
    cq = jnp.clip(jnp.round(inter), 0.0, 255.0).astype(jnp.int32) \
        .astype(jnp.uint8)
    return yq, cq


def _kernel_flat(scal_ref, mos_hbm, *refs, block_h: int, steps: int,
                 total: int, img_h: int, cfa_phase=(0, 0),
                 gamma: str = "pow", pattern=None,
                 demosaic: str = "nearest", output: str = "rgba",
                 true_hw=None):
    """Double-buffered unified kernel body. The grid is flat over
    (image, row-block) pairs; ``mos_hbm`` is the UNPADDED mosaics
    reshaped to one (N*H, W) plane. Each block DMAs a
    (block_h+16)-row window whose tile-aligned start is clamped inside
    its image (no pad pass — a
    full extra HBM read+write per develop otherwise); _develop_block
    realigns via the dynamic ``off`` and repairs the image-edge rows.
    The DMA for step g+1 is issued before step g's compute so the HBM
    read rides under the VPU work (the serial start();wait() form
    measured ~2 µs/step of exposed DMA latency at 24 MP — ~20% of the
    kernel)."""
    if output == "rgba":
        out_ref, scratch, sems = refs
    else:  # "ycbcr420": Y plane + interleaved CbCr plane
        out_y, out_c, scratch, sems = refs
    g = pl.program_id(0)
    nimg = g // steps
    i = g % steps
    nwin = block_h + 16

    def window(gg):
        # The window starts one 8-row tile above the block (u16 HBM is
        # (8,128)-tiled, so DMA row starts must be provably 8-aligned —
        # hence the tile-granular start and the pl.multiple_of hint)
        # and is clamped into the image (img_h ≥ block_h+16 is
        # guaranteed by the launcher). Returns (flat row start, block
        # offset in window).
        ii = gg % steps
        s0 = jnp.clip(ii * block_h - 8, 0, img_h - nwin)
        s0 = pl.multiple_of(s0, 8)
        return (gg // steps) * img_h + s0, ii * block_h - s0

    def copy_for(gg, slot):
        row0, _ = window(gg)
        return pltpu.make_async_copy(
            mos_hbm.at[pl.ds(row0, nwin)], scratch.at[slot], sems.at[slot],
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        copy_for(g, slot).start()

    @pl.when(g + 1 < total)
    def _():
        copy_for(g + 1, 1 - slot).start()

    copy_for(g, slot).wait()
    _, off = window(g)
    th, tw = true_hw if true_hw is not None else (None, None)
    res = _develop_block(lambda k: scal_ref[nimg, k],
                         scratch.at[slot], i, block_h, cfa_phase,
                         gamma, pattern, demosaic, off=off,
                         img_h=img_h, output=output,
                         true_h=th, true_w=tw)
    if output == "rgba":
        out_ref[0] = res
    else:
        out_y[0] = res[0]
        out_c[0] = res[1]


def _launch_flat(scal2d, mosaics, n, h, w, bh, cfa_phase, gamma, pattern,
                 demosaic, interpret, output: str = "rgba",
                 true_hw=None):
    """Shared pallas_call site: flat (image, row-block) grid over the
    unpadded (N*H, W) mosaic plane; each DMA window is a plain 2-D row
    slice clamped into its image (edge handling is in-kernel)."""
    steps = h // bh
    flat = mosaics.reshape(n * h, w)
    if output == "rgba":
        out_specs = pl.BlockSpec((1, bh, w),
                                 lambda g: (g // steps, g % steps, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, h, w), jnp.uint32)
    else:  # Y (N,H,W) u8 + interleaved CbCr (N,H/2,W) u8 (NV12 layout)
        out_specs = [
            pl.BlockSpec((1, bh, w),
                         lambda g: (g // steps, g % steps, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh // 2, w),
                         lambda g: (g // steps, g % steps, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = (jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
                     jax.ShapeDtypeStruct((n, h // 2, w), jnp.uint8))
    return pl.pallas_call(
        functools.partial(_kernel_flat, block_h=bh, steps=steps,
                          total=n * steps, img_h=h,
                          cfa_phase=cfa_phase, gamma=gamma,
                          pattern=pattern, demosaic=demosaic,
                          output=output, true_hw=true_hw),
        grid=(n * steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # Pinned to HBM (not ANY): Mosaic promotes small ANY inputs
            # into VMEM, where the clamped windows' unaligned row
            # starts are illegal (8-row tiling); HBM DMA sources allow
            # arbitrary row offsets.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, bh + 16, w), jnp.uint16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # The default 16 MB scoped-VMEM cap is exactly what the old
        # padded kernel fit under at 24 MP; the +8 scratch rows push
        # the stack 216 KB over it. v5e/v5p have 128 MiB physical
        # VMEM — raise the cap well clear of the stack's needs (the
        # compiler still allocates only what the kernel uses).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(scal2d, flat)


@functools.partial(
    jax.jit, static_argnames=("matrix_transpose", "block_h", "interpret",
                              "cfa_phase", "gamma", "pattern", "demosaic",
                              "output", "_true_hw")
)
def pallas_batch_develop_rgba(
    mosaics,
    params: EditParams,
    wbs,
    cam_matrices,
    white_levels=None,
    black_levels=None,
    matrix_transpose: bool = True,
    block_h: int | None = None,
    interpret: bool = False,
    cfa_phase=(0, 0),
    gamma: str = "pow",
    pattern: str = None,
    demosaic: str = "nearest",
    output: str = "rgba",
    _true_hw=None,
):
    """Batched fused-kernel develop: (N, H, W) u16 → (N, H, W) u32.

    The batch dimension becomes the leading grid axis (one DMA + develop
    per (image, row-block)); per-image folded scalars live as an (N, 24)
    SMEM table. ``params``/``wbs``/``cam_matrices`` carry a leading (N,)
    axis (see parallel.batch.pack_params). Same ±1 LSB contract as
    :func:`pallas_develop_rgba`.

    ``output='ycbcr420'`` (even H and W only) emits JPEG planes straight
    from the kernel — (N, H, W) u8 Y + (N, H/2, W) u8 NV12-interleaved
    CbCr (cb = plane[..., 0::2], cr = plane[..., 1::2]) — writing
    1.5 B/px instead of 4 and skipping the exporter's separate
    conversion pass (see _develop_block).
    """
    n, h, w = mosaics.shape
    th, tw = _true_hw if _true_hw is not None else (h, w)
    if output == "ycbcr420" and (h % 2 or w % 2):
        raise ValueError("ycbcr420 output requires even H and W")
    if pattern is not None and demosaic not in ("nearest", "smooth",
                                                "grad"):
        raise ValueError(
            "generic-CFA patterns support nearest/smooth/grad demosaic"
        )
    if pattern is not None and demosaic in ("smooth", "grad"):
        from raweditor_tpu.ops.cfa_generic import (_CHAN, _dir_radius,
                                                   _smooth_radius)

        side = int(len(pattern) ** 0.5)
        if any(_smooth_radius(pattern, side, side, c) != 1
               for c in range(3)):
            raise ValueError(
                "in-kernel smooth/grad needs per-channel smooth "
                "radius 1 (X-Trans qualifies); use the XLA path"
            )
        if demosaic == "grad" and (
                _dir_radius(pattern, side, side, _CHAN["G"], 0) != 1
                or _dir_radius(pattern, side, side, _CHAN["G"], 1) != 1):
            raise ValueError(
                "in-kernel grad needs directional-G radius 1 "
                "(X-Trans qualifies); use the XLA path"
            )
    if demosaic not in ("nearest", "bilinear", "malvar", "grad",
                        "smooth"):
        raise ValueError(f"unsupported demosaic {demosaic!r}")
    if pattern is None and demosaic == "smooth":
        raise ValueError("'smooth' is the generic-CFA tier; Bayer uses "
                         "bilinear/malvar/grad")
    bh, wmult = _block_and_wmult(h, block_h, pattern, demosaic)
    if block_h is None and bh == 0:
        hp = -(-h // 128) * 128  # see pallas_develop_rgba: no divisor
        if hp != h:
            out = pallas_batch_develop_rgba(
                jnp.pad(mosaics, ((0, 0), (0, hp - h), (0, 0)),
                        mode="edge"),
                params, wbs, cam_matrices, white_levels, black_levels,
                matrix_transpose, block_h, interpret, cfa_phase, gamma,
                pattern, demosaic, output, _true_hw=(th, tw),
            )
            if output == "ycbcr420":
                return out[0][:, :h], out[1][:, : h // 2]
            return out[:, :h]
    if not bh or h % bh or bh % 8 or h < bh + 16:
        raise ValueError(
            f"H={h} needs a block height that is a multiple of 8, "
            f"divides H, and leaves room for the halo window "
            f"(H >= block_h+16; got {bh}); use the XLA path for this shape"
        )
    wp = -(-w // wmult) * wmult
    if wp != w:  # see pallas_develop_rgba: lane alignment via edge pad
        out = pallas_batch_develop_rgba(
            jnp.pad(mosaics, ((0, 0), (0, 0), (0, wp - w)), mode="edge"),
            params, wbs, cam_matrices, white_levels, black_levels,
            matrix_transpose, block_h, interpret, cfa_phase, gamma,
            pattern, demosaic, output, _true_hw=(th, tw),
        )
        if output == "ycbcr420":
            # Chroma sites < w/2 only use real columns (w is even).
            return out[0][:, :, :w], out[1][:, :, :w]
        return out[:, :, :w]
    if white_levels is None:
        white_levels = jnp.full((n,), 4096.0, jnp.float32)
    if black_levels is None:
        black_levels = jnp.zeros((n,), jnp.float32)
    scal = jax.vmap(
        functools.partial(_fold_scalars, matrix_transpose=matrix_transpose)
    )(params, wbs, cam_matrices, white_levels, black_levels)
    return _launch_flat(scal, mosaics, n, h, w, bh, cfa_phase, gamma,
                        pattern, demosaic, interpret, output,
                        true_hw=(th, tw))


@functools.partial(
    jax.jit, static_argnames=("matrix_transpose", "block_h", "interpret",
                              "cfa_phase", "gamma", "pattern", "demosaic",
                              "_true_hw")
)
def pallas_develop_rgba(
    mosaic,
    params: EditParams,
    wb,
    cam_matrix,
    white_level=4096.0,
    black_level=0.0,
    matrix_transpose: bool = True,
    block_h: int | None = None,
    interpret: bool = False,
    cfa_phase=(0, 0),
    gamma: str = "pow",
    pattern: str = None,
    demosaic: str = "nearest",
    _true_hw=None,
):
    """Fused-kernel full develop: (H, W) u16 → (H, W) u32 packed RGBA.
    ``pattern`` switches to the generic repeating-CFA site table
    (X-Trans et al; nearest offsets must be within ±1). ``demosaic``
    picks the Bayer stencil ("nearest"/"bilinear"/"malvar") — the
    accurate-mode lane runs fully in-kernel."""
    h, w = mosaic.shape
    th, tw = _true_hw if _true_hw is not None else (h, w)
    if pattern is not None and demosaic not in ("nearest", "smooth",
                                                "grad"):
        raise ValueError(
            "generic-CFA patterns support nearest/smooth/grad demosaic"
        )
    if pattern is not None and demosaic in ("smooth", "grad"):
        from raweditor_tpu.ops.cfa_generic import (_CHAN, _dir_radius,
                                                   _smooth_radius)

        side = int(len(pattern) ** 0.5)
        if any(_smooth_radius(pattern, side, side, c) != 1
               for c in range(3)):
            raise ValueError(
                "in-kernel smooth/grad needs per-channel smooth "
                "radius 1 (X-Trans qualifies); use the XLA path"
            )
        if demosaic == "grad" and (
                _dir_radius(pattern, side, side, _CHAN["G"], 0) != 1
                or _dir_radius(pattern, side, side, _CHAN["G"], 1) != 1):
            raise ValueError(
                "in-kernel grad needs directional-G radius 1 "
                "(X-Trans qualifies); use the XLA path"
            )
    if demosaic not in ("nearest", "bilinear", "malvar", "grad",
                        "smooth"):
        raise ValueError(f"unsupported demosaic {demosaic!r}")
    if pattern is None and demosaic == "smooth":
        raise ValueError("'smooth' is the generic-CFA tier; Bayer uses "
                         "bilinear/malvar/grad")
    bh, wmult = _block_and_wmult(h, block_h, pattern, demosaic)
    # Heights with no multiple-of-8 divisor at all (e.g. 502 = 2·251)
    # are edge-padded to the next multiple of 128 and sliced after —
    # the clone rows reproduce clamp-to-edge. (Measured: padding heights
    # that do have a small valid divisor is NOT faster — the ~2% extra
    # rows cost more than the saved grid steps — so this only rescues
    # otherwise-unsupported shapes.)
    if block_h is None and bh == 0:
        hp = -(-h // 128) * 128
        if hp != h:
            out = pallas_develop_rgba(
                jnp.pad(mosaic, ((0, hp - h), (0, 0)), mode="edge"),
                params, wb, cam_matrix, white_level, black_level,
                matrix_transpose, block_h, interpret, cfa_phase, gamma,
                pattern, demosaic, _true_hw=(th, tw),
            )
            return out[:h]
    if not bh or h % bh or bh % 8 or h < bh + 16:
        raise ValueError(
            f"H={h} needs a block height that is a multiple of 8, "
            f"divides H, and leaves room for the halo window "
            f"(H >= block_h+16; got {bh}); use the XLA path for this shape"
        )
    # Mosaic requires lane-dimension slices to be 128-aligned; widths
    # that aren't are edge-padded up front (the clone column makes the
    # lane rolls reproduce clamp-to-edge exactly) and sliced after.
    # Pattern-grad pads to lcm(128, side) when the roll fast path
    # applies (wmult from _block_and_wmult).
    wp = -(-w // wmult) * wmult
    if wp != w:
        out = pallas_develop_rgba(
            jnp.pad(mosaic, ((0, 0), (0, wp - w)), mode="edge"),
            params, wb, cam_matrix, white_level, black_level,
            matrix_transpose, block_h, interpret, cfa_phase, gamma,
            pattern, demosaic, _true_hw=(th, tw),
        )
        return out[:, :w]
    scal = _fold_scalars(params, wb, cam_matrix, white_level, black_level,
                         matrix_transpose)
    return _launch_flat(scal[None], mosaic[None], 1, h, w, bh, cfa_phase,
                        gamma, pattern, demosaic, interpret,
                        true_hw=(th, tw))[0]


# ---------------------------------------------------------------------------
# Finish-extras post-pass kernel (sharpen / denoise on packed RGBA words)
# ---------------------------------------------------------------------------


def _extras_window(v_words, off, i, bh, w, true_h, true_w, sharpen,
                   denoise, curve, vignette, mixer=None, grading=None,
                   stencils=True, output="rgba"):
    """Extras over one realigned (bh+8)-row band of packed-RGBA words:
    unpack u8 → [0, 1] planes, run ops/extras.extras_core with
    roll-based shift closures, requantize with the finish rounding,
    repack. The ±2-pixel receptive field sits well inside the band's
    4-row halo. The shifts clamp at the TRUE image edges (pre-pad):
    launch-time pad clones are exact for a single stencil but NOT for
    composed stages (a clone's stage-1 output differs from the true
    edge's — the same leak grad repairs with clampw), so true pixels
    must never read a pad pixel's stage output. With reads clamped at
    true_h/true_w they never do, and the pad region is sliced off."""
    from raweditor_tpu.ops.extras import extras_core

    v, gw, cols = _band_realign(v_words, off, i, bh, w)
    # Row shifts are _clamp_shift_fns' (clamped at the true height);
    # only the column shifts differ — they clamp reads at the TRUE
    # width (a composed stage must never consume a pad column's
    # stage output), which _shift_x's physical-edge fixup can't do.
    up, dn, _lf_phys, _rt_phys = _clamp_shift_fns(gw, w, true_h)

    def lf(a):
        return jnp.where(cols == 0, a, pltpu.roll(a, 1, axis=1))

    def rt(a):
        return jnp.where(cols >= true_w - 1, a,
                         pltpu.roll(a, w - 1, axis=1))
    scale = _F(1.0 / 255.0)
    # u32→f32 casts go through int32 (masked values are ≤ 255).
    r = (v & 0xFF).astype(jnp.int32).astype(jnp.float32) * scale
    g = ((v >> 8) & 0xFF).astype(jnp.int32).astype(jnp.float32) * scale
    b = ((v >> 16) & 0xFF).astype(jnp.int32).astype(jnp.float32) * scale
    from raweditor_tpu.ops.extras import radial_sq

    r2 = radial_sq(true_h, true_w, rows=gw.astype(jnp.float32),
                   cols=cols.astype(jnp.float32))
    r, g, b = extras_core(r, g, b, sharpen, denoise, curve, vignette,
                          r2, up, dn, lf, rt, mixer=mixer,
                          grading=grading, stencils=stencils)

    def qi(c):
        # floor(c·255 + 0.5); f32→u32 goes via int32 (Mosaic cast
        # rule), so quantize to int32 and slice the block rows first.
        return jnp.floor(c * _F(255.0) + _F(0.5)).astype(
            jnp.int32)[4 : 4 + bh]

    rq, gq, bq = qi(r), qi(g), qi(b)
    if output == "rgba":
        return (rq.astype(jnp.uint32) | (gq.astype(jnp.uint32) << 8)
                | (bq.astype(jnp.uint32) << 16)
                | jnp.uint32(0xFF000000))
    # "ycbcr420": JPEG planes straight out of the post-pass — same
    # emission (and ±1 LSB contract) as the develop kernels.
    return _emit_ycbcr420(rq, gq, bq, bh, w)


def _extras_kernel_flat(scal_ref, words_hbm, *refs,
                        block_h: int, steps: int, total: int,
                        img_h: int, width: int, true_h: int,
                        true_w: int, mixer_on: bool = False,
                        grading_on: bool = False,
                        stencils: bool = True, output: str = "rgba"):
    """Double-buffered flat-grid body for the extras post-pass — the
    same window/DMA scheme as _kernel_flat, on u32 words."""
    if output == "rgba":
        out_ref, scratch, sems = refs
    else:  # "ycbcr420": Y plane + interleaved CbCr plane
        out_y, out_c, scratch, sems = refs
    g = pl.program_id(0)
    nimg = g // steps
    i = g % steps
    nwin = block_h + 16

    def window(gg):
        ii = gg % steps
        s0 = jnp.clip(ii * block_h - 8, 0, img_h - nwin)
        s0 = pl.multiple_of(s0, 8)
        return (gg // steps) * img_h + s0, ii * block_h - s0

    def copy_for(gg, slot):
        row0, _ = window(gg)
        return pltpu.make_async_copy(
            words_hbm.at[pl.ds(row0, nwin)], scratch.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        copy_for(g, slot).start()

    @pl.when(g + 1 < total)
    def _():
        copy_for(g + 1, 1 - slot).start()

    copy_for(g, slot).wait()
    _, off = window(g)
    mix = (tuple(scal_ref[nimg, kk] for kk in range(7, 31))
           if mixer_on else None)
    # Grading columns sit after the (optional) mixer block.
    g0 = 7 + (24 if mixer_on else 0)
    grd = (tuple(scal_ref[nimg, kk] for kk in range(g0, g0 + 7))
           if grading_on else None)
    res = _extras_window(scratch[slot], off, i, block_h, width,
                         true_h, true_w, scal_ref[nimg, 0],
                         scal_ref[nimg, 1],
                         tuple(scal_ref[nimg, kk] for kk in range(2, 6)),
                         scal_ref[nimg, 6], mixer=mix, grading=grd,
                         stencils=stencils, output=output)
    if output == "rgba":
        out_ref[0] = res
    else:
        out_y[0] = res[0]
        out_c[0] = res[1]


@functools.partial(jax.jit, static_argnames=("block_h", "interpret",
                                              "output", "stencils",
                                              "_true_hw"))
def pallas_finish_extras_rgba(words, sharpen=0.0, denoise=0.0,
                              curve=(0.0, 0.0, 0.0, 0.0),
                              vignette=0.0,
                              mixer=None,
                              grading=None,
                              block_h: int | None = None,
                              interpret: bool = False,
                              output: str = "rgba",
                              stencils: bool = True,
                              _true_hw=None):
    """Fused finish-extras post-pass: packed-RGBA u32 (H, W) or
    (N, H, W) → same shape/dtype, sharpening + denoise applied
    (ops/extras.py pipeline on the quantized u8 values, mirrored from
    :func:`raweditor_tpu.ops.extras.finish_extras_rgba_words`).

    One HBM round trip regardless of stage count — the XLA in-chain
    execution materializes each composed stencil stage (measured
    12.7 ms on top of develop @24 MP vs ~1 ms here), the same
    pathology that put the 'grad' demosaic in-kernel. Because it runs
    on the develop OUTPUT, it composes with every develop lane,
    including the fused Pallas kernels the in-chain extras can't join.

    ``sharpen``/``denoise`` are traced scalars, or (N,) arrays for
    per-image amounts on batched input. ``mixer`` is None (statically
    off) or the 24 HSL-mixer amounts (ops/mixer.py) as (24,) or
    (N, 24), and ``grading`` None or the 7 color-grading amounts
    (ops/grading.py) as (7,) or (N, 7) — both applied pointwise
    inside the band before the stencil stages; ``stencils=False``
    (static) skips the stencil stages for pointwise-only flushes.
    Quantize-then-filter adds ≤1/255 of input rounding vs the
    in-chain reference — inside the fast lanes' ±1 LSB contract
    (pinned by test)."""
    squeeze = words.ndim == 2
    if squeeze:
        words = words[None]
    n, h, w = words.shape
    th, tw = _true_hw if _true_hw is not None else (h, w)
    if output not in ("rgba", "ycbcr420"):
        raise ValueError(f"unknown output {output!r}")
    if output == "ycbcr420" and (th % 2 or tw % 2):
        raise ValueError("ycbcr420 output requires even H and W")
    sh = jnp.broadcast_to(jnp.asarray(sharpen, jnp.float32), (n,))
    dn = jnp.broadcast_to(jnp.asarray(denoise, jnp.float32), (n,))
    cv = tuple(jnp.broadcast_to(jnp.asarray(c, jnp.float32), (n,))
               for c in curve)
    vg = jnp.broadcast_to(jnp.asarray(vignette, jnp.float32), (n,))
    # HSL mixer (ops/mixer.py): None (statically off — the scal table
    # keeps its 7 columns) or 24 amounts per image, (24,) or (n, 24).
    mx = (None if mixer is None else jnp.broadcast_to(
        jnp.asarray(mixer, jnp.float32), (n, 24)))
    # Color grading (ops/grading.py): None (statically off) or 7
    # amounts per image, appended after the mixer block.
    gr = (None if grading is None else jnp.broadcast_to(
        jnp.asarray(grading, jnp.float32), (n, 7)))

    def _finish(out):
        if output == "ycbcr420":
            return (out[0][0], out[1][0]) if squeeze else out
        return out[0] if squeeze else out

    # Lane alignment: edge-pad the width, slice after. The kernel's
    # shift closures clamp at the TRUE width — pad values are never
    # read by true pixels (see _extras_window).
    wp = -(-w // 128) * 128
    if wp != w:
        out = pallas_finish_extras_rgba(
            jnp.pad(words, ((0, 0), (0, 0), (0, wp - w)), mode="edge"),
            sh, dn, cv, vg, mx, gr, block_h, interpret, output,
            stencils=stencils, _true_hw=(th, tw))
        if output == "ycbcr420":
            return _finish((out[0][:, :, :w], out[1][:, :, :w]))
        return _finish(out[:, :, :w])
    # The band stages hold ~10 live (bh+8, W) f32 planes; bh=64 keeps
    # the live set comfortably inside VMEM at production widths (the
    # grad kernel's cap, same reasoning) AND measured fastest: @24 MP
    # bh=64 runs 1.79 ms vs 2.33 at the natural bh=16 (the (bh+16)/bh
    # window overhead dominates small blocks) and 2.07 at bh=128
    # (live-set pressure). Heights whose largest valid divisor is
    # small therefore run bh=64 with the GRID OVERHANGING the image:
    # the DMA windows already clamp inside it, the true-edge fixups
    # keep real rows exact, and the overhang's garbage rows are
    # sliced off — no jnp.pad pass (a pad of the 96 MB word array
    # costs ~0.6 ms in-program, most of the bh win). Measured @24 MP
    # (4016×6016, whole program incl. the output slice): overhang
    # bh=64 2.05 ms vs natural bh=16 2.33, in-program pad 2.38, and
    # overhang bh=48 2.15.
    bh = block_h or _largest_even_divisor(h, cap=64)
    overhang = 0
    if block_h is None and (bh == 0 or (bh < 32 and h % 128)):
        if h % 8 == 0 and h >= 64 + 16:
            # Overhang needs 8-aligned image heights: the clamped
            # window start s0 = h-80 and the per-image base rows
            # nimg*h must both honor the pl.multiple_of(s0, 8) DMA
            # promise (code-review r3 — false on h % 8 != 0, and
            # invisible under interpret=True where the hint is
            # ignored).
            bh = 64
            overhang = -(-h // bh) * bh - h
        else:
            # Unaligned or tiny heights: edge-pad rows the plain way
            # (the 128-multiple is 8-aligned, so the recursion lands
            # in the natural-divisor path).
            hp = max(-(-h // 128) * 128, 128)
            out = pallas_finish_extras_rgba(
                jnp.pad(words, ((0, 0), (0, hp - h), (0, 0)),
                        mode="edge"),
                sh, dn, cv, vg, mx, gr, block_h, interpret, output,
                stencils=stencils, _true_hw=(th, tw))
            if output == "ycbcr420":
                return _finish((out[0][:, :h], out[1][:, : h // 2]))
            return _finish(out[:, :h])
    if (not bh or (h + overhang) % bh or bh % 8 or h < bh + 16):
        raise ValueError(
            f"H={h} needs a block height that is a multiple of 8, "
            f"divides H, and leaves room for the halo window "
            f"(H >= block_h+16; got {bh}); use the XLA path for this "
            "shape")
    steps = (h + overhang) // bh
    scal = jnp.stack([sh, dn, *cv, vg], axis=1)
    if mx is not None:
        scal = jnp.concatenate([scal, mx], axis=1)
    if gr is not None:
        scal = jnp.concatenate([scal, gr], axis=1)
    flat = words.reshape(n * h, w)
    ho = h + overhang
    if output == "rgba":
        out_specs = pl.BlockSpec((1, bh, w),
                                 lambda g: (g // steps, g % steps, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, ho, w), jnp.uint32)
    else:
        out_specs = [
            pl.BlockSpec((1, bh, w),
                         lambda g: (g // steps, g % steps, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh // 2, w),
                         lambda g: (g // steps, g % steps, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = (jax.ShapeDtypeStruct((n, ho, w), jnp.uint8),
                     jax.ShapeDtypeStruct((n, ho // 2, w), jnp.uint8))
    out = pl.pallas_call(
        functools.partial(_extras_kernel_flat, block_h=bh, steps=steps,
                          total=n * steps, img_h=h, width=w,
                          true_h=th, true_w=tw, mixer_on=mx is not None,
                          grading_on=gr is not None,
                          stencils=stencils, output=output),
        grid=(n * steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, bh + 16, w), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(scal, flat)
    if overhang:
        out = ((out[0][:, :h], out[1][:, : h // 2])
               if output == "ycbcr420" else out[:, :h])
    return _finish(out)
