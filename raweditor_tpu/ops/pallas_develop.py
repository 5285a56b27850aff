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
- Row blocks are DMA'd HBM→VMEM with a 1-row halo (the mosaic is
  edge-padded by one row in the prologue); x-neighbors come from lane
  rolls with edge-column fixups, replicating clamp-to-edge
  (reference: gpu/shaders.rs:161-169).

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
# single source of truth shared with the XLA fast transfers).
from raweditor_tpu.color import GAMMA22_POLY as _GAMMA_POLY
from raweditor_tpu.color import SRGB_POLY as _SRGB_POLY


def _largest_even_divisor(h: int, cap: int = 128) -> int:
    """Largest block height that divides h, is a multiple of 8 (VMEM
    row-tiling), and is ≤ cap. 0 when none exists (caller falls back)."""
    best = 0
    for d in range(8, cap + 1, 8):
        if h % d == 0:
            best = d
    return best


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


def _demosaic_smooth_taps(v_all, center, up, down, left, right, sc, i,
                          bh, w, cfa_phase, method: str):
    """In-kernel bilinear / Malvar–He–Cutler demosaic. Mirrors
    ops/demosaic.py exactly (the tap tables are imported from there —
    single source of truth); clamp-to-edge comes from the padded
    mosaic rows and the replicated edge columns in _shift_x."""
    from raweditor_tpu.ops.demosaic import _bilinear_taps, _malvar_taps

    n = bh + 8
    taps = {(0, 0): center, (0, -1): left, (0, 1): right,
            (-1, 0): up, (1, 0): down,
            (-1, -1): _shift_x(up, 1, up[:, 0:1]),
            (-1, 1): _shift_x(up, -1, up[:, w - 1 : w]),
            (1, -1): _shift_x(down, 1, down[:, 0:1]),
            (1, 1): _shift_x(down, -1, down[:, w - 1 : w])}
    if method == "malvar":
        taps[(-2, 0)] = v_all[0:bh, :]
        taps[(2, 0)] = pltpu.roll(v_all, n - 4, axis=0)[0:bh, :]
        taps[(0, -2)] = _shift_x(center, 1, center[:, 0:1], dist=2)
        taps[(0, 2)] = _shift_x(center, -1, center[:, w - 1 : w], dist=2)

    def conv(tdict):
        acc = None
        for off, wgt in tdict.items():
            t = taps[off] * _F(wgt)
            acc = t if acc is None else acc + t
        return acc

    row0 = i * bh + cfa_phase[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1) + cfa_phase[1]
    ye = (rows % 2) == 0
    xe = (cols % 2) == 0
    v = center

    if method == "bilinear":
        _cross, hmean, vmean, plus, diag = _bilinear_taps()
        hm, vm, pm, dm = conv(hmean), conv(vmean), conv(plus), conv(diag)
        r = jnp.where(ye, jnp.where(xe, v, hm), jnp.where(xe, vm, dm))
        g = jnp.where(ye == xe, pm, v)
        b = jnp.where(ye, jnp.where(xe, dm, vm), jnp.where(xe, hm, v))
        return r, g, b

    g_cross, rb_row, rb_col, rb_diag = _malvar_taps()
    gc, kr, kc, kd = conv(g_cross), conv(rb_row), conv(rb_col), conv(rb_diag)
    r = jnp.where(ye, jnp.where(xe, v, kr), jnp.where(xe, kc, kd))
    g = jnp.where(ye == xe, gc, v)
    b = jnp.where(ye, jnp.where(xe, kd, kc), jnp.where(xe, kr, v))
    # The gradient correction can undershoot on hard edges; the XLA
    # path clamps the normalized value at 0, which in this kernel's
    # pre-black-fold units is the black level (sc(19) = black*s).
    floor = sc(19)
    return (jnp.maximum(r, floor), jnp.maximum(g, floor),
            jnp.maximum(b, floor))


def _develop_block(sc, scratch, i, block_h, cfa_phase, gamma,
                   pattern=None, demosaic: str = "nearest"):
    """Shared kernel body: develop one (block_h+8, W) scratch window.
    ``sc`` maps a folded-scalar index to its value; ``i`` is the block's
    row-grid index; ``pattern`` switches the demosaic from the Bayer
    parity stencil to a generic repeating-CFA nearest-site table (all
    X-Trans nearest offsets are within ±1, so the same five taps serve
    both). ``demosaic`` picks the Bayer stencil: "nearest" (parity
    path, reference: gpu/shaders.rs:104-158), "bilinear", or "malvar"
    (the 5×5 gradient-corrected kernels — the scratch window's 2-row
    halo covers them; see ops/demosaic.py for the tap tables, which
    this mirrors exactly). Returns the (block_h, W) packed-RGBA u32
    block."""
    s = sc(12)
    # Mosaic can't cast u16→f32 directly; widen through int32.
    v_all = scratch[:].astype(jnp.int32).astype(jnp.float32) * s
    bh = block_h
    w = v_all.shape[1]
    n = bh + 8
    # Unaligned row slices of VMEM are not allowed (8-row tiling), so
    # the scratch is an 8-row-padded window (2 halo rows above, ≥2
    # below) and we realign with circular sublane rolls, taking the
    # leading bh rows: after roll(n-2) row j holds original row j+2
    # (the block rows); roll(n-1) gives the up neighbors, roll(n-3)
    # the down neighbors, and so on for the ±2 taps.
    center = pltpu.roll(v_all, n - 2, axis=0)[0:bh, :]
    up = pltpu.roll(v_all, n - 1, axis=0)[0:bh, :]
    down = pltpu.roll(v_all, n - 3, axis=0)[0:bh, :]
    left = _shift_x(center, 1, center[:, 0:1])
    right = _shift_x(center, -1, center[:, w - 1 : w])

    if pattern is None and demosaic in ("bilinear", "malvar"):
        r, g, b = _demosaic_smooth_taps(
            v_all, center, up, down, left, right, sc, i, bh, w,
            cfa_phase, demosaic,
        )
    elif pattern is None:
        downleft = _shift_x(down, 1, down[:, 0:1])
        # CFA parity in global coordinates (the y+1 offset is folded
        # into the site table, see ops/demosaic.py).
        row0 = i * bh + cfa_phase[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0) + row0
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
        rows = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0) + i * bh
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

    # Transfer curve, clamp, quantize, pack RGBA.
    def q(c):
        c = jnp.maximum(c, 0.0)
        if gamma == "poly":
            sq = jnp.sqrt(jnp.sqrt(jnp.minimum(c, 1.0)))
            acc = _GAMMA_POLY[0]
            for k in _GAMMA_POLY[1:]:
                acc = acc * sq + k
            c = acc
        elif gamma == "srgb":
            # IEC 61966-2-1 piecewise encode (matches color.srgb_encode).
            c = jnp.minimum(c, 1.0)
            lo = c * _F(12.92)
            hi = _F(1.055) * jnp.power(c, _F(1.0 / 2.4)) - _F(0.055)
            c = jnp.where(c <= _F(0.0031308), lo, hi)
        elif gamma == "srgb_poly":
            # Fast sRGB (matches color.srgb_poly_encode): exact linear
            # segment, polynomial pow branch.
            c = jnp.minimum(c, 1.0)
            sq = jnp.sqrt(jnp.sqrt(c))
            acc = _SRGB_POLY[0]
            for k in _SRGB_POLY[1:]:
                acc = acc * sq + k
            c = jnp.where(c <= _F(0.0031308), c * _F(12.92), acc)
        else:
            c = jnp.power(c, _F(1.0 / 2.2))
        c = jnp.minimum(c, 1.0)
        # f32→u32 unsupported in Mosaic; go through int32 (values 0..255).
        return jnp.floor(c * 255.0 + 0.5).astype(jnp.int32).astype(jnp.uint32)

    return q(r) | (q(g) << 8) | (q(b) << 16) | jnp.uint32(0xFF000000)


def _kernel_flat(scal_ref, pad_hbm, out_ref, scratch, sems, *,
                 block_h: int, steps: int, total: int, stride: int,
                 cfa_phase=(0, 0), gamma: str = "pow", pattern=None,
                 demosaic: str = "nearest"):
    """Double-buffered unified kernel body. The grid is flat over
    (image, row-block) pairs; ``pad_hbm`` is the per-image 8-row-padded
    mosaics reshaped to one (N*(H+8), W) plane (``stride`` = H+8). The
    DMA for step g+1 is issued before step g's compute so the HBM read
    rides under the VPU work (the serial start();wait() form measured
    ~2 µs/step of exposed DMA latency at 24 MP — ~20% of the kernel)."""
    g = pl.program_id(0)
    nimg = g // steps
    i = g % steps

    def copy_for(gg, slot):
        row0 = (gg // steps) * stride + (gg % steps) * block_h
        return pltpu.make_async_copy(
            pad_hbm.at[pl.ds(row0, block_h + 8)],
            scratch.at[slot], sems.at[slot],
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        copy_for(g, slot).start()

    @pl.when(g + 1 < total)
    def _():
        copy_for(g + 1, 1 - slot).start()

    copy_for(g, slot).wait()
    out_ref[0] = _develop_block(lambda k: scal_ref[nimg, k],
                                scratch.at[slot], i, block_h, cfa_phase,
                                gamma, pattern, demosaic)


def _launch_flat(scal2d, mosaics, n, h, w, bh, cfa_phase, gamma, pattern,
                 demosaic, interpret):
    """Shared pallas_call site: per-image 8-row edge pad (2 halo rows
    above, 6 below to keep every DMA window 8-row aligned), flattened
    to one plane so each DMA window is a plain 2-D row slice."""
    steps = h // bh
    stride = h + 8
    padded = jnp.pad(mosaics, ((0, 0), (2, 6), (0, 0)), mode="edge")
    padded = padded.reshape(n * stride, w)
    return pl.pallas_call(
        functools.partial(_kernel_flat, block_h=bh, steps=steps,
                          total=n * steps, stride=stride,
                          cfa_phase=cfa_phase, gamma=gamma,
                          pattern=pattern, demosaic=demosaic),
        grid=(n * steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, bh, w),
                               lambda g: (g // steps, g % steps, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 8, w), jnp.uint16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(scal2d, padded)


@functools.partial(
    jax.jit, static_argnames=("matrix_transpose", "block_h", "interpret",
                              "cfa_phase", "gamma", "pattern", "demosaic")
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
):
    """Batched fused-kernel develop: (N, H, W) u16 → (N, H, W) u32.

    The batch dimension becomes the leading grid axis (one DMA + develop
    per (image, row-block)); per-image folded scalars live as an (N, 24)
    SMEM table. ``params``/``wbs``/``cam_matrices`` carry a leading (N,)
    axis (see parallel.batch.pack_params). Same ±1 LSB contract as
    :func:`pallas_develop_rgba`.
    """
    n, h, w = mosaics.shape
    if pattern is not None and demosaic != "nearest":
        raise ValueError(
            "generic-CFA patterns support nearest demosaic only"
        )
    bh = block_h or _largest_even_divisor(h)
    if block_h is None and bh == 0:
        hp = -(-h // 128) * 128  # see pallas_develop_rgba: no divisor
        if hp != h:
            out = pallas_batch_develop_rgba(
                jnp.pad(mosaics, ((0, 0), (0, hp - h), (0, 0)),
                        mode="edge"),
                params, wbs, cam_matrices, white_levels, black_levels,
                matrix_transpose, block_h, interpret, cfa_phase, gamma,
                pattern, demosaic,
            )
            return out[:, :h]
    if not bh or h % bh or bh % 8:
        raise ValueError(
            f"H={h} needs a block height that is a multiple of 8 and "
            f"divides H (got {bh}); use the XLA path for this shape"
        )
    wp = -(-w // 128) * 128
    if wp != w:  # see pallas_develop_rgba: lane alignment via edge pad
        out = pallas_batch_develop_rgba(
            jnp.pad(mosaics, ((0, 0), (0, 0), (0, wp - w)), mode="edge"),
            params, wbs, cam_matrices, white_levels, black_levels,
            matrix_transpose, block_h, interpret, cfa_phase, gamma,
            pattern, demosaic,
        )
        return out[:, :, :w]
    if white_levels is None:
        white_levels = jnp.full((n,), 4096.0, jnp.float32)
    if black_levels is None:
        black_levels = jnp.zeros((n,), jnp.float32)
    scal = jax.vmap(
        functools.partial(_fold_scalars, matrix_transpose=matrix_transpose)
    )(params, wbs, cam_matrices, white_levels, black_levels)
    return _launch_flat(scal, mosaics, n, h, w, bh, cfa_phase, gamma,
                        pattern, demosaic, interpret)


@functools.partial(
    jax.jit, static_argnames=("matrix_transpose", "block_h", "interpret",
                              "cfa_phase", "gamma", "pattern", "demosaic")
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
):
    """Fused-kernel full develop: (H, W) u16 → (H, W) u32 packed RGBA.
    ``pattern`` switches to the generic repeating-CFA site table
    (X-Trans et al; nearest offsets must be within ±1). ``demosaic``
    picks the Bayer stencil ("nearest"/"bilinear"/"malvar") — the
    accurate-mode lane runs fully in-kernel."""
    h, w = mosaic.shape
    if pattern is not None and demosaic != "nearest":
        raise ValueError(
            "generic-CFA patterns support nearest demosaic only"
        )
    bh = block_h or _largest_even_divisor(h)
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
                pattern, demosaic,
            )
            return out[:h]
    if not bh or h % bh or bh % 8:
        raise ValueError(
            f"H={h} needs a block height that is a multiple of 8 and "
            f"divides H (got {bh}); use the XLA path for this shape"
        )
    # Mosaic requires lane-dimension slices to be 128-aligned; widths
    # that aren't are edge-padded up front (the clone column makes the
    # lane rolls reproduce clamp-to-edge exactly) and sliced after.
    wp = -(-w // 128) * 128
    if wp != w:
        out = pallas_develop_rgba(
            jnp.pad(mosaic, ((0, 0), (0, wp - w)), mode="edge"),
            params, wb, cam_matrix, white_level, black_level,
            matrix_transpose, block_h, interpret, cfa_phase, gamma,
            pattern, demosaic,
        )
        return out[:, :w]
    scal = _fold_scalars(params, wb, cam_matrix, white_level, black_level,
                         matrix_transpose)
    return _launch_flat(scal[None], mosaic[None], 1, h, w, bh, cfa_phase,
                        gamma, pattern, demosaic, interpret)[0]
