"""Clipped-highlight reconstruction (pre-demosaic, mosaic domain).

The capability dcraw ships as ``-H`` and Lightroom as highlight
"recovery" — absent from the reference editor (its WGSL chain clamps
and moves on, reference: gpu/shaders.rs:104-267): when a sensor
channel clips at the white level, its true value is estimated from the
unclipped channels. Green is the most sensitive channel, so it clips
first and bright neutral highlights turn magenta (G deficit after
white balance); reconstruction raises the clipped channel to the
WB-consistent neutral estimate and the cast disappears, extending
usable dynamic range by however far the other channels kept recording.

Design points, TPU-first:

- **Mosaic domain.** Reconstruction runs on the (H, W) u16 mosaic
  BEFORE demosaic: clipped sites never contaminate interpolation, and
  no develop-path signature changes — engines and exporters swap the
  mosaic for the reconstructed one when the slider is active, and the
  AOT/jit/Pallas develop programs are untouched (same shape/dtype).
- **Estimate.** A clipped site of channel c with pre-WB normalized
  value v is replaced by ``max(v, mean over unclipped channels u of
  v_u * wb_u / wb_c)`` — the value a NEUTRAL highlight would have
  (post-WB all channels equal). Channel neighborhoods come from the
  existing nearest-neighbor demosaic (one extra fused elementwise
  pass). Raise-only: reconstruction can never darken.
- **Exact passthrough.** Unclipped sites (and everything at amount 0)
  return the ORIGINAL u16 values — a jnp.where against the input
  mosaic, so inactive images in a batched program stay bit-exact.
- **Per-image traced scalars.** amount / wb / white / black are
  traced, so slider drags and per-image batch values never recompile;
  only the CFA layout (phase / X-Trans pattern) is static.

The estimate can exceed the white level (that is the point); the
output is renormalized into u16 with a cap at 65535, and the develop
chain's later normalization carries values above 1.0 into the post-WB
space where the tone pipeline clamps them like any bright pixel.
"""

from __future__ import annotations

import numpy as np

#: Sites at or above this fraction of the white level count as
#: sensor-clipped. 0.96 absorbs pre-clip nonlinearity and the lossy
#: codecs' near-white quantization.
CLIP_FRACTION = 0.96


def _site_channel_masks(h, w, cfa_phase, xtrans_pattern):
    """Boolean (H, W) masks (is_r, is_g, is_b) of each site's own
    channel for the given CFA layout."""
    import jax.numpy as jnp

    if xtrans_pattern is not None:
        from raweditor_tpu.ops.cfa_generic import channel_grid

        grid = channel_grid(xtrans_pattern)
        yy = jnp.arange(h, dtype=jnp.int32)[:, None] % 6
        xx = jnp.arange(w, dtype=jnp.int32)[None, :] % 6
        # iota-compare selects (no gather): 6x6 distinct values.
        idx = jnp.zeros((h, w), jnp.int32)
        for r in range(6):
            for c in range(6):
                idx = jnp.where((yy == r) & (xx == c),
                                np.int32(grid[r, c]), idx)
        return idx == 0, idx == 1, idx == 2
    py, px = cfa_phase
    ye = ((jnp.arange(h, dtype=jnp.int32)[:, None] + py) % 2) == 0
    xe = ((jnp.arange(w, dtype=jnp.int32)[None, :] + px) % 2) == 0
    is_r = ye & xe
    is_b = (~ye) & (~xe)
    return is_r, ~(is_r | is_b), is_b


def reconstruct_mosaic_highlights(mosaic, wb, amount,
                                  white_level=4096.0, black_level=0.0,
                                  cfa_phase=(0, 0), xtrans_pattern=None,
                                  clip=CLIP_FRACTION):
    """(H, W) u16 mosaic → u16 mosaic with sensor-clipped sites
    reconstructed; unclipped sites pass through bit-exactly.

    ``wb`` is the (3,)- or (4,)-vector of green-normalized WB gains
    (G2 ignored); ``amount`` 0–100 blends the estimate in. All of
    amount/wb/white/black may be traced scalars.
    """
    import jax.numpy as jnp

    f32 = jnp.float32
    h, w = mosaic.shape
    white = jnp.asarray(white_level, f32)
    black = jnp.asarray(black_level, f32)
    scale = jnp.maximum(white - black, f32(1.0))
    norm = (mosaic.astype(f32) - black) / scale

    if xtrans_pattern is not None:
        from raweditor_tpu.ops.cfa_generic import demosaic_xtrans

        planes = list(demosaic_xtrans(norm, xtrans_pattern))
    else:
        from raweditor_tpu.ops.demosaic import demosaic_nearest

        planes = list(demosaic_nearest(norm, cfa_phase))

    wbv = jnp.asarray(wb, f32).reshape(-1)[:3]
    clipped = [p >= clip for p in planes]
    ests, cnts = [], []
    for c in range(3):
        num = jnp.zeros_like(planes[c])
        cnt = jnp.zeros_like(planes[c])
        for u in range(3):
            if u == c:
                continue
            unc = ~clipped[u]
            num = num + jnp.where(unc, planes[u] * wbv[u], f32(0.0))
            cnt = cnt + unc.astype(f32)
        ests.append(num / (jnp.maximum(cnt, f32(1.0)) * wbv[c]))
        cnts.append(cnt)

    is_r, is_g, is_b = _site_channel_masks(h, w, cfa_phase,
                                           xtrans_pattern)
    est = jnp.where(is_r, ests[0], jnp.where(is_b, ests[2], ests[1]))
    cnt = jnp.where(is_r, cnts[0], jnp.where(is_b, cnts[2], cnts[1]))

    site_clip = norm >= clip
    active = site_clip & (cnt > 0)
    recon = jnp.where(active, jnp.maximum(norm, est), norm)
    out_norm = norm + (jnp.asarray(amount, f32) / f32(100.0)) \
        * (recon - norm)
    out = jnp.clip(jnp.round(out_norm * scale + black), 0.0, 65535.0)
    changed = active & (jnp.asarray(amount, f32) > 0)
    return jnp.where(changed, out.astype(jnp.uint16), mosaic)


def reconstruct_linear_highlights(frame, wb, amount,
                                  white_level=4096.0, black_level=0.0,
                                  clip=CLIP_FRACTION):
    """The (H, W, 3) u16 LinearRaw variant: same estimate per pixel,
    no demosaic needed (channels are co-sited)."""
    import jax.numpy as jnp

    f32 = jnp.float32
    white = jnp.asarray(white_level, f32)
    black = jnp.asarray(black_level, f32)
    scale = jnp.maximum(white - black, f32(1.0))
    norm = (frame.astype(f32) - black) / scale
    wbv = jnp.asarray(wb, f32).reshape(-1)[:3]
    clipped = norm >= clip
    outs = []
    for c in range(3):
        num = jnp.zeros_like(norm[..., 0])
        cnt = jnp.zeros_like(norm[..., 0])
        for u in range(3):
            if u == c:
                continue
            unc = ~clipped[..., u]
            num = num + jnp.where(unc, norm[..., u] * wbv[u], f32(0.0))
            cnt = cnt + unc.astype(f32)
        est = num / (jnp.maximum(cnt, f32(1.0)) * wbv[c])
        active = clipped[..., c] & (cnt > 0)
        recon = jnp.where(active, jnp.maximum(norm[..., c], est),
                          norm[..., c])
        out_n = norm[..., c] + (jnp.asarray(amount, f32) / f32(100.0)) \
            * (recon - norm[..., c])
        out = jnp.clip(jnp.round(out_n * scale + black), 0.0, 65535.0)
        changed = active & (jnp.asarray(amount, f32) > 0)
        outs.append(jnp.where(changed, out.astype(jnp.uint16),
                              frame[..., c]))
    return jnp.stack(outs, axis=-1)


def _make_jits():
    """Module-level jitted wrappers (one compile per shape + CFA
    layout; amount/wb/levels traced — slider drags never recompile)."""
    import jax

    return (
        jax.jit(reconstruct_mosaic_highlights,
                static_argnames=("cfa_phase", "xtrans_pattern", "clip")),
        jax.jit(reconstruct_linear_highlights,
                static_argnames=("clip",)),
    )


_HL_JIT_MOSAIC, _HL_JIT_LINEAR = _make_jits()


def batch_reconstruct_mosaic(mosaics, wbs, amounts, whites, blacks,
                             cfa_phase=(0, 0), xtrans_pattern=None,
                             clip=CLIP_FRACTION):
    """(N, H, W) batched form for the exporter: per-image traced
    wb/amount/levels, one compiled program per (shape, CFA layout).
    Zero-amount images pass through bit-exactly (the where against
    the input), so a mixed batch needs no bucket split."""
    import jax

    def one(m, w, a, wh, bl):
        return reconstruct_mosaic_highlights(
            m, w, a, wh, bl, cfa_phase=cfa_phase,
            xtrans_pattern=xtrans_pattern, clip=clip)

    return jax.vmap(one)(mosaics, wbs, amounts, whites, blacks)


def batch_reconstruct_linear(frames, wbs, amounts, whites, blacks,
                             clip=CLIP_FRACTION):
    """(N, H, W, 3) LinearRaw batched form."""
    import jax

    def one(f, w, a, wh, bl):
        return reconstruct_linear_highlights(f, w, a, wh, bl, clip=clip)

    return jax.vmap(one)(frames, wbs, amounts, whites, blacks)


def _make_batch_jits():
    import jax

    return (
        jax.jit(batch_reconstruct_mosaic,
                static_argnames=("cfa_phase", "xtrans_pattern", "clip")),
        jax.jit(batch_reconstruct_linear, static_argnames=("clip",)),
    )


_HL_JIT_BATCH_MOSAIC, _HL_JIT_BATCH_LINEAR = _make_batch_jits()
