"""Data-parallel batch develop across the chip mesh.

The TPU replacement for the reference's one-image-at-a-time cache/export
loop (reference: main.rs:481-490, 2036-2071): stack N same-shape mosaics
and their per-image edit parameters, shard the batch axis over the mesh,
and run the fused develop as one SPMD program. Per-image develop is
embarrassingly parallel; the only collectives are the row-halo exchange
(when intra-image row sharding is on) and the per-image histogram
reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raweditor_tpu.ops import demosaic as _demosaic
from raweditor_tpu.ops.develop import (
    apply_edit_stack,
    finish_to_rgba_u32,
    finish_to_u8,
)
from raweditor_tpu.params import EditParams
from raweditor_tpu.parallel.spatial import HALO_DEMOSAICS, develop_block

_F = jnp.float32


def pack_params(params_list) -> EditParams:
    """Stack a list of EditParams into one EditParams of (N,) leaves.

    Local-adjustment masks pack too (per-mask (N,) leaves) when every
    image shares the same mask STRUCTURE (count + kinds) — the batch
    exporter buckets by that signature, so inside one batch this
    always holds; a mixed list is a caller bug and raises."""
    sigs = {tuple(m.kind for m in p.locals) for p in params_list}
    if len(sigs) > 1:
        raise ValueError(
            f"pack_params needs a uniform locals structure, got {sigs}")
    kinds = sigs.pop() if sigs else ()
    extra = {}
    if kinds:
        from raweditor_tpu.ops.local_adjust import (
            _DATA_FIELDS,
            LocalAdjust,
        )

        extra["locals"] = tuple(
            LocalAdjust(kind=k, **{
                f: jnp.asarray(
                    [float(getattr(p.locals[i], f))
                     for p in params_list], dtype=_F)
                for f in _DATA_FIELDS
            })
            for i, k in enumerate(kinds)
        )
    # Point curves pack the same way (per-point (N,) coordinate
    # leaves) when every image has the same point COUNT — the
    # exporter buckets by it; curves may differ per image freely.
    csigs = {len(p.point_curve) for p in params_list}
    if len(csigs) > 1:
        raise ValueError(
            f"pack_params needs a uniform point-curve length, "
            f"got {sorted(csigs)}")
    npts = csigs.pop() if csigs else 0
    if npts:
        extra["point_curve"] = tuple(
            (jnp.asarray([float(p.point_curve[i][0])
                          for p in params_list], dtype=_F),
             jnp.asarray([float(p.point_curve[i][1])
                          for p in params_list], dtype=_F))
            for i in range(npts)
        )
    return EditParams(
        **{
            name: jnp.asarray(
                [float(getattr(p, name)) for p in params_list], dtype=_F
            )
            for name in EditParams.field_names()
        },
        **extra,
    )


def _default_levels(n: int, white_levels, black_levels):
    """Per-image levels with the parity defaults (one definition —
    the same 4-line fill was copy-pasted across every batch entry
    point; code-review r3)."""
    if white_levels is None:
        white_levels = jnp.full((n,), 4096.0, _F)
    if black_levels is None:
        black_levels = jnp.zeros((n,), _F)
    return white_levels, black_levels


def _develop_one(mosaic, params, wb, cm, white_level, black_level,
                 matrix_transpose, rgba=False, cfa_phase=(0, 0),
                 transfer="gamma22", demosaic_method="nearest",
                 extras=False):
    from raweditor_tpu.ops.develop import (_apply_locals, _extras_of,
                                           _normalize, _point_curve_of)

    norm = _normalize(mosaic, white_level, black_level)
    r, g, b = _demosaic.demosaic(norm, demosaic_method, cfa_phase)
    r, g, b = apply_edit_stack(r, g, b, params, wb, cm, matrix_transpose)
    r, g, b = _apply_locals(r, g, b, params, *mosaic.shape)
    ex = _extras_of(params, extras)
    pc = _point_curve_of(params)
    if rgba:
        return finish_to_rgba_u32(r, g, b, transfer=transfer, extras=ex,
                                  point_curve=pc)
    r, g, b = finish_to_u8(r, g, b, transfer=transfer, extras=ex,
                           point_curve=pc)
    return jnp.stack([r, g, b], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("matrix_transpose", "cfa_phase", "transfer",
                              "demosaic_method", "extras")
)
def batch_develop(mosaics, params: EditParams, wb, cam_matrices,
                  white_levels=None, black_levels=None,
                  matrix_transpose: bool = True, cfa_phase=(0, 0),
                  transfer: str = "gamma22",
                  demosaic_method: str = "nearest",
                  extras: bool = False):
    """vmapped batch develop: (N, H, W) u16 → (N, H, W, 3) u8.

    white_levels/black_levels are optional per-image (N,) arrays
    (accurate mode mixes cameras in one batch); defaults are the parity
    constants. Pure data parallelism: place the inputs with a
    ``NamedSharding(mesh, P('batch'))`` and XLA partitions the whole
    program with zero communication.
    """
    n = mosaics.shape[0]
    white_levels, black_levels = _default_levels(
        n, white_levels, black_levels)
    return jax.vmap(
        functools.partial(_develop_one, matrix_transpose=matrix_transpose,
                          cfa_phase=cfa_phase, transfer=transfer,
                          demosaic_method=demosaic_method, extras=extras)
    )(mosaics, params, wb, cam_matrices, white_levels, black_levels)


def _maybe_ycbcr(words, output: str):
    """Fold the JPEG-transport colorspace pass into the develop jit:
    with ``output`` = 'ycbcr420'/'ycbcr444' the packed-RGBA words never
    round-trip through HBM between programs — XLA fuses the conversion
    (and the 4:2:0 box filter's reshape-sum) into the develop output,
    saving a full-image read+write per batch vs the exporter's old
    separate `jax.jit(rgba_words_to_ycbcr420)` pass."""
    if output == "rgba_words":
        return words
    from raweditor_tpu.ops.jpeg import (
        rgba_words_to_ycbcr420,
        rgba_words_to_ycbcr444,
    )

    if output == "ycbcr420":
        return rgba_words_to_ycbcr420(words)
    if output == "ycbcr444":
        return rgba_words_to_ycbcr444(words)
    raise ValueError(f"unknown output {output!r}")


@functools.partial(
    jax.jit, static_argnames=("matrix_transpose", "cfa_phase", "transfer",
                              "demosaic_method", "output", "extras")
)
def batch_develop_rgba(mosaics, params: EditParams, wb, cam_matrices,
                       white_levels=None, black_levels=None,
                       matrix_transpose: bool = True, cfa_phase=(0, 0),
                       transfer: str = "gamma22",
                       demosaic_method: str = "nearest",
                       output: str = "rgba_words",
                       extras: bool = False):
    """batch_develop with packed-RGBA u32 output: (N, H, W) u16 →
    (N, H, W) u32 — the fast path for export (see develop_rgba).
    ``output`` = 'ycbcr420'/'ycbcr444' additionally converts to JPEG
    planes inside the same program (see _maybe_ycbcr)."""
    n = mosaics.shape[0]
    white_levels, black_levels = _default_levels(
        n, white_levels, black_levels)
    return _maybe_ycbcr(jax.vmap(
        functools.partial(
            _develop_one, matrix_transpose=matrix_transpose, rgba=True,
            cfa_phase=cfa_phase, transfer=transfer,
            demosaic_method=demosaic_method, extras=extras,
        )
    )(mosaics, params, wb, cam_matrices, white_levels, black_levels),
        output)


@functools.partial(
    jax.jit, static_argnames=("pattern", "matrix_transpose", "transfer",
                              "demosaic_method", "output", "extras")
)
def batch_develop_xtrans_rgba(mosaics, params: EditParams, wb,
                              cam_matrices, white_levels=None,
                              black_levels=None, pattern: str = None,
                              matrix_transpose: bool = False,
                              transfer: str = "gamma22",
                              demosaic_method: str = "nearest",
                              output: str = "rgba_words",
                              extras: bool = False):
    """Batch develop for X-Trans (generic-CFA) mosaics → packed RGBA.
    Data-parallel only (no row sharding; the 6×6 halo isn't worth the
    complexity for the export path). ``output`` as in
    batch_develop_rgba."""
    from raweditor_tpu.ops.develop import develop_xtrans

    n = mosaics.shape[0]
    white_levels, black_levels = _default_levels(
        n, white_levels, black_levels)
    return _maybe_ycbcr(jax.vmap(
        lambda m, p, w, c, wl, bl: develop_xtrans(
            m, p, w, c, wl, bl, pattern=pattern,
            matrix_transpose=matrix_transpose, transfer=transfer,
            rgba=True, demosaic_method=demosaic_method, extras=extras,
        )
    )(mosaics, params, wb, cam_matrices, white_levels, black_levels),
        output)


@functools.partial(
    jax.jit, static_argnames=("matrix_transpose", "transfer", "output",
                              "extras")
)
def batch_develop_linear_rgba(frames, params: EditParams, wb,
                              cam_matrices, white_levels=None,
                              black_levels=None,
                              matrix_transpose: bool = False,
                              transfer: str = "gamma22",
                              output: str = "rgba_words",
                              extras: bool = False):
    """Batch develop for already-demosaiced LinearRaw frames
    ((N, H, W, 3) u16, DNG photometric 34892) → packed RGBA words.
    ``output`` as in batch_develop_rgba: the JPEG-plane conversion
    fuses into the same program instead of re-reading the RGBA batch
    through HBM as a separate jit pass."""
    from raweditor_tpu.ops.develop import develop_linear

    n = frames.shape[0]
    white_levels, black_levels = _default_levels(
        n, white_levels, black_levels)
    return _maybe_ycbcr(jax.vmap(
        lambda m, p, w, c, wl, bl: develop_linear(
            m, p, w, c, wl, bl, matrix_transpose=matrix_transpose,
            rgba=True, transfer=transfer, extras=extras,
        )
    )(frames, params, wb, cam_matrices, white_levels, black_levels),
        output)


def _sharded_step(mosaics, params, wb, cms, whites, blacks, *, axis_name,
                  matrix_transpose, with_histogram, rgba=False,
                  cfa_phase=(0, 0), transfer="gamma22",
                  demosaic_method="nearest", output="rgba_words"):
    """Per-device body: local (n, h_blk, W) batch of row blocks."""
    imgs = jax.vmap(
        functools.partial(
            develop_block,
            axis_name=axis_name,
            matrix_transpose=matrix_transpose,
            rgba=rgba,
            cfa_phase=cfa_phase,
            transfer=transfer,
            demosaic_method=demosaic_method,
        )
    )(mosaics, params, wb, cms, whites, blacks)
    if output != "rgba_words":
        # JPEG-plane conversion per local row block: shard heights are
        # even (launcher guard: H % 2*n_rows == 0), so no 2×2 chroma
        # box ever crosses a shard boundary — the conversion is
        # collective-free and bit-identical to the single-chip pass.
        assert rgba and not with_histogram  # launcher-enforced
        imgs = _maybe_ycbcr(imgs, output)
    if not with_histogram:
        return imgs
    # Per-image 256-bin histograms of the local row block, reduced over
    # the row shards (XLA psum over ICI). Matches binning the full image.
    def hist_one(img):
        if rgba:
            w = img.astype(jnp.uint32).reshape(-1)
            chans = [w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF]
        else:
            flat = img.astype(jnp.int32).reshape(-1, 3)
            chans = [flat[:, 0], flat[:, 1], flat[:, 2]]

        def one(c):
            return jnp.zeros((256,), jnp.int32).at[c.astype(jnp.int32)].add(1)

        return jnp.stack([one(c) for c in chans])

    hists = jax.vmap(hist_one)(imgs)
    hists = jax.lax.psum(hists, axis_name)
    return imgs, hists


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "batch_axis", "row_axis", "host_axis",
        "matrix_transpose", "with_histogram", "rgba", "cfa_phase",
        "transfer", "demosaic_method", "output",
    ),
)
def batch_develop_sharded(
    mosaics,
    params: EditParams,
    wb,
    cam_matrices,
    mesh: Mesh,
    batch_axis: str = "batch",
    row_axis: str = "row",
    host_axis: str | None = None,
    white_levels=None,
    black_levels=None,
    matrix_transpose: bool = True,
    with_histogram: bool = False,
    rgba: bool = False,
    cfa_phase=(0, 0),
    transfer: str = "gamma22",
    demosaic_method: str = "nearest",
    output: str = "rgba_words",
):
    """The full sharded export step: dp over images × sp over rows.

    mosaics: (N, H, W) u16, N divisible by mesh[batch_axis], H divisible
    by 2*mesh[row_axis]. params/wb/cam_matrices carry a leading (N,)
    axis. Returns (N, H, W, 3) u8 images (and (N, 3, 256) histograms
    when ``with_histogram``), sharded like the inputs.

    ``output`` = 'ycbcr420'/'ycbcr444' (requires ``rgba=True`` and no
    histogram) converts to JPEG planes inside each row shard — shard
    heights are even, so the 4:2:0 chroma box never crosses a shard and
    the conversion stays collective-free (tests guard the compiled HLO).

    ``host_axis`` adds the multi-host (DCN) dimension: images shard
    over host×batch jointly. The row-halo ppermute and the histogram
    psum stay on ``row_axis`` only, so no collective in the step ever
    crosses the DCN boundary — the scaling design SURVEY §2 calls for.
    """
    n_b = mesh.shape[batch_axis]
    n_r = mesh.shape[row_axis]
    if host_axis is not None:
        n_b *= mesh.shape[host_axis]
    bspec = (host_axis, batch_axis) if host_axis is not None else batch_axis
    n, h, _ = mosaics.shape
    if n % n_b:
        raise ValueError(f"batch {n} not divisible by {n_b}")
    if h % (2 * n_r):
        raise ValueError(f"H={h} must be divisible by 2*{n_r}")
    if n_r > 1 and demosaic_method not in HALO_DEMOSAICS:
        # 'grad' reaches ~5 rows; the fixed 2-row halo would corrupt
        # every shard seam (code-review r3, verified empirically) —
        # callers route it data-parallel instead (export.py does).
        raise ValueError(
            f"row-sharded develop supports {HALO_DEMOSAICS}; run "
            f"{demosaic_method!r} on a data-parallel mesh (row=1)")
    white_levels, black_levels = _default_levels(
        n, white_levels, black_levels)

    img_spec = (
        P(bspec, row_axis, None)
        if rgba
        else P(bspec, row_axis, None, None)
    )
    if output != "rgba_words":
        if not rgba or with_histogram:
            raise ValueError(
                "ycbcr outputs require rgba=True and with_histogram=False")
        # (y, cb, cr) planes, each row-sharded like the RGBA words.
        img_spec = (img_spec,) * 3
    out_specs = (
        (img_spec, P(bspec, None, None)) if with_histogram else img_spec
    )
    fn = jax.shard_map(
        functools.partial(
            _sharded_step,
            axis_name=row_axis,
            matrix_transpose=matrix_transpose,
            with_histogram=with_histogram,
            rgba=rgba,
            cfa_phase=cfa_phase,
            transfer=transfer,
            demosaic_method=demosaic_method,
            output=output,
        ),
        mesh=mesh,
        in_specs=(
            P(bspec, row_axis, None),
            P(bspec),
            P(bspec, None),
            P(bspec, None, None),
            P(bspec),
            P(bspec),
        ),
        out_specs=out_specs,
    )
    return fn(mosaics, params, wb, cam_matrices, white_levels, black_levels)


def batch_sharding(mesh: Mesh, batch_axis: str = "batch",
                   row_axis: str | None = "row",
                   host_axis: str | None = None):
    """NamedSharding for staged (N, H, W) mosaics."""
    bspec = (host_axis, batch_axis) if host_axis is not None else batch_axis
    if row_axis is None:
        return NamedSharding(mesh, P(bspec, None, None))
    return NamedSharding(mesh, P(bspec, row_axis, None))
