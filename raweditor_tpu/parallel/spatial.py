"""Spatial (row-block) sharding of a single mosaic across chips.

The reference never tiles — a 24 MP mosaic must fit one GPU texture
(SURVEY.md §5 "long-context"). The TPU-native analogue of sequence /
context parallelism here is sharding one mosaic's rows across the mesh:
each chip develops a contiguous row block, exchanging one halo row with
each neighbor over ICI (`lax.ppermute`) for the demosaic stencil —
replacing the reference shader's clamp-at-texture-edge with
clamp-at-*global*-edge so output is bit-identical to single-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raweditor_tpu.ops.demosaic import demosaic_nearest_vpadded
from raweditor_tpu.ops.develop import (_normalize, apply_edit_stack,
                                       finish_to_u8)
from raweditor_tpu.params import EditParams

_F = jnp.float32

# Demosaic kernels the fixed-size halo exchange supports: nearest is
# the bit-parity 1-row site table; bilinear/malvar are 5x5 stencils
# fully covered by a 2-row halo. 'grad' is NOT in the set — its
# receptive field (NC radii + radius-2 chroma tent + two 3x3
# refinement passes) reaches ~5 rows, and routing it through the
# 2-row halo produced silently-wrong pixels at every shard seam
# (code-review r3, confirmed empirically). grad runs data-parallel
# instead (export.py routes it like X-Trans).
HALO_DEMOSAICS = ("nearest", "bilinear", "malvar")


def exchange_row_halos(block, axis_name: str, rows: int = 1):
    """Fetch the neighboring shards' boundary rows over ICI.

    Returns (up_halo, down_halo), each (rows, W): the last ``rows`` of
    the previous shard and the first ``rows`` of the next shard. At the
    global top/bottom, the halo repeats the shard's own edge row —
    reproducing the reference's clamp-to-edge load
    (reference: gpu/shaders.rs:161-169) and, for the 5×5 kernels, the
    single-chip edge padding (jnp.pad mode="edge").
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    edge_top = jnp.broadcast_to(block[:1], (rows,) + block.shape[1:])
    edge_bot = jnp.broadcast_to(block[-1:], (rows,) + block.shape[1:])
    if n == 1:
        return edge_top, edge_bot
    # Open-chain permutes: the ring's wraparound pairs ((n-1)->0 and
    # 0->(n-1)) were computed and sent over ICI only to be overwritten
    # by the edge-clamp select below — the chain omits them (ppermute
    # zero-fills non-receivers, which the same select masks), saving
    # two cross-ICI row transfers per exchange (code-review r3).
    # Shift down: shard j receives shard j-1's last rows.
    up = jax.lax.ppermute(
        block[-rows:], axis_name, [(j, j + 1) for j in range(n - 1)]
    )
    # Shift up: shard j receives shard j+1's first rows.
    down = jax.lax.ppermute(
        block[:rows], axis_name, [(j + 1, j) for j in range(n - 1)]
    )
    up = jnp.where(idx == 0, edge_top, up)
    down = jnp.where(idx == n - 1, edge_bot, down)
    return up, down


def develop_block(block_u16, params: EditParams, wb, cam_matrix,
                  white_level=4096.0, black_level=0.0, *,
                  axis_name: str, matrix_transpose: bool = True,
                  rgba: bool = False, cfa_phase=(0, 0),
                  transfer: str = "gamma22",
                  demosaic_method: str = "nearest"):
    """Develop one shard's row block inside a shard_map/collective
    context. Returns (h_block, W, 3) u8, or (h_block, W) u32 packed
    RGBA when ``rgba`` (see ops.develop.finish_to_rgba_u32). The 5×5
    kernels (bilinear via shared taps, malvar) exchange a 2-row halo;
    nearest keeps the bit-parity 1-row site table."""
    from raweditor_tpu.ops.develop import finish_to_rgba_u32

    if demosaic_method not in HALO_DEMOSAICS:
        raise ValueError(
            f"row-sharded develop supports {HALO_DEMOSAICS}; "
            f"{demosaic_method!r} needs a wider view — run it "
            "data-parallel (mesh row=1 or the dp bucket paths)")
    h_block = block_u16.shape[0]
    row_offset = jax.lax.axis_index(axis_name) * h_block
    norm = _normalize(block_u16, white_level, black_level)
    if demosaic_method != "nearest":
        from raweditor_tpu.ops.demosaic import demosaic

        # h_block is even (H divisible by 2*n), so the 2-row padded
        # block keeps the shard's CFA phase; interior outputs never
        # touch the kernel's own edge clamp (their 5×5 windows stay
        # inside the halo), and at the global edges the repeated halo
        # rows equal the single-chip jnp.pad(mode="edge") — sharded
        # output is bit-identical to single-chip.
        up, down = exchange_row_halos(norm, axis_name, rows=2)
        padded = jnp.concatenate([up, norm, down], axis=0)
        r, g, b = demosaic(padded, demosaic_method, cfa_phase)
        r, g, b = (x[2:-2] for x in (r, g, b))
    else:
        up, down = exchange_row_halos(norm, axis_name)
        padded = jnp.concatenate([up, norm, down], axis=0)
        r, g, b = demosaic_nearest_vpadded(padded, row_offset, cfa_phase)
    r, g, b = apply_edit_stack(r, g, b, params, wb, cam_matrix,
                               matrix_transpose)
    # Point curve (ops/curve.py): pointwise, so it shards with the
    # rows for free. Locals/extras need the dp routes (export.py).
    from raweditor_tpu.ops.develop import _point_curve_of

    pc = _point_curve_of(params)
    if rgba:
        return finish_to_rgba_u32(r, g, b, transfer=transfer,
                                  point_curve=pc)
    r, g, b = finish_to_u8(r, g, b, transfer=transfer, point_curve=pc)
    return jnp.stack([r, g, b], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis_name", "matrix_transpose", "rgba",
                     "cfa_phase", "transfer", "demosaic_method"),
)
def spatial_develop(mosaic, params: EditParams, wb, cam_matrix,
                    mesh: Mesh, axis_name: str = "row",
                    white_level: float = 4096.0,
                    black_level: float = 0.0,
                    matrix_transpose: bool = True,
                    rgba: bool = False,
                    cfa_phase=(0, 0),
                    transfer: str = "gamma22",
                    demosaic_method: str = "nearest"):
    """Row-sharded full-resolution develop of one mosaic.

    mosaic: (H, W) u16 with H divisible by 2 * mesh axis size (keeps CFA
    phase uniform across shards). Output (H, W, 3) u8 (or (H, W) u32
    packed RGBA with ``rgba``), row-sharded. Forwards every
    develop_block capability — black level, CFA phase, transfer,
    demosaic kernel (see HALO_DEMOSAICS), packed output — the exported
    API previously hardcoded parity defaults (code-review r3).
    """
    n = mesh.shape[axis_name]
    h = mosaic.shape[0]
    if h % (2 * n):
        raise ValueError(f"H={h} must be divisible by 2*{n} row shards")

    fn = jax.shard_map(
        functools.partial(
            develop_block,
            axis_name=axis_name,
            white_level=white_level,
            black_level=black_level,
            matrix_transpose=matrix_transpose,
            rgba=rgba,
            cfa_phase=cfa_phase,
            transfer=transfer,
            demosaic_method=demosaic_method,
        ),
        mesh=mesh,
        in_specs=(P(axis_name, None), P(), P(), P()),
        out_specs=(P(axis_name, None)
                   if rgba else P(axis_name, None, None)),
    )
    return fn(mosaic, params, wb, cam_matrix)
