"""Render-target sampling math.

The reference renders one full-screen triangle into targets of different
sizes and lets the rasterizer pick nearest texels: each output fragment
at (px, py) has tex coords at the fragment center ((px+0.5)/W_out), the
vertex shader applies zoom/pan (reference: gpu/shaders.rs:36-57), and
the fragment shader truncates ``tex * dims`` to integer full-res pixel
coords (reference: gpu/shaders.rs:183-187), returning black outside
[0, 1] (reference: gpu/shaders.rs:173-178).

We reproduce that exactly so preview/histogram outputs are
bit-identical, while the "resolution tiers" of the reference become
cheap index computations instead of rasterizer passes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def preview_shape(full_w: int, full_h: int, max_width: int = 1280) -> tuple:
    """Preview target size: width-capped, aspect-preserved
    (reference: gpu/pipeline.rs:125-128). Truncating division matches the
    reference's ``as u32`` cast."""
    aspect = full_w / full_h
    out_w = min(full_w, max_width)
    out_h = int(out_w / aspect)
    return out_w, out_h


def histogram_shape(full_w: int, full_h: int, width: int = 128) -> tuple:
    """Histogram target size (reference: gpu/pipeline.rs:131-133)."""
    aspect = full_w / full_h
    return width, int(width / aspect)


def sample_axis(out_size: int, full_size: int, zoom, pan):
    """Per-axis sampled full-res indices and validity mask.

    Computes, for each output pixel center, the zoom/panned tex coord
    t = ((u - 0.5)/zoom - pan + 0.5) with u = (i + 0.5)/out_size
    (reference: gpu/shaders.rs:38-56), the truncated full-res index
    (clamped in-bounds, like wgpu's robust texture access), and the
    in-frame mask (t in [0, 1], reference: gpu/shaders.rs:174-176).

    zoom/pan may be traced scalars — changing them never recompiles.

    Returns:
      (idx int32 (out_size,), valid bool (out_size,))
    """
    u = (jnp.arange(out_size, dtype=jnp.float32) + np.float32(0.5)) / np.float32(
        out_size
    )
    t = (u - np.float32(0.5)) / zoom - pan + np.float32(0.5)
    valid = (t >= 0.0) & (t <= 1.0)
    idx = jnp.clip(
        jnp.floor(t * np.float32(full_size)), 0, full_size - 1
    ).astype(jnp.int32)
    return idx, valid
