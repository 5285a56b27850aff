"""NumPy oracle: an independent scalar-math re-implementation of the
reference WGSL develop shader (reference: gpu/shaders.rs:104-267), used
to assert 1-LSB parity of the TPU pipeline. Written deliberately in
per-pixel loop style over small fixtures — clarity over speed, and
structurally different from the production kernels so a shared bug
can't hide in both.
"""

from __future__ import annotations

import numpy as np

F = np.float32


def _load(mosaic_norm, x, y):
    """Clamp-to-edge texel load (reference: gpu/shaders.rs:161-169)."""
    h, w = mosaic_norm.shape
    return mosaic_norm[min(max(y, 0), h - 1), min(max(x, 0), w - 1)]


def debayer_pixel(mosaic_norm, x, y):
    """Nearest-neighbor debayer of one pixel, with the reference's y+1
    CFA phase offset (reference: gpu/shaders.rs:104-158)."""
    v = _load(mosaic_norm, x, y)
    y_eff = y + 1
    even_row = (y_eff % 2) == 0
    even_col = (x % 2) == 0
    if even_row and even_col:  # G (blue row)
        g = v
        b = _load(mosaic_norm, x + 1, y)
        r = _load(mosaic_norm, x, y + 1)
    elif even_row:  # B
        b = v
        g = _load(mosaic_norm, x - 1, y)
        r = _load(mosaic_norm, x - 1, y + 1)
    elif even_col:  # R
        r = v
        g = _load(mosaic_norm, x + 1, y)
        b = _load(mosaic_norm, x, y - 1)
    else:  # G (red row)
        g = v
        r = _load(mosaic_norm, x - 1, y)
        b = _load(mosaic_norm, x, y - 1)
    return np.array([r, g, b], dtype=F)


def edit_stack_pixel(rgb, params, wb, cam_matrix, matrix_transpose=True):
    """Steps 2-9 of the fragment shader on one pixel
    (reference: gpu/shaders.rs:189-257). ``params`` is any object with
    the ten slider attributes."""
    c = rgb.astype(F).copy()
    wb = np.asarray(wb, dtype=F)
    c *= wb[:3]

    temp = F(params.temperature)
    tint = F(params.tint)
    c[0] = c[0] * (F(1.0) + temp * F(0.3))
    c[2] = c[2] * (F(1.0) - temp * F(0.3))
    c[1] = c[1] * (F(1.0) + tint * F(0.3))

    m = np.asarray(cam_matrix, dtype=F).reshape(3, 3)
    if matrix_transpose:
        # WGSL mat3x3(row0, row1, row2) treats the rows as columns
        # (reference: gpu/shaders.rs:209-214): multiply by the transpose.
        m = m.T
    c = (m @ c.astype(F)).astype(F)

    c = c * F(2.0) ** F(params.exposure)

    lum = F(F(0.2126) * c[0] + F(0.7152) * c[1] + F(0.0722) * c[2])
    c = c * (F(1.0) + lum * F(params.highlights))
    c = c * (F(1.0) + (F(1.0) - lum) * F(params.shadows))

    cf = F(1.0) + F(params.contrast) / F(100.0)
    c = (c - F(0.5)) * cf + F(0.5)

    c = (c - F(params.blacks)) / (F(params.whites) - F(params.blacks) + F(0.0001))

    luma = F(F(0.2126) * c[0] + F(0.7152) * c[1] + F(0.0722) * c[2])
    sf = F(1.0) + F(params.saturation) / F(100.0)
    c = luma + (c - luma) * sf

    sat = max(c) - min(c)
    amount = F(params.vibrance) * (F(1.0) - sat)
    luma = F(F(0.2126) * c[0] + F(0.7152) * c[1] + F(0.0722) * c[2])
    c = luma + (c - luma) * (F(1.0) + amount)
    return c.astype(F)


def finish_pixel(c):
    """Gamma + clamp + Rgba8Unorm quantization
    (reference: gpu/shaders.rs:261-264)."""
    c = np.maximum(c.astype(F), F(0.0))
    c = np.power(c, F(1.0 / 2.2))
    c = np.minimum(c, F(1.0))
    return np.floor(c * F(255.0) + F(0.5)).astype(np.uint8)


def develop_image(mosaic_u16, params, wb, cam_matrix, white_level=4096.0,
                  matrix_transpose=True):
    """Full-res oracle develop: (H, W) u16 → (H, W, 3) u8."""
    mosaic_norm = mosaic_u16.astype(F) / F(white_level)
    h, w = mosaic_norm.shape
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            rgb = debayer_pixel(mosaic_norm, x, y)
            rgb = edit_stack_pixel(rgb, params, wb, cam_matrix, matrix_transpose)
            out[y, x] = finish_pixel(rgb)
    return out


def sample_index(i, out_size, full_size, zoom=1.0, pan=0.0):
    """Fragment-center nearest sample index with zoom/pan
    (reference: gpu/shaders.rs:38-56,183-187). Returns (idx, valid)."""
    u = F((i + 0.5) / out_size)
    t = F((u - F(0.5)) / F(zoom) - F(pan) + F(0.5))
    valid = 0.0 <= t <= 1.0
    idx = min(max(int(t * full_size), 0), full_size - 1)
    return idx, valid


def develop_preview(mosaic_u16, params, wb, cam_matrix, out_w, out_h,
                    zoom=1.0, pan_x=0.0, pan_y=0.0, white_level=4096.0,
                    matrix_transpose=True):
    """Preview-path oracle: nearest-sampled render target
    (reference: gpu/pipeline.rs:442-465)."""
    mosaic_norm = mosaic_u16.astype(F) / F(white_level)
    h, w = mosaic_norm.shape
    out = np.zeros((out_h, out_w, 3), dtype=np.uint8)
    for py in range(out_h):
        yi, yok = sample_index(py, out_h, h, zoom, pan_y)
        for px in range(out_w):
            xi, xok = sample_index(px, out_w, w, zoom, pan_x)
            if not (xok and yok):
                continue  # black (reference: gpu/shaders.rs:173-178)
            rgb = debayer_pixel(mosaic_norm, xi, yi)
            rgb = edit_stack_pixel(rgb, params, wb, cam_matrix, matrix_transpose)
            out[py, px] = finish_pixel(rgb)
    return out


def histogram_256(rgb_u8):
    """(3, 256) histogram (reference: gpu/pipeline.rs:720-736)."""
    out = np.zeros((3, 256), dtype=np.int64)
    for ch in range(3):
        vals, counts = np.unique(rgb_u8[..., ch].ravel(), return_counts=True)
        out[ch, vals] = counts
    return out
