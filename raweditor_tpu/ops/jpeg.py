"""Device-side JPEG color plumbing: RGBA → JFIF YCbCr 4:2:0 planes.

The batch exporter's device→host transfer carries 4 bytes/pixel of
packed RGBA (the Rgba8Unorm readback the reference does,
reference: gpu/pipeline.rs:551-560). For JPEG output that is wasteful
twice over: the encoder immediately converts to YCbCr and throws away
3/4 of the chroma samples (4:2:0 — PIL/libjpeg's own default below
quality 95). Doing the conversion + subsample ON the TPU — a fused
elementwise pass plus a 2×2 mean, both HBM-bound and fused by XLA —
cuts the transfer to 1.5 bytes/pixel (2.67×) and hands the host
encoder (native/rawkit.cpp encode_jpeg_420) exactly the planes it
needs, skipping the host-side colorspace pass entirely.

Color math is the JFIF full-range BT.601 forward transform; the chroma
planes are box-filtered 2×2 before quantization (what libjpeg's
default h2v2 downsampler does). Even dimensions are required — the
exporter falls back to the RGBA path for odd-sized frames.
"""

from __future__ import annotations

import numpy as np


def _rgb_to_ycbcr(words):
    """Packed-RGBA u32 → float (y, cb, cr), the JFIF full-range BT.601
    forward transform. One copy of the 9 coefficients so the 4:2:0 and
    4:4:4 paths can never drift apart."""
    import jax.numpy as jnp

    r = (words & 0xFF).astype(jnp.float32)
    g = ((words >> 8) & 0xFF).astype(jnp.float32)
    b = ((words >> 16) & 0xFF).astype(jnp.float32)
    y = (np.float32(0.299) * r + np.float32(0.587) * g
         + np.float32(0.114) * b)
    cb = (np.float32(128.0) - np.float32(0.168735892) * r
          - np.float32(0.331264108) * g + np.float32(0.5) * b)
    cr = (np.float32(128.0) + np.float32(0.5) * r
          - np.float32(0.418687589) * g - np.float32(0.081312411) * b)
    return y, cb, cr


def _quantize_u8(p):
    import jax.numpy as jnp

    return jnp.clip(jnp.round(p), 0.0, 255.0).astype(jnp.uint8)


def _box2(p):
    s = p.shape
    p = p.reshape(s[:-2] + (s[-2] // 2, 2, s[-1] // 2, 2))
    return (p.sum(axis=(-3, -1)) * np.float32(0.25))


def rgba_words_to_ycbcr420(words):
    """Packed-RGBA u32 (..., H, W) → (Y u8 (..., H, W),
    Cb u8 (..., H/2, W/2), Cr u8 (..., H/2, W/2))."""
    h, w = words.shape[-2], words.shape[-1]
    if h % 2 or w % 2:
        raise ValueError("ycbcr420 requires even dimensions")
    y, cb, cr = _rgb_to_ycbcr(words)
    return _quantize_u8(y), _quantize_u8(_box2(cb)), \
        _quantize_u8(_box2(cr))


def rgb_u8_to_ycbcr420(img):
    """(H, W, 3) u8 RGB → (Y, Cb/2, Cr/2) u8 planes — the same
    transform as the packed-words path (one coefficient source,
    _rgb_to_ycbcr), entered from channel-last u8 instead. Used by the
    preview frame path: converting + subsampling on device cuts the
    preview fetch from 3 to 1.5 B/px before the native encoder."""
    import jax.numpy as jnp

    h, w = img.shape[0], img.shape[1]
    if h % 2 or w % 2:
        raise ValueError("ycbcr420 requires even dimensions")
    r = img[..., 0].astype(jnp.float32)
    g = img[..., 1].astype(jnp.float32)
    b = img[..., 2].astype(jnp.float32)
    # Pack into the words layout the shared transform reads. Cheaper
    # than duplicating the coefficients: one u32 pack, fused by XLA.
    words = (r.astype(jnp.uint32)
             | (g.astype(jnp.uint32) << 8)
             | (b.astype(jnp.uint32) << 16))
    y, cb, cr = _rgb_to_ycbcr(words)
    return _quantize_u8(y), _quantize_u8(_box2(cb)), \
        _quantize_u8(_box2(cr))


def rgba_words_to_ycbcr444(words):
    """Packed-RGBA u32 (..., H, W) → full-resolution (Y, Cb, Cr) u8
    planes (no chroma subsampling — the `--chroma 444` export mode;
    3 bytes/pixel across the link instead of 1.5, still under RGBA's
    4). Same JFIF BT.601 transform as the 4:2:0 path, minus the box
    filter; any dimensions (the 4:2:0 even-dims restriction doesn't
    apply)."""
    y, cb, cr = _rgb_to_ycbcr(words)
    return _quantize_u8(y), _quantize_u8(cb), _quantize_u8(cr)
