"""Host↔device transport staging helpers.

The batch exporter stages decoded mosaics to HBM from its decode
workers (pipeline/export.py). For 12-bit sensors — the dominant depth
— the staging buffer is bit-packed on the host to 1.5 bytes/pixel and
unpacked on device by a fused elementwise pass, cutting the H2D leg
25% (material on bandwidth-starved links; free on PCIe since the pack
runs in the GIL-released decode worker).
"""

from __future__ import annotations

import numpy as np


def _check_packable(m: np.ndarray, bits: int, align: int,
                    peak=None) -> None:
    """Enforce the documented pack preconditions — out-of-range samples
    would otherwise wrap silently on the u8 assignment and reconstruct
    as different pixels on device (code-review r3). ``peak`` lets a
    caller that already scanned the mosaic (the exporter picks the pack
    format from it) skip the second full-memory pass — it matters on
    single-core hosts where the decode thread shares the core."""
    if m.ndim != 2 or m.shape[1] % align:
        raise ValueError(
            f"pack{bits}_rows needs a 2-D mosaic with width % {align}"
            f" == 0, got {m.shape}")
    if peak is None:
        peak = m.max() if m.size else 0
    if int(peak) >= (1 << bits):
        raise ValueError(
            f"pack{bits}_rows: sample >= 2^{bits} would wrap")


def _native_pack(m: np.ndarray, attr: str):
    """C++ pack (GIL-released; ~15x the numpy path on 24 MP — decode
    workers keep streaming instead of serializing on a 200 ms
    GIL-held numpy pass). None if the extension is unavailable."""
    from raweditor_tpu.native import get_rawkit

    rk = get_rawkit()
    if rk is None or not hasattr(rk, attr):
        return None
    h, w = m.shape
    m = np.ascontiguousarray(m, dtype=np.uint16)
    packed = getattr(rk, attr)(m, h, w)
    return np.frombuffer(packed, np.uint8).reshape(h, -1)


def pack12_rows(mosaic, peak=None):
    """Host-side: (H, W) u16 with samples < 4096 and even W → a
    (H, W//2*3) u8 buffer, two samples per three bytes. Cuts the
    host→device staging of 12-bit mosaics (the dominant sensor depth)
    by 25%; :func:`unpack12_rows` inverts it on device. ``peak``:
    optional precomputed ``mosaic.max()`` (skips the range re-scan)."""
    m = np.asarray(mosaic)
    _check_packable(m, 12, 2, peak)
    native = _native_pack(m, "pack12_rows")
    if native is not None:
        return native
    h, w = m.shape
    e = m[:, 0::2].astype(np.uint32)
    o = m[:, 1::2].astype(np.uint32)
    out = np.empty((h, w // 2, 3), np.uint8)
    out[..., 0] = e >> 4
    out[..., 1] = ((e & 0xF) << 4) | (o >> 8)
    out[..., 2] = o & 0xFF
    return out.reshape(h, -1)


def unpack12_rows(packed):
    """Device-side inverse of :func:`pack12_rows` for (..., H, W//2*3)
    u8 → (..., H, W) u16 — a fused elementwise pass."""
    import jax.numpy as jnp

    t = packed.reshape(packed.shape[:-1]
                       + (packed.shape[-1] // 3, 3)).astype(jnp.uint16)
    e = (t[..., 0] << 4) | (t[..., 1] >> 4)
    o = ((t[..., 1] & 0xF) << 8) | t[..., 2]
    return jnp.stack([e, o], axis=-1).reshape(
        packed.shape[:-1] + (-1,))


def pack14_rows(mosaic, peak=None):
    """Host-side: (H, W) u16 with samples < 16384 and W % 4 == 0 →
    (H, W//4*7) u8, four samples per seven bytes (12.5% saved). Byte
    math only — the device inverse needs no 64-bit ops. ``peak`` as in
    :func:`pack12_rows`."""
    m = np.asarray(mosaic)
    _check_packable(m, 14, 4, peak)
    native = _native_pack(m, "pack14_rows")
    if native is not None:
        return native
    h, w = m.shape
    s = m.reshape(h, w // 4, 4).astype(np.uint32)
    out = np.empty((h, w // 4, 7), np.uint8)
    out[..., 0] = s[..., 0] >> 6
    out[..., 1] = ((s[..., 0] & 0x3F) << 2) | (s[..., 1] >> 12)
    out[..., 2] = (s[..., 1] >> 4) & 0xFF
    out[..., 3] = ((s[..., 1] & 0xF) << 4) | (s[..., 2] >> 10)
    out[..., 4] = (s[..., 2] >> 2) & 0xFF
    out[..., 5] = ((s[..., 2] & 0x3) << 6) | (s[..., 3] >> 8)
    out[..., 6] = s[..., 3] & 0xFF
    return out.reshape(h, -1)


def unpack14_rows(packed):
    """Device-side inverse of :func:`pack14_rows`."""
    import jax.numpy as jnp

    t = packed.reshape(packed.shape[:-1]
                       + (packed.shape[-1] // 7, 7)).astype(jnp.uint16)
    s0 = (t[..., 0] << 6) | (t[..., 1] >> 2)
    s1 = ((t[..., 1] & 0x3) << 12) | (t[..., 2] << 4) | (t[..., 3] >> 4)
    s2 = ((t[..., 3] & 0xF) << 10) | (t[..., 4] << 2) | (t[..., 5] >> 6)
    s3 = ((t[..., 5] & 0x3F) << 8) | t[..., 6]
    return jnp.stack([s0, s1, s2, s3], axis=-1).reshape(
        packed.shape[:-1] + (-1,))
