"""Decoded RAW image container.

The TPU-native equivalent of the reference's ``RawDataResult``
(reference: raw/loader.rs:11-19): the u16 Bayer mosaic plus the color
metadata the develop pipeline needs. Accurate mode additionally carries
black/white levels and the CFA phase, which the reference hardcodes
(/4096 and GBRG+offset, reference: gpu/shaders.rs:110-125).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class RawImage:
    """A decoded RAW frame on the host."""

    mosaic: np.ndarray  # (H, W) u16 Bayer mosaic, or (H, W, 3) u16 when
    # the source is LinearRaw (already demosaiced; see is_linear)
    wb_multipliers: np.ndarray  # (4,) f32 [R, G, B, G2], green-normalized
    xyz_to_cam: np.ndarray  # (3, 3) f32 row-major camera matrix
    black_level: float = 0.0
    # Optional per-CFA-site black levels (2, 2) f32 (DNG BlackLevel with
    # BlackLevelRepeatDim 2x2); black_level holds their mean.
    black_per_site: "np.ndarray" = None
    white_level: float = 4096.0  # parity default (reference: gpu/shaders.rs:110)
    cfa_pattern: str = "RGGB"  # effective storage-space CFA phase
    orientation: int = 1  # TIFF tag 274 (1=normal, 3=180, 6=90CW, 8=90CCW)
    # True when wb_multipliers is a neutral (all-ones) placeholder
    # because the file's real WB could not be parsed (e.g. CR3 CMT3
    # ColorData, encrypted Nikon 0x0097 without xlat tables). Lets
    # callers distinguish "camera says neutral" from "unknown" —
    # see decode.py/cli.py `info` and docs/formats.md.
    wb_is_default: bool = False
    camera_make: str = ""
    camera_model: str = ""
    source_path: str = ""

    def fold_site_blacks(self) -> "np.ndarray":
        """Mosaic with per-CFA-site black deviations folded out (the
        scalar ``black_level`` mean remains to subtract downstream).
        Returns the mosaic unchanged when there's nothing to fold.
        Residual error is the site spread over the dynamic range —
        well under one output LSB."""
        if (self.black_per_site is None or self.is_linear
                or np.ptp(self.black_per_site) == 0):
            return self.mosaic
        site = self.black_per_site.astype(np.float32)
        h, w = self.mosaic.shape
        delta = np.tile(
            site - site.mean(), (h // 2 + 1, w // 2 + 1)
        )[:h, :w]
        return np.clip(
            self.mosaic.astype(np.float32) - delta, 0, 65535
        ).astype(np.uint16)

    @property
    def is_linear(self) -> bool:
        """True for LinearRaw sources: mosaic holds (H, W, 3) RGB and
        the develop pipeline skips demosaicing."""
        return self.mosaic.ndim == 3

    @property
    def width(self) -> int:
        return int(self.mosaic.shape[1])

    @property
    def height(self) -> int:
        return int(self.mosaic.shape[0])

    def wb_rgb(self) -> np.ndarray:
        """(3,) RGB gains as the shader consumes them
        (reference: gpu/shaders.rs:195 uses wb_multipliers.rgb)."""
        return np.asarray(self.wb_multipliers[:3], dtype=np.float32)

    @staticmethod
    def normalize_wb(coeffs) -> np.ndarray:
        """Green-normalize camera WB coefficients with the reference's
        fallbacks (reference: raw/loader.rs:78-110): 3-coeff cameras reuse
        G for G2; non-finite or non-positive G2 falls back to G; green
        reference floored at 0.001."""
        c = [float(x) for x in coeffs]
        if len(c) >= 4:
            r, g, b, g2 = c[0], c[1], c[2], c[3]
        elif len(c) == 3:
            r, g, b = c
            g2 = g
        else:
            r = g = b = g2 = 1.0
        g_ref = max(g, 0.001)
        if not np.isfinite(g2) or g2 <= 0.0:
            g2 = g
        return np.array([r / g_ref, g / g_ref, b / g_ref, g2 / g_ref],
                        dtype=np.float32)
