"""Color science: camera RGB → XYZ → sRGB.

Pure NumPy/JAX-friendly implementations of what the reference punted on
(reference: color.rs:35-47 returns identity and leaves the real math in
a disabled block). We provide both:

- ``mode="parity"``   — identity matrix, bit-matching the shipped
  reference behaviour.
- ``mode="accurate"`` — the standard dcraw-style pipeline: normalize the
  camera's xyz→cam matrix, white-balance-normalize rows so that sRGB
  white maps to camera white, and invert. This is the correct math the
  reference's disabled block was groping toward
  (reference: color.rs:49-168).
"""

from __future__ import annotations

import numpy as np

# IEC 61966-2-1:1999 XYZ(D65) → linear sRGB (reference: color.rs:13-17).
XYZ_TO_SRGB = np.array(
    [
        [3.2406, -1.5372, -0.4986],
        [-0.9689, 1.8758, 0.0415],
        [0.0557, -0.2040, 1.0570],
    ],
    dtype=np.float32,
)

SRGB_TO_XYZ = np.linalg.inv(XYZ_TO_SRGB.astype(np.float64)).astype(np.float32)

# Rec.709 luma weights used throughout the reference develop shader
# (reference: gpu/shaders.rs:222,243,256).
LUMA_REC709 = np.array([0.2126, 0.7152, 0.0722], dtype=np.float32)

_IDENTITY = np.eye(3, dtype=np.float32)


def is_identity_matrix(matrix, epsilon: float = 0.001) -> bool:
    """Identity check with the reference's epsilon
    (reference: color.rs:172-178)."""
    m = np.asarray(matrix, dtype=np.float32).reshape(3, 3)
    return bool(np.all(np.abs(m - _IDENTITY) < epsilon))


def _cam_matrix_body(m: np.ndarray, rgb_to_xyz: np.ndarray,
                     fallback: np.ndarray) -> np.ndarray:
    """The dcraw-style cam→linear-RGB derivation, shared by every
    output space (one body — the scale heuristic, normalization, and
    sanity clamps cannot drift between sRGB and the wide-gamut
    targets; code-review r3). ``fallback`` is returned for identity /
    degenerate / broken metadata."""
    if is_identity_matrix(m):
        return fallback.copy()
    # Camera matrices in RAW metadata are often integer-scaled by 10000
    # (the reference's disabled block guards for this too,
    # reference: color.rs:63-73).
    if np.any(np.abs(m) > 10.0):
        m = m / 10000.0
    # dcraw-style: cam_from_rgb = xyz_to_cam @ rgb_to_xyz, then
    # normalize each row to sum to 1 so that output white (1,1,1) maps
    # to camera white — this folds the white-point adaptation in and
    # keeps the inversion well-conditioned.
    cam_from_rgb = m @ np.asarray(rgb_to_xyz, np.float64)
    row_sums = cam_from_rgb.sum(axis=1, keepdims=True)
    if np.any(np.abs(row_sums) < 1e-8):
        return fallback.copy()
    cam_from_rgb = cam_from_rgb / row_sums
    try:
        out = np.linalg.inv(cam_from_rgb).astype(np.float32)
    except np.linalg.LinAlgError:
        return fallback.copy()
    # Sanity clamp mirroring the reference's disabled guard
    # (reference: color.rs:155-165): wild values mean broken metadata.
    if not np.all(np.isfinite(out)) or np.any(np.abs(out) > 10.0):
        return fallback.copy()
    return out


def cam_to_srgb_matrix(xyz_to_cam, mode: str = "parity") -> np.ndarray:
    """Compute the camera-RGB → linear-sRGB 3×3 matrix.

    Args:
      xyz_to_cam: flat length-9 or (3,3) row-major camera matrix from RAW
        metadata (reference: raw/loader.rs:115-134 extracts the 3×3 block
        of rawloader's 3×4 xyz_to_cam).
      mode: "parity" returns identity, matching the shipped reference
        (reference: color.rs:36-47). "accurate" computes the real
        conversion.

    Returns:
      (3,3) float32 row-major matrix.
    """
    m = np.asarray(xyz_to_cam, dtype=np.float64).reshape(3, 3)
    if mode == "parity":
        return _IDENTITY.copy()
    if mode != "accurate":
        raise ValueError(f"unknown mode: {mode!r}")
    return _cam_matrix_body(m, SRGB_TO_XYZ.astype(np.float64), _IDENTITY)


# ---------------------------------------------------------------------------
# Transfer functions. The reference applies plain 1/2.2 gamma
# (reference: gpu/shaders.rs:261); proper sRGB encoding is offered as the
# accurate-mode alternative.
# ---------------------------------------------------------------------------


def gamma22_encode(x):
    """Plain power-law 1/2.2 encode, negative values clamped to 0.

    WGSL ``pow`` on negative bases is undefined; the reference clamps
    after the pow (reference: gpu/shaders.rs:261-264). We define the
    deterministic equivalent: clamp below at 0 before the pow.
    """
    import jax.numpy as jnp

    xp = jnp if _is_jax(x) else np
    x = xp.maximum(x, 0.0)
    return xp.power(x, np.float32(1.0 / 2.2))


# Degree-6 fit of s^(20/11) on [0, 1]: with s = c^(1/4),
# poly(s) = c^(1/2.2) to u8 accuracy (two hardware sqrts + 6 FMAs
# replace the transcendental pow). 8-bit output is within 1 LSB of the
# exact pow (99.4% identical over 2M samples). Highest power first.
GAMMA22_POLY = (
    np.float32(2.2354132056e-01), np.float32(-7.9758619051e-01),
    np.float32(1.1776782855e+00), np.float32(-1.0106607578e+00),
    np.float32(1.3829966404e+00), np.float32(2.4274709515e-02),
    np.float32(-1.7121618430e-04),
)


def gamma22_poly_encode(x):
    """Fast approximate 1/2.2 encode: ``poly(sqrt(sqrt(clip(x))))``.

    Within 1 LSB of :func:`gamma22_encode` after u8 quantization; ~17%
    faster end-to-end on TPU because it avoids the transcendental pow.
    Input is clamped to [0, 1] (the polynomial is only fit there).
    """
    import jax.numpy as jnp

    xp = jnp if _is_jax(x) else np
    s = xp.sqrt(xp.sqrt(xp.clip(x, 0.0, 1.0)))
    acc = GAMMA22_POLY[0]
    for k in GAMMA22_POLY[1:]:
        acc = acc * s + k
    return acc


# Fast sRGB: the pow branch 1.055*c^(1/2.4) - 0.055 as a degree-6
# polynomial in s = sqrt(sqrt(c)) over s ∈ [cut^(1/4), 1] (c^(1/2.4) =
# s^(5/3), smooth away from 0); the linear segment below the cut stays
# exact. Chebyshev fit, max abs error 4.1e-6 (0.001 u8 LSB) on the pow
# branch; after u8 quantization 99.98% of values are identical to
# srgb_encode and the rest differ by 1 LSB (pinned in
# tests/test_color.py). Like GAMMA22_POLY this is fit to u8 accuracy
# ONLY — 16-bit outputs must use the exact transfer.
SRGB_POLY = (
    np.float32(6.3174404204e-02), np.float32(-2.9830396175e-01),
    np.float32(6.2492650747e-01), np.float32(-8.2647812366e-01),
    np.float32(1.3542464972e+00), np.float32(1.4221395552e-01),
    np.float32(-5.9776868671e-02),
)


def srgb_poly_encode(x):
    """Fast approximate IEC 61966-2-1 encode: exact linear segment +
    ``poly(sqrt(sqrt(x)))`` for the pow branch. Within 1 LSB of
    :func:`srgb_encode` after u8 quantization."""
    import jax.numpy as jnp

    xp = jnp if _is_jax(x) else np
    x = xp.clip(x, 0.0, 1.0)
    s = xp.sqrt(xp.sqrt(x))
    acc = SRGB_POLY[0]
    for k in SRGB_POLY[1:]:
        acc = acc * s + k
    return xp.where(x <= np.float32(0.0031308), x * np.float32(12.92),
                    acc)


# Transfer-name routing shared by the engine, the batch exporter, and
# the Pallas kernel front end — one source of truth so a new transfer
# cannot be wired into one path and silently misroute in another.
# Maps a transfer name to the Pallas kernel's gamma lane ("pow" = the
# exact-1/2.2 default lane).
PALLAS_GAMMA_BY_TRANSFER = {
    "gamma22": "pow",
    "gamma22_poly": "poly",
    "srgb": "srgb",
    "srgb_poly": "srgb_poly",
}
# The polynomial transfers are fit to u8 accuracy (~1e-4 absolute ≈ 6
# LSBs of u16) — 16-bit outputs must demote them to the exact curve.
TRANSFER16_BY_TRANSFER = {
    "gamma22_poly": "gamma22",
    "srgb_poly": "srgb",
}


def pallas_gamma_for(transfer: str) -> str:
    return PALLAS_GAMMA_BY_TRANSFER.get(transfer, "pow")


def transfer16_for(transfer: str) -> str:
    return TRANSFER16_BY_TRANSFER.get(transfer, transfer)


def encoder_for(transfer: str):
    """The encode callable for a transfer name — the one dispatch the
    u8/u16 finishing paths share (two identical dicts previously lived
    in ops/develop.py; code-review r3)."""
    try:
        return {
            "gamma22": gamma22_encode,
            "gamma22_poly": gamma22_poly_encode,
            "srgb": srgb_encode,
            "srgb_poly": srgb_poly_encode,
            "gamma_adobe": adobe_gamma_encode,
        }[transfer]
    except KeyError:
        raise ValueError(f"unknown transfer {transfer!r}") from None


# ---------------------------------------------------------------------------
# Output color spaces (beyond the reference, accurate mode): wide-gamut
# export targets. The dcraw-style cam→output derivation is the sRGB one
# with the target's RGB→XYZ matrix swapped in; docs/api.md "Wide-gamut
# output". ICC profiles for tagging the files live in raweditor_tpu/icc.py.
# ---------------------------------------------------------------------------


def _rgb_to_xyz_from_chromaticities(primaries_xy, white_xy):
    """Derive an RGB→XYZ (rows = X,Y,Z) matrix from primary and white
    chromaticities (the standard colorimetric construction: scale the
    primary columns so that RGB (1,1,1) lands on the white point with
    Y = 1)."""
    def xyz(x, y):
        return np.array([x / y, 1.0, (1.0 - x - y) / y], np.float64)

    prim = np.stack([xyz(x, y) for x, y in primaries_xy], axis=1)
    white = xyz(*white_xy)
    scale = np.linalg.solve(prim, white)
    return prim * scale[None, :]


_D65_XY = (0.3127, 0.3290)
# Display P3 (SMPTE EG 432-1 primaries, D65, sRGB transfer).
DISPLAY_P3_TO_XYZ = _rgb_to_xyz_from_chromaticities(
    ((0.680, 0.320), (0.265, 0.690), (0.150, 0.060)), _D65_XY)
# Adobe RGB (1998): 2.19921875 (= 563/256) gamma.
ADOBE_RGB_TO_XYZ = _rgb_to_xyz_from_chromaticities(
    ((0.640, 0.330), (0.210, 0.710), (0.150, 0.060)), _D65_XY)

COLOR_SPACES = ("srgb", "display-p3", "adobe-rgb")
# The transfer each space mandates ("srgb" keeps the caller's choice —
# the parity/accurate transfer options already cover it).
TRANSFER_BY_SPACE = {"display-p3": "srgb", "adobe-rgb": "gamma_adobe"}

_RGB_TO_XYZ_BY_SPACE = {
    "display-p3": DISPLAY_P3_TO_XYZ,
    "adobe-rgb": ADOBE_RGB_TO_XYZ,
}

ADOBE_GAMMA = 563.0 / 256.0  # Adobe RGB (1998) spec, exactly 2.19921875


def adobe_gamma_encode(x):
    """Adobe RGB (1998) forward transfer: x^(256/563), negatives
    clamped like the other pure-power encodes."""
    import jax.numpy as jnp

    xp = jnp if _is_jax(x) else np
    x = xp.maximum(x, 0.0)
    return xp.power(x, np.float32(1.0 / ADOBE_GAMMA))


def cam_to_output_matrix(xyz_to_cam, mode: str = "parity",
                         color_space: str = "srgb") -> np.ndarray:
    """cam→linear-OUTPUT 3×3 for any supported color space: the
    dcraw-style sRGB derivation (cam_to_srgb_matrix) with the target
    space's RGB→XYZ swapped in. Parity mode is sRGB-only by definition
    (it reproduces the reference's output bytes)."""
    if color_space in (None, "srgb"):
        return cam_to_srgb_matrix(xyz_to_cam, mode=mode)
    if color_space not in _RGB_TO_XYZ_BY_SPACE:
        raise ValueError(
            f"unknown color space {color_space!r}; expected one of "
            f"{COLOR_SPACES}")
    if mode != "accurate":
        raise ValueError(
            "wide-gamut output requires mode='accurate' (parity is "
            "defined as the reference's sRGB bytes)")
    m = np.asarray(xyz_to_cam, dtype=np.float64).reshape(3, 3)
    # No/broken camera metadata means the pixels are effectively sRGB
    # (decode_raw defaults xyz_to_cam to identity): the right fallback
    # is the sRGB→target bridge, NOT identity — identity would tag
    # sRGB-valued pixels as wide-gamut and render them oversaturated
    # in every consumer (code-review r3).
    bridge = (np.linalg.inv(_RGB_TO_XYZ_BY_SPACE[color_space])
              @ SRGB_TO_XYZ.astype(np.float64)).astype(np.float32)
    return _cam_matrix_body(m, _RGB_TO_XYZ_BY_SPACE[color_space], bridge)


def srgb_encode(x):
    """IEC 61966-2-1 forward transfer (linear → sRGB)."""
    import jax.numpy as jnp

    xp = jnp if _is_jax(x) else np
    x = xp.clip(x, 0.0, 1.0)
    lo = x * np.float32(12.92)
    hi = np.float32(1.055) * xp.power(x, np.float32(1.0 / 2.4)) - np.float32(0.055)
    return xp.where(x <= np.float32(0.0031308), lo, hi)


def srgb_decode(x):
    """IEC 61966-2-1 inverse transfer (sRGB → linear)."""
    import jax.numpy as jnp

    xp = jnp if _is_jax(x) else np
    x = xp.clip(x, 0.0, 1.0)
    lo = x / np.float32(12.92)
    hi = xp.power((x + np.float32(0.055)) / np.float32(1.055), np.float32(2.4))
    return xp.where(x <= np.float32(0.04045), lo, hi)


def _is_jax(x) -> bool:
    return type(x).__module__.startswith("jax")
