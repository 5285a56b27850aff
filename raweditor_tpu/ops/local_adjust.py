"""Local adjustments: masked per-region develop deltas.

Capability beyond the reference editor (whose edits are all global,
state/edit.rs:15-96): the graduated-filter / radial-filter / luminance
-range local corrections every modern RAW editor ships — "darken the
sky", "lift this face", "cool the shadows".

Model
-----
An edit carries an ordered tuple of :class:`LocalAdjust` masks
(``EditParams.locals``). Each mask is a weight plane w(x, y) ∈ [0, 1]
built from normalized frame coordinates (resolution-independent: the
same stored numbers render identically on a preview and the full-res
export), times an optional luminance-range refinement, and applies its
slider deltas scaled by the weight.

Mask kinds (the ``kind`` static field):

- ``linear`` — graduated filter: weight ramps 0 → 1 (smoothstep)
  along the segment (x0, y0) → (x1, y1); 0 on the p0 side, 1 on the
  p1 side. The ramp length IS the feather.
- ``radial`` — ellipse centered (x0, y0) with radii (x1, y1) in
  frame-normalized units: weight 1 inside, smoothstep falloff to 0
  across ``feather`` (as a fraction of the radius).
- ``luma`` — whole-frame weight 1 (the range mask below does the
  selection) — the "luminosity mask" workflow.

Every kind then multiplies by the luminance-range mask
[luma_lo, luma_hi] with ``luma_soft`` smoothstep shoulders (defaults
0/1 select everything), and ``invert`` (0/1) flips the result.

Deltas (each scaled per-pixel by w, matching the GLOBAL slider
semantics so a full-frame mask reproduces the global slider):
``exposure`` (stops, 2^(e·w) gain), ``temperature``/``tint`` (the
shader's ±0.3 channel gains, reference gpu/shaders.rs:200-205),
``contrast`` (±100 about 0.5), ``saturation`` (±100 luma mix, the
chain's Rec.709 constants).

Placement: on the LINEAR RGB planes immediately after the global edit
stack (ops/develop.apply_edit_stack), before the transfer encode —
local exposure/WB belong in linear light. Everything is POINTWISE
(given two coordinate vectors), so XLA fuses the whole stage into the
develop program; masks cost ~30 flops/pixel each.

Gating is STRUCTURAL: ``EditParams.locals`` is part of the params
pytree, so ``if params.locals:`` inside jit is a static Python branch
— the default empty tuple adds nothing to the trace and parity stays
bit-exact by construction (the ops/extras.py discipline, enforced by
structure instead of a flag). Adding/removing a mask recompiles
(structure change); DRAGGING a mask never does (all numbers traced).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_F = np.float32
_LUMA_R, _LUMA_G, _LUMA_B = _F(0.2126), _F(0.7152), _F(0.0722)

KINDS = ("linear", "radial", "luma")

#: JSON field order (kind is serialized first, separately).
_DATA_FIELDS = (
    "x0", "y0", "x1", "y1", "feather", "invert",
    "luma_lo", "luma_hi", "luma_soft",
    "exposure", "contrast", "saturation", "temperature", "tint",
)
_DEFAULTS = {
    "x0": 0.5, "y0": 0.5, "x1": 0.5, "y1": 0.5,
    "feather": 0.5, "invert": 0.0,
    "luma_lo": 0.0, "luma_hi": 1.0, "luma_soft": 0.1,
    "exposure": 0.0, "contrast": 0.0, "saturation": 0.0,
    "temperature": 0.0, "tint": 0.0,
}


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=list(_DATA_FIELDS),
                   meta_fields=["kind"])
@dataclasses.dataclass(frozen=True)
class LocalAdjust:
    """One local-adjustment mask + its slider deltas.

    ``kind`` is pytree METADATA (static under jit — the mask shape
    picks the weight formula); every number is a traced leaf, so
    dragging a mask or a slider never recompiles."""

    kind: str = "radial"
    x0: Any = 0.5
    y0: Any = 0.5
    x1: Any = 0.5
    y1: Any = 0.5
    feather: Any = 0.5
    invert: Any = 0.0
    luma_lo: Any = 0.0
    luma_hi: Any = 1.0
    luma_soft: Any = 0.1
    exposure: Any = 0.0
    contrast: Any = 0.0
    saturation: Any = 0.0
    temperature: Any = 0.0
    tint: Any = 0.0

    def __post_init__(self):
        if self.kind not in KINDS:
            raise ValueError(
                f"unknown mask kind {self.kind!r}; expected one of "
                f"{KINDS}")

    # -- persistence (inside EditParams JSON) ---------------------------
    def to_dict(self) -> dict:
        """Sparse dict: kind + non-default fields only."""
        out = {"kind": self.kind}
        for name in _DATA_FIELDS:
            v = float(getattr(self, name))
            if v != _DEFAULTS[name]:
                out[name] = v
        return out

    @classmethod
    def from_dict(cls, data: dict) -> "LocalAdjust":
        data = dict(data)
        kind = data.pop("kind", None)
        if kind not in KINDS:
            raise ValueError(
                f"local adjustment needs kind in {KINDS}, got {kind!r}")
        unknown = set(data) - set(_DATA_FIELDS)
        if unknown:
            raise ValueError(
                f"unknown local-adjustment field(s): {sorted(unknown)}")
        merged = dict(_DEFAULTS)
        merged.update({k: float(v) for k, v in data.items()})
        return cls(kind=kind, **merged)

    def replace(self, **kw: Any) -> "LocalAdjust":
        return dataclasses.replace(self, **kw)


def _smooth(t):
    """smoothstep over t clipped to [0, 1]."""
    t = jnp.clip(t, _F(0.0), _F(1.0))
    return t * t * (_F(3.0) - _F(2.0) * t)


def mask_weight(m: LocalAdjust, X, Y, r, g, b):
    """The (H, W) weight plane for one mask. X/Y are frame-normalized
    coordinate planes (broadcastable row/column vectors); r/g/b the
    linear planes (for the luminance-range refinement)."""
    fx = jnp.asarray(m.x0, jnp.float32)
    fy = jnp.asarray(m.y0, jnp.float32)
    if m.kind == "linear":
        dx = jnp.asarray(m.x1, jnp.float32) - fx
        dy = jnp.asarray(m.y1, jnp.float32) - fy
        inv_l2 = _F(1.0) / (dx * dx + dy * dy + _F(1e-12))
        t = ((X - fx) * dx + (Y - fy) * dy) * inv_l2
        w = _smooth(t)
    elif m.kind == "radial":
        rx = jnp.maximum(jnp.asarray(m.x1, jnp.float32), _F(1e-4))
        ry = jnp.maximum(jnp.asarray(m.y1, jnp.float32), _F(1e-4))
        nx = (X - fx) / rx
        ny = (Y - fy) / ry
        d = jnp.sqrt(nx * nx + ny * ny)
        f = jnp.clip(jnp.asarray(m.feather, jnp.float32),
                     _F(0.01), _F(1.0))
        # w = 1 at d ≤ 1−f, 0 at d ≥ 1+f, smooth in between.
        w = _smooth((_F(1.0) + f - d) / (_F(2.0) * f))
    else:  # "luma": the range mask below is the whole selection
        w = jnp.ones(jnp.broadcast_shapes(jnp.shape(X), jnp.shape(Y)),
                     jnp.float32)
    # Luminance-range refinement (defaults select everything: the
    # shoulders sit OUTSIDE [lo, hi], so lo=0 / hi=1 pass y ∈ [0, 1]
    # at full weight).
    y = jnp.clip(_LUMA_R * r + _LUMA_G * g + _LUMA_B * b,
                 _F(0.0), _F(1.0))
    soft = jnp.maximum(jnp.asarray(m.luma_soft, jnp.float32), _F(1e-3))
    lo = jnp.asarray(m.luma_lo, jnp.float32)
    hi = jnp.asarray(m.luma_hi, jnp.float32)
    w = w * _smooth((y - lo) / soft + _F(1.0))
    w = w * _smooth((hi - y) / soft + _F(1.0))
    inv = jnp.asarray(m.invert, jnp.float32)
    return inv + (_F(1.0) - _F(2.0) * inv) * w


def apply_local_adjustments(r, g, b, locals_, cols_norm, rows_norm):
    """Apply each mask's deltas in order on linear RGB planes.

    ``cols_norm`` (W,) / ``rows_norm`` (H,) are the frame-normalized
    center coordinates of this render's columns/rows — (i + 0.5)/full
    for a full render; the preview path passes its sampled source
    indices, so a zoomed preview masks the same PICTURE regions as the
    export. Returns planes clamped to ≥ 0 (local contrast can swing
    negative; the transfer encode expects linear light)."""
    X = jnp.asarray(cols_norm, jnp.float32)[None, :]
    Y = jnp.asarray(rows_norm, jnp.float32)[:, None]
    for m in locals_:
        w = mask_weight(m, X, Y, r, g, b)
        # Exposure + white balance: channel gains in linear light,
        # the global chain's own formulas scaled by w.
        e = jnp.exp2(jnp.asarray(m.exposure, jnp.float32) * w)
        temp = jnp.asarray(m.temperature, jnp.float32) * w
        tint = jnp.asarray(m.tint, jnp.float32) * w
        r = r * e * (_F(1.0) + temp * _F(0.3))
        g = g * e * (_F(1.0) + tint * _F(0.3))
        b = b * e * (_F(1.0) - temp * _F(0.3))
        # Contrast about 0.5 (the global step-7 pivot).
        cf = _F(1.0) + jnp.asarray(m.contrast, jnp.float32) * w * _F(0.01)
        r = (r - _F(0.5)) * cf + _F(0.5)
        g = (g - _F(0.5)) * cf + _F(0.5)
        b = (b - _F(0.5)) * cf + _F(0.5)
        # Saturation: luma mix with the chain's Rec.709 constants.
        sf = _F(1.0) + jnp.asarray(m.saturation, jnp.float32) * w * _F(0.01)
        y = _LUMA_R * r + _LUMA_G * g + _LUMA_B * b
        r = y + (r - y) * sf
        g = y + (g - y) * sf
        b = y + (b - y) * sf
    zero = _F(0.0)
    return (jnp.maximum(r, zero), jnp.maximum(g, zero),
            jnp.maximum(b, zero))


def full_grid_norm(h: int, w: int):
    """((W,), (H,)) frame-normalized center coordinates of a full
    render's columns/rows."""
    cols = (jnp.arange(w, dtype=jnp.float32) + _F(0.5)) * _F(1.0 / w)
    rows = (jnp.arange(h, dtype=jnp.float32) + _F(0.5)) * _F(1.0 / h)
    return cols, rows


def sampled_grid_norm(xi, yi, full_w: int, full_h: int):
    """Normalized coordinates of a SAMPLED render (preview/histogram):
    xi/yi are the source indices sample_axis produced."""
    cols = (xi.astype(jnp.float32) + _F(0.5)) * _F(1.0 / full_w)
    rows = (yi.astype(jnp.float32) + _F(0.5)) * _F(1.0 / full_h)
    return cols, rows
