"""Non-destructive edit parameters.

The 10-slider edit model of the reference editor
(reference: state/edit.rs:15-96), kept JSON round-trip compatible with
the serde serialization the reference stores in SQLite
(reference: state/edit.rs:105-112), so an existing catalog's ``edits``
table replays unchanged — plus two finish extras beyond the reference
(``sharpen``/``denoise``, ops/extras.py) that serialize only when
used, so default-valued edits still emit the reference's exact
10-field schema.

``EditParams`` is registered as a JAX pytree whose leaves are the
slider values, so it can be passed straight into ``jax.jit``-compiled
develop kernels as a *traced* argument: moving a slider never triggers
recompilation.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

import jax

# Field order matters: it defines the pytree flatten order and the
# packed-array layout used by the batch exporter. The first ten are
# the reference's slider set (state/edit.rs:15-96); the finish extras
# (sharpen / denoise — ops/extras.py, beyond the reference) append
# after them so existing packed layouts keep their indices.
_REF_FIELDS = (
    "exposure",
    "contrast",
    "highlights",
    "shadows",
    "whites",
    "blacks",
    "vibrance",
    "saturation",
    "temperature",
    "tint",
)
_EXTRA_FIELDS = (
    "sharpen",
    "denoise",
    "curve_shadows",
    "curve_darks",
    "curve_lights",
    "curve_highlights",
    "vignette",
    "clarity",
    "dehaze",
    "grain",
    "grain_size",
)
# 8-band HSL color mixer (ops/mixer.py) — hue / saturation / luminance
# per band, in the band order ops.mixer.BAND_NAMES. Appended after the
# finish extras so existing packed layouts keep their indices.
_MIXER_BANDS = ("red", "orange", "yellow", "green", "aqua", "blue",
                "purple", "magenta")
MIXER_FIELDS = tuple(
    f"{ctl}_{band}" for ctl in ("hue", "sat", "lum")
    for band in _MIXER_BANDS
)
# Color grading / split toning (ops/grading.py) — hue + saturation per
# tonal region plus the balance slider, in ops.grading.GRADE_ORDER.
# Appended after the mixer so existing packed layouts keep their
# indices.
GRADE_FIELDS = ("grade_shadow_hue", "grade_shadow_sat",
                "grade_mid_hue", "grade_mid_sat",
                "grade_high_hue", "grade_high_sat",
                "grade_balance")
_EXTRA_FIELDS = (_EXTRA_FIELDS + MIXER_FIELDS + GRADE_FIELDS
                 # Clipped-highlight reconstruction (ops/highlights.py);
                 # appended last so packed layouts keep their indices.
                 + ("highlight_recovery",))
# The band-local stencil/curve extras (everything the fused post-pass
# kernel traces when ``stencils`` is on; clarity and the mixer are
# gated separately — see finish_extras_mode).
_STENCIL_FIELDS = ("sharpen", "denoise", "curve_shadows", "curve_darks",
                   "curve_lights", "curve_highlights", "vignette")
# The finish-panel subset of the extras: highlight_recovery is NOT a
# finish extra (it rewrites the mosaic pre-demosaic; engines/exporters
# gate it separately) — including it in has_finish_extras would kick
# recovery-only params off the AOT/pipelined hot paths and split
# export batches for a stage the develop program never traces.
_FINISH_FIELDS = tuple(f for f in _EXTRA_FIELDS
                       if f != "highlight_recovery")
_FIELDS = _REF_FIELDS + _EXTRA_FIELDS

# Defaults mirror the reference exactly: everything 0 except whites=1.0
# (reference: state/edit.rs:79-96). The extras default to 0 = off.
_DEFAULTS = {name: 0.0 for name in _FIELDS}
_DEFAULTS["whites"] = 1.0

# Documented slider ranges (reference: state/edit.rs:15-77). The UI uses
# narrower ranges for some sliders (contrast ±10, whites 0.8–1.2,
# blacks 0–0.2, reference: main.rs:1624-1659); the engine accepts any
# float, like the reference shader does.
RANGES = {
    "exposure": (-5.0, 5.0),
    "contrast": (-100.0, 100.0),
    "highlights": (-100.0, 100.0),
    "shadows": (-100.0, 100.0),
    "whites": (-100.0, 100.0),
    "blacks": (-100.0, 100.0),
    "vibrance": (-100.0, 100.0),
    "saturation": (-100.0, 100.0),
    "temperature": (-1.0, 1.0),
    "tint": (-1.0, 1.0),
    # Finish extras (beyond the reference; ops/extras.py): luma
    # unsharp-mask amount, edge-preserving denoise strength, and the
    # four parametric tone-curve region sliders (ops/extras.tone_curve).
    "sharpen": (0.0, 150.0),
    "denoise": (0.0, 100.0),
    "curve_shadows": (-100.0, 100.0),
    "curve_darks": (-100.0, 100.0),
    "curve_lights": (-100.0, 100.0),
    "curve_highlights": (-100.0, 100.0),
    "vignette": (-100.0, 100.0),
    "clarity": (-100.0, 100.0),
    # Dehaze (±100, ops/extras.apply_dehaze): veil removal via the
    # scattering-model inversion; negative adds the veil back.
    "dehaze": (-100.0, 100.0),
    # Film grain (ops/extras.apply_grain): deterministic monochrome
    # luma grain; size blends a 2x-coarser octave.
    "grain": (0.0, 100.0),
    "grain_size": (0.0, 100.0),
}
# HSL mixer sliders (ops/mixer.py): ±100 each — hue = ±30° shift,
# sat = full desaturation … 2× chroma, lum = ×0.595 … ×1.68 value.
RANGES.update({name: (-100.0, 100.0) for name in MIXER_FIELDS})
# Color grading (ops/grading.py): wheel hues in degrees, saturations
# 0–100 (full wheel = 0.25 chroma push), balance ±100 (±0.35 of the
# tonal range).
RANGES.update({
    "grade_shadow_hue": (0.0, 360.0),
    "grade_shadow_sat": (0.0, 100.0),
    "grade_mid_hue": (0.0, 360.0),
    "grade_mid_sat": (0.0, 100.0),
    "grade_high_hue": (0.0, 360.0),
    "grade_high_sat": (0.0, 100.0),
    "grade_balance": (-100.0, 100.0),
})
# Clipped-highlight reconstruction (ops/highlights.py): blend strength
# of the WB-ratio estimate written over sensor-clipped CFA sites.
RANGES["highlight_recovery"] = (0.0, 100.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EditParams:
    """All edit parameters for one image. A frozen dataclass pytree.

    Leaves may be Python floats, NumPy scalars, or traced JAX scalars —
    the develop kernels treat them uniformly as f32 scalars.
    """

    exposure: Any = 0.0
    contrast: Any = 0.0
    highlights: Any = 0.0
    shadows: Any = 0.0
    whites: Any = 1.0
    blacks: Any = 0.0
    vibrance: Any = 0.0
    saturation: Any = 0.0
    temperature: Any = 0.0
    tint: Any = 0.0
    sharpen: Any = 0.0
    denoise: Any = 0.0
    curve_shadows: Any = 0.0
    curve_darks: Any = 0.0
    curve_lights: Any = 0.0
    curve_highlights: Any = 0.0
    vignette: Any = 0.0
    clarity: Any = 0.0
    dehaze: Any = 0.0
    grain: Any = 0.0
    grain_size: Any = 0.0
    # HSL mixer (ops/mixer.py; field order = MIXER_FIELDS)
    hue_red: Any = 0.0
    hue_orange: Any = 0.0
    hue_yellow: Any = 0.0
    hue_green: Any = 0.0
    hue_aqua: Any = 0.0
    hue_blue: Any = 0.0
    hue_purple: Any = 0.0
    hue_magenta: Any = 0.0
    sat_red: Any = 0.0
    sat_orange: Any = 0.0
    sat_yellow: Any = 0.0
    sat_green: Any = 0.0
    sat_aqua: Any = 0.0
    sat_blue: Any = 0.0
    sat_purple: Any = 0.0
    sat_magenta: Any = 0.0
    lum_red: Any = 0.0
    lum_orange: Any = 0.0
    lum_yellow: Any = 0.0
    lum_green: Any = 0.0
    lum_aqua: Any = 0.0
    lum_blue: Any = 0.0
    lum_purple: Any = 0.0
    lum_magenta: Any = 0.0
    # Color grading (ops/grading.py; field order = GRADE_FIELDS)
    grade_shadow_hue: Any = 0.0
    grade_shadow_sat: Any = 0.0
    grade_mid_hue: Any = 0.0
    grade_mid_sat: Any = 0.0
    grade_high_hue: Any = 0.0
    grade_high_sat: Any = 0.0
    grade_balance: Any = 0.0
    # Clipped-highlight reconstruction (ops/highlights.py): estimate
    # sensor-clipped CFA sites from the unclipped channels via the WB
    # ratios, pre-demosaic — the dcraw -H / Lightroom "recover"
    # capability (the reference has no analogue). 0 = off (bit-exact
    # passthrough); 100 = full reconstruction.
    highlight_recovery: Any = 0.0
    # Local adjustments (ops/local_adjust.py): an ordered tuple of
    # LocalAdjust masks. Part of the pytree STRUCTURE, so the develop
    # programs specialize on the mask count/kinds statically — the
    # default empty tuple adds nothing to the trace (parity bit-exact
    # by construction) and dragging a mask never recompiles.
    locals: Any = ()
    # Point tone curve (ops/curve.py): a tuple of (x, y) control
    # points on the encoded 0..1 tone axis, interpolated by the
    # monotone PCHIP spline per channel. Structural like ``locals``:
    # the empty default traces nothing (bit-exact parity), dragging a
    # point never recompiles, adding/removing one recompiles once.
    point_curve: Any = ()

    # -- persistence (serde-compatible JSON) -----------------------------
    def to_json(self) -> str:
        """Serialize to the same JSON shape serde produces
        (reference: state/edit.rs:105-107). The reference's ten fields
        are always present; the finish extras (sharpen/denoise) are
        emitted only when non-default, so any edit the reference could
        express round-trips through its exact serde schema — a catalog
        written here stays loadable by the reference unless an edit
        actually uses a capability the reference lacks."""
        data = {name: float(getattr(self, name)) for name in _REF_FIELDS}
        for name in _EXTRA_FIELDS:
            v = float(getattr(self, name))
            if v != _DEFAULTS[name]:
                data[name] = v
        if self.locals:
            data["locals"] = [m.to_dict() for m in self.locals]
        if self.point_curve:
            data["point_curve"] = [
                [float(x), float(y)] for x, y in self.point_curve]
        return json.dumps(data)

    @classmethod
    def from_json(cls, payload: str) -> "EditParams":
        """Parse from a catalog JSON blob (reference: state/edit.rs:110-112).

        Unknown keys are rejected, missing keys fall back to defaults —
        matching serde's default derive behaviour for this struct
        (all fields required in serde; we are permissive on missing keys
        to survive forward-compatible catalogs).
        """
        data = json.loads(payload)
        locals_ = ()
        if "locals" in data:
            from raweditor_tpu.ops.local_adjust import LocalAdjust

            raw = data.pop("locals")
            if not isinstance(raw, list):
                raise ValueError("'locals' must be a list of masks")
            locals_ = tuple(LocalAdjust.from_dict(m) for m in raw)
        curve_ = ()
        if "point_curve" in data:
            from raweditor_tpu.ops.curve import validate_points

            raw = data.pop("point_curve")
            if not isinstance(raw, list):
                raise ValueError(
                    "'point_curve' must be a list of [x, y] pairs")
            curve_ = validate_points(raw)
        unknown = set(data) - set(_FIELDS)
        if unknown:
            raise ValueError(f"unknown edit parameter(s): {sorted(unknown)}")
        merged = dict(_DEFAULTS)
        merged.update({k: float(v) for k, v in data.items()})
        return cls(locals=locals_, point_curve=curve_, **merged)

    # -- convenience -----------------------------------------------------
    def is_unedited(self) -> bool:
        """True when every slider is at its default
        (reference: state/edit.rs:115-117) and no local-adjustment
        masks or point-curve control points exist."""
        return not self.locals and not self.point_curve and all(
            float(getattr(self, name)) == _DEFAULTS[name] for name in _FIELDS
        )

    def has_finish_extras(self) -> bool:
        """True when any finish extra (sharpen/denoise/tone curve) is
        active.

        Callers use this HOST-SIDE — before tracing — to pick the
        static ``extras`` specialization of the develop programs (the
        default path stays bit-exact and pays nothing; see
        ops/extras.py). Raises on traced leaves by design: the flag
        must never be data-dependent inside jit."""
        return any(
            float(getattr(self, name)) != _DEFAULTS[name]
            for name in _FINISH_FIELDS
        )

    def has_mixer(self) -> bool:
        """True when any HSL-mixer slider (ops/mixer.py) is active.
        Host-side only, like has_finish_extras."""
        return any(
            float(getattr(self, name)) != 0.0 for name in MIXER_FIELDS
        )

    def mixer_values(self) -> tuple:
        """The flat 24-tuple of mixer slider values in MIXER_FIELDS
        order (hue×8, sat×8, lum×8) — the positional contract of
        ops.mixer.apply_hsl_mixer. Leaves pass through unconverted so
        traced scalars survive (the batch paths vmap over them)."""
        return tuple(getattr(self, name) for name in MIXER_FIELDS)

    def has_grading(self) -> bool:
        """True when color grading (ops/grading.py) has any visible
        effect — any wheel saturation is non-zero (hue or balance
        alone is inert: hue tints nothing at zero saturation, and
        balance only repartitions zero offsets). Host-side only, like
        has_finish_extras."""
        return any(
            float(getattr(self, name)) != 0.0
            for name in ("grade_shadow_sat", "grade_mid_sat",
                         "grade_high_sat")
        )

    def grading_values(self) -> tuple:
        """The flat 7-tuple of grading slider values in GRADE_FIELDS
        order — the positional contract of
        ops.grading.apply_color_grading. Leaves pass through
        unconverted so traced scalars survive."""
        return tuple(getattr(self, name) for name in GRADE_FIELDS)

    def finish_extras_mode(self):
        """The static ``extras`` specialization for the develop entry
        points: False (off) or a "+"-joined combination of parts —
        "base" (stencil extras without clarity — the whole-frame
        clarity pyramid is skipped at trace time) or "full" (clarity
        active), "mixer" (the HSL mixer), and "grading" (color
        grading, ops/grading.py). A mode without base/full skips the
        stencil stages at trace time (pointwise-only extras).
        Host-side only, like has_finish_extras."""
        if not self.has_finish_extras():
            return False
        stencils = any(
            float(getattr(self, name)) != _DEFAULTS[name]
            for name in _STENCIL_FIELDS
        )
        # Clarity and dehaze are both whole-frame XLA stages behind
        # the "full" flag (the banded kernel can't host them).
        clar = (float(self.clarity) != 0.0
                or float(self.dehaze) != 0.0)
        parts = []
        if stencils or clar:
            parts.append("full" if clar else "base")
        if self.has_mixer():
            parts.append("mixer")
        if self.has_grading():
            parts.append("grading")
        if float(self.grain) != 0.0:
            # Film grain (ops/extras.apply_grain); grain_size alone
            # is inert — it only shapes an amount of zero.
            parts.append("grain")
        if not parts:
            # Only inert extras differ from default (e.g. a grading
            # hue with zero saturation): nothing to trace.
            return False
        return "+".join(parts)

    def reset(self) -> "EditParams":
        """Return default parameters (reference: state/edit.rs:120-122).

        Unlike the reference's in-place reset, this is functional: the
        dataclass is frozen."""
        return EditParams()

    def replace(self, **kwargs: Any) -> "EditParams":
        return dataclasses.replace(self, **kwargs)

    @classmethod
    def field_names(cls) -> tuple:
        return _FIELDS
