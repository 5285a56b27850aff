"""Develop presets: named, sparse EditParams bundles on disk.

Beyond the reference (which has no preset/looks system). A preset
stores only the fields it DEFINES (those differing from the defaults),
so applying one composes like a look: ``apply_preset(base, name)``
replaces exactly the preset's fields on top of the base params —
stored catalog edits or CLI sliders the preset doesn't mention
survive. Explicit CLI slider flags override the preset (they are
applied after it).

Storage: one ``<name>.json`` per preset under the presets directory —
``$RAWEDITOR_TPU_PRESETS_DIR``, else ``$XDG_CONFIG_HOME/raw-editor/
presets``, else ``~/.config/raw-editor/presets`` (the same root the
reference's config derivation uses for its DB, state/library.rs:40-48).
Files are plain sparse JSON (a strict subset of EditParams.to_json's
schema), so presets are trivially shareable and hand-editable; unknown
fields are rejected on load exactly like catalog payloads.
"""

from __future__ import annotations

import json
import math
import os
import re
from pathlib import Path
from typing import Dict, List

from raweditor_tpu.params import _DEFAULTS, _FIELDS, EditParams

_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")


def presets_dir() -> Path:
    env = os.environ.get("RAWEDITOR_TPU_PRESETS_DIR")
    if env:
        return Path(env)
    base = os.environ.get("XDG_CONFIG_HOME")
    base = Path(base) if base else Path.home() / ".config"
    return base / "raw-editor" / "presets"


def _path_for(name: str) -> Path:
    if not _NAME_RE.match(name):
        raise ValueError(
            f"invalid preset name {name!r} (letters, digits, '.', '_', "
            "'-'; must not start with a separator)")
    if name == "list":
        # Reserved: the session protocol's `preset list` always
        # enumerates, so a preset by this name would be unreachable
        # there (code-review r3).
        raise ValueError("'list' is a reserved preset name")
    return presets_dir() / f"{name}.json"


def save_preset(name: str, params: EditParams) -> str:
    """Persist the NON-DEFAULT fields of ``params`` as ``name``.
    Returns the file path. Saving all-defaults is rejected — an empty
    preset applies as a no-op and is always a mistake."""
    sparse = {
        field: float(getattr(params, field))
        for field in _FIELDS
        if float(getattr(params, field)) != _DEFAULTS[field]
    }
    if params.locals:
        # Local-adjustment masks are preset-able too (the "graduated
        # sky" workflow): stored as their sparse dicts.
        sparse["locals"] = [m.to_dict() for m in params.locals]
    if params.point_curve:
        # The "film S-curve" workflow: point curves are the classic
        # thing to bottle as a preset.
        sparse["point_curve"] = [[float(x), float(y)]
                                 for x, y in params.point_curve]
    if not sparse:
        raise ValueError(
            "refusing to save an empty preset (all sliders at their "
            "defaults)")
    path = _path_for(name)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(sparse, indent=1, sort_keys=True))
    os.replace(tmp, path)
    return str(path)


def load_preset(name: str) -> Dict[str, float]:
    """The preset's sparse field dict. Unknown fields are rejected
    like catalog payloads (EditParams.from_json's contract)."""
    path = _path_for(name)
    try:
        data = json.loads(path.read_text())
    except FileNotFoundError:
        raise KeyError(
            f"no preset {name!r} in {presets_dir()} "
            f"(see `preset list`)") from None
    except OSError as e:
        # Unreadable file / a directory named <name>.json: keep the
        # documented KeyError/ValueError contract (doctor and the CLI
        # catch exactly those; code-review r3).
        raise ValueError(f"preset {name!r} is unreadable: {e}")
    except json.JSONDecodeError as e:
        raise ValueError(f"preset {name!r} is not valid JSON: {e}")
    if not isinstance(data, dict):
        raise ValueError(f"preset {name!r} must be a JSON object")
    locals_raw = data.pop("locals", None)
    curve_raw = data.pop("point_curve", None)
    unknown = set(data) - set(_FIELDS)
    if unknown:
        raise ValueError(
            f"preset {name!r} has unknown field(s): {sorted(unknown)}")
    out = {}
    for k, v in data.items():
        # The same finiteness discipline every other params input has
        # (set_slider / _params_from_args): json.loads accepts the
        # NaN/Infinity literals, and a NaN here would poison renders
        # and persist into the edit store; lists/null would traceback
        # as TypeError past the callers' (KeyError, ValueError)
        # handlers (code-review r3).
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError(
                f"preset {name!r} field {k!r} must be a number, "
                f"got {v!r}")
        if not math.isfinite(float(v)):
            raise ValueError(
                f"preset {name!r} field {k!r} must be finite, got {v}")
        out[k] = float(v)
    if locals_raw is not None:
        from raweditor_tpu.ops.local_adjust import LocalAdjust

        if not isinstance(locals_raw, list):
            raise ValueError(
                f"preset {name!r}: 'locals' must be a list of masks")
        try:
            out["locals"] = tuple(
                LocalAdjust.from_dict(m) for m in locals_raw)
        except (TypeError, ValueError) as e:
            raise ValueError(f"preset {name!r}: {e}")
    if curve_raw is not None:
        from raweditor_tpu.ops.curve import validate_points

        if not isinstance(curve_raw, list):
            raise ValueError(
                f"preset {name!r}: 'point_curve' must be a list of "
                "[x, y] pairs")
        try:
            out["point_curve"] = validate_points(curve_raw)
        except (TypeError, ValueError) as e:
            raise ValueError(f"preset {name!r}: {e}")
    return out


def apply_preset(base: EditParams, name: str) -> EditParams:
    """``base`` with the preset's fields replaced (sparse compose)."""
    return base.replace(**load_preset(name))


def list_presets() -> List[str]:
    """Names that :func:`load_preset` will actually accept — filtered
    to regular files with valid names, so the list and load surfaces
    never disagree about what exists (code-review r3)."""
    d = presets_dir()
    if not d.is_dir():
        return []
    return sorted(p.stem for p in d.glob("*.json")
                  if p.is_file() and _NAME_RE.match(p.stem)
                  and p.stem != "list")


def delete_preset(name: str) -> None:
    path = _path_for(name)
    try:
        path.unlink()
    except FileNotFoundError:
        raise KeyError(f"no preset {name!r} in {presets_dir()}") from None
