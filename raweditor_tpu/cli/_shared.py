"""Shared argument/param helpers for the CLI subcommand modules: slider/lens/crop/local parsing, env-config overlay resolution (one definition for every command), and the library/engine openers."""

from __future__ import annotations

import argparse


from raweditor_tpu.params import EditParams, RANGES


def _add_slider_args(p: argparse.ArgumentParser) -> None:
    for name in EditParams.field_names():
        lo, hi = RANGES[name]
        # Dashed flags for multi-word sliders (--curve-shadows);
        # argparse maps them back to the underscore dest.
        p.add_argument(
            f"--{name.replace('_', '-')}", type=float, default=None,
            help=f"{name} ({lo:g}..{hi:g})",
        )
    p.add_argument("--local", action="append", default=None,
                   metavar="KIND:K=V,...",
                   help="append a local-adjustment mask (repeatable): "
                        "KIND in {linear,radial,luma} with "
                        "comma-separated fields, e.g. "
                        "'linear:x0=0.5,y0=0,x1=0.5,y1=0.6,exposure=-1' "
                        "or 'radial:x0=0.3,y0=0.4,x1=0.2,y1=0.2,"
                        "saturation=40' (ops/local_adjust.py for the "
                        "field list; composes on top of stored masks)")
    p.add_argument("--curve", default=None, metavar="X,Y X,Y ...",
                   help="point tone curve: space-separated x,y control "
                        "points in 0..1 on the encoded tone axis, "
                        "e.g. '0,0 0.25,0.18 0.75,0.82 1,1' "
                        "(monotone PCHIP spline per channel, "
                        "ops/curve.py; replaces any stored curve; "
                        "--curve '' clears it)")
    p.add_argument("--preset", default=None, metavar="NAME",
                   help="apply a saved develop preset (sparse compose "
                        "on top of stored edits/defaults; explicit "
                        "slider flags override it; see the preset "
                        "subcommand)")


def _parse_local_spec(spec: str):
    """'kind:k=v,k=v' → LocalAdjust (usage errors, not tracebacks)."""
    from raweditor_tpu.ops.local_adjust import LocalAdjust

    kind, _, rest = spec.partition(":")
    data = {"kind": kind.strip()}
    if rest.strip():
        for part in rest.split(","):
            k, eq, v = part.partition("=")
            if not eq:
                raise SystemExit(
                    f"--local: expected K=V, got {part!r} in {spec!r}")
            try:
                data[k.strip()] = float(v)
            except ValueError:
                raise SystemExit(
                    f"--local: {k.strip()} needs a number, got {v!r}")
    try:
        return LocalAdjust.from_dict(data)
    except ValueError as e:
        raise SystemExit(f"--local: {e}")


def _params_from_args(args, base: EditParams = None) -> EditParams:
    import math

    params = base if base is not None else EditParams()
    preset = getattr(args, "preset", None)
    if preset:
        from raweditor_tpu.presets import apply_preset

        try:
            params = apply_preset(params, preset)
        except (KeyError, ValueError) as e:
            raise SystemExit(f"--preset: {e}")
    overrides = {
        name: getattr(args, name)
        for name in EditParams.field_names()
        if getattr(args, name, None) is not None
    }
    for name, value in overrides.items():
        if not math.isfinite(value):
            raise SystemExit(f"--{name} must be finite, got {value}")
    specs = getattr(args, "local", None) or ()
    if specs:
        masks = tuple(_parse_local_spec(sp) for sp in specs)
        overrides["locals"] = tuple(params.locals) + masks
    curve = getattr(args, "curve", None)
    if curve is not None:
        # '' is an explicit clear (the help text promises --curve
        # replaces any stored curve; validate_points maps no points
        # to the no-curve default) — `if curve:` silently ignored it
        # (code-review r4).
        overrides["point_curve"] = _parse_curve_spec(curve)
    return params.replace(**overrides)


def _parse_curve_spec(spec: str):
    """'x,y x,y ...' → validated point tuple ('' → no curve; usage
    errors, not tracebacks)."""
    from raweditor_tpu.ops.curve import validate_points

    pts = []
    for tok in spec.split():
        x, comma, y = tok.partition(",")
        if not comma:
            raise SystemExit(
                f"--curve: expected x,y pairs, got {tok!r}")
        try:
            pts.append((float(x), float(y)))
        except ValueError:
            raise SystemExit(f"--curve: {tok!r} is not numeric")
    try:
        return validate_points(pts)
    except ValueError as e:
        raise SystemExit(f"--curve: {e}")


def _finite_rotate(args) -> float:
    """--rotate with the same finiteness guard every other numeric
    input gets — a NaN would otherwise surface as a confusing
    per-batch quarantine deep in the flush (code-review r3)."""
    import math

    deg = float(getattr(args, "rotate", 0.0) or 0.0)
    if not math.isfinite(deg):
        raise SystemExit(f"--rotate must be finite, got {deg}")
    return deg


def _add_lens_args(p, batch: bool = False) -> None:
    every = " (uniform, every image)" if batch else ""
    p.add_argument("--lens-k1", type=float, default=0.0, metavar="K",
                   help="radial distortion r^2 coefficient"
                        " (r normalized to the half-diagonal; positive"
                        " corrects pincushion, negative corrects"
                        f" barrel){every}")
    p.add_argument("--lens-k2", type=float, default=0.0, metavar="K",
                   help=f"radial distortion r^4 coefficient{every}")
    p.add_argument("--lens-ca-r", type=float, default=0.0, metavar="A",
                   help="lateral CA: red-plane magnification delta in"
                        f" 1e-4 units{every}")
    p.add_argument("--lens-ca-b", type=float, default=0.0, metavar="A",
                   help="lateral CA: blue-plane magnification delta in"
                        f" 1e-4 units{every}")
    p.add_argument("--keystone-v", type=float, default=0.0, metavar="AMT",
                   help="vertical keystone correction, ±100 (fixes"
                        " converging verticals: positive when the"
                        f" camera was tilted up){every}")
    p.add_argument("--keystone-h", type=float, default=0.0, metavar="AMT",
                   help="horizontal keystone correction, ±100 (fixes"
                        f" converging horizontals){every}")


def _parse_lens(args):
    """(k1, k2, ca_r, ca_b) from the --lens-* flags, or None when all
    are zero/absent (finiteness enforced like every numeric flag)."""
    import math

    vals = tuple(float(getattr(args, n, 0.0) or 0.0)
                 for n in ("lens_k1", "lens_k2", "lens_ca_r",
                           "lens_ca_b"))
    for name, v in zip(("--lens-k1", "--lens-k2", "--lens-ca-r",
                        "--lens-ca-b"), vals):
        if not math.isfinite(v):
            raise SystemExit(f"{name} must be finite, got {v}")
    return vals if any(vals) else None


def _parse_perspective(args):
    """(kv, kh) warp coefficients from the ±100 --keystone-* flags
    (full deflection = 0.3 — a 30% trapezoid), or None when zero."""
    import math

    kv = float(getattr(args, "keystone_v", 0.0) or 0.0)
    kh = float(getattr(args, "keystone_h", 0.0) or 0.0)
    for name, v in (("--keystone-v", kv), ("--keystone-h", kh)):
        if not math.isfinite(v) or abs(v) > 100.0:
            raise SystemExit(f"{name} must be within ±100, got {v}")
    if kv == 0.0 and kh == 0.0:
        return None
    return (kv * 0.003, kh * 0.003)


def _parse_crop(spec):
    """--crop "L,T,W,H" → (left, top, width, height) ints, or None."""
    if spec in (None, ""):
        return None
    parts = str(spec).split(",")
    if len(parts) != 4:
        raise SystemExit(
            f"--crop expects L,T,W,H (four integers), got {spec!r}")
    try:
        return tuple(int(v) for v in parts)
    except ValueError:
        raise SystemExit(
            f"--crop expects integers, got {spec!r}")


def _clamp_zoom(zoom: float, cfg) -> float:
    """The reference's zoom clamp (main.rs:803) plus the finiteness
    guard sliders get — NaN passes min/max clamps unchanged and would
    poison the sampling coordinates (code-review r3)."""
    import math

    if not math.isfinite(zoom):
        raise SystemExit(f"--zoom must be finite, got {zoom}")
    return min(max(zoom, cfg.zoom_min), cfg.zoom_max)


def _finite_pan(args) -> tuple:
    import math

    pan = (getattr(args, "pan_x", 0.0), getattr(args, "pan_y", 0.0))
    if not all(math.isfinite(v) for v in pan):
        raise SystemExit(f"--pan-x/--pan-y must be finite, got {pan}")
    return pan


def _apply_env_config_defaults(args) -> None:
    """Flags not given fall back to Config.from_env() — so every
    documented RAWEDITOR_TPU_<FIELD> env override works on every
    subcommand that has the matching flag (explicit flags always win;
    code-review r3: several fields were silently ignored behind
    hardcoded argparse defaults)."""
    from raweditor_tpu.utils.config import Config

    try:
        cfg = Config.from_env()
    except ValueError as e:
        raise SystemExit(f"config: {e}")
    for attr, value in (
        ("db", cfg.db_path),
        ("cache_dir", cfg.cache_dir),
        ("mode", cfg.mode),
        ("batch_size", cfg.batch_size),
        ("decode_threads", cfg.decode_threads),
        ("mesh_rows", cfg.mesh_rows),
        ("quality", cfg.jpeg_quality),
    ):
        if hasattr(args, attr) and getattr(args, attr) is None:
            setattr(args, attr, value)
    if getattr(args, "fast", None) is False and cfg.use_pallas_kernel:
        args.fast = True


def _open_library(args):
    from raweditor_tpu.catalog import Library

    return Library(args.db)


def _open_engine(path, cmd_name: str, **kwargs):
    """DevelopEngine.open with the usage-error contract every CLI
    path should share: corrupt/missing inputs and config errors print
    one clean line, not a traceback (code-review r3 — only ValueError
    was caught, so RawDecodeError/FileNotFoundError tracebacked).
    Render-target sizes come from Config unless the caller pins them."""
    from raweditor_tpu.pipeline.engine import DevelopEngine
    from raweditor_tpu.raw.decode import RawDecodeError
    from raweditor_tpu.utils.config import Config

    cfg = Config.from_env()
    kwargs.setdefault("max_preview_width", cfg.max_preview_width)
    kwargs.setdefault("histogram_width", cfg.histogram_width)
    try:
        return DevelopEngine.open(path, **kwargs)
    except (ValueError, OSError, RawDecodeError) as e:
        raise SystemExit(f"{cmd_name}: {e}")
