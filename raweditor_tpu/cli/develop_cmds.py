"""Develop-side subcommands: info / convert / develop / histogram / synth / auto."""

from __future__ import annotations

import json
import sys

import numpy as np

from raweditor_tpu.params import EditParams
from raweditor_tpu.cli._shared import (
    _clamp_zoom,
    _finite_pan,
    _finite_rotate,
    _open_engine,
    _open_library,
    _params_from_args,
    _parse_crop,
    _parse_lens,
    _parse_perspective,
)


def cmd_info(args) -> int:
    from raweditor_tpu.raw.decode import UnsupportedRawError, decode_raw

    preview_saved = None
    if getattr(args, "save_preview", None):
        from raweditor_tpu.raw.decode import extract_preview_jpeg

        jpeg = extract_preview_jpeg(args.input)
        if jpeg is None:
            raise SystemExit("info: no embedded JPEG preview found")
        with open(args.save_preview, "wb") as f:
            f.write(jpeg)
        preview_saved = args.save_preview
    try:
        raw = decode_raw(args.input)
    except UnsupportedRawError as e:
        # Unsupported container (e.g. CR3): metadata and previews still
        # work — report what we have instead of a traceback.
        out = {"error": str(e), "preview_saved": preview_saved}
        from raweditor_tpu.raw import bmff
        from raweditor_tpu.raw.decode import _read

        data = _read(args.input)
        if bmff.is_bmff(data):
            out.update(bmff.describe(data))
        print(json.dumps(out))
        return 0 if preview_saved else 1
    out = {
        "width": raw.width,
        "height": raw.height,
        "camera": f"{raw.camera_make} {raw.camera_model}".strip(),
        "cfa_pattern": raw.cfa_pattern,
        "orientation": raw.orientation,
        "black_level": raw.black_level,
        "white_level": raw.white_level,
        "wb_multipliers": [round(float(x), 4) for x in raw.wb_multipliers],
        # True when the WB above is a neutral placeholder because the
        # file's real WB could not be parsed (e.g. encrypted Nikon
        # 0x0097 without xlat tables, CR3 ColorData) — callers can
        # tell "camera says neutral" from "unknown".
        "wb_is_default": bool(raw.wb_is_default),
        "xyz_to_cam": [round(float(x), 4) for x in raw.xyz_to_cam.ravel()],
    }
    if preview_saved is not None:
        # Same output contract as the UnsupportedRawError path.
        out["preview_saved"] = preview_saved
    print(json.dumps(out))
    return 0


def cmd_convert(args) -> int:
    """RAW → DNG conversion with the exporter's per-file quarantine
    semantics: one corrupt input reports and continues, it never kills
    the batch (reference analogue: main.rs:2020-2024)."""
    import os
    import time as _time

    from raweditor_tpu.raw.decode import (RawDecodeError, decode_raw,
                                          extract_preview_jpeg)
    from raweditor_tpu.raw.dng_out import write_dng
    from raweditor_tpu.version import __version__

    if args.output and len(args.inputs) > 1:
        raise SystemExit("convert: -o/--output needs exactly one input "
                         "(use --out-dir for batches)")
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    failed = 0
    for src in args.inputs:
        if args.output:
            dst = args.output
        else:
            base = os.path.splitext(os.path.basename(src))[0] + ".dng"
            dst = os.path.join(args.out_dir or os.path.dirname(src)
                               or ".", base)
        if os.path.exists(dst) and not args.force:
            print(json.dumps({"input": src, "error":
                              f"{dst} exists (use --force)"}))
            failed += 1
            continue
        try:
            img = decode_raw(src)
            preview = (None if args.no_preview
                       else extract_preview_jpeg(src))
            mtime = _time.localtime(os.path.getmtime(src))
            data = write_dng(
                dst, img, compression=args.compression,
                preview_jpeg=preview,
                software=f"raweditor_tpu {__version__}",
                datetime_str=_time.strftime("%Y:%m:%d %H:%M:%S", mtime),
            )
        except (OSError, RawDecodeError, ValueError) as e:
            print(json.dumps({"input": src, "error": str(e)}))
            failed += 1
            continue
        print(json.dumps({"input": src, "output": dst,
                          "bytes": len(data),
                          "compression": args.compression}))
    return 1 if failed else 0


def _resolve_input(args):
    """File path, or numeric catalog id + stored edits."""
    if args.input.isdigit():
        with _open_library(args) as lib:
            img = lib.get_image(int(args.input))
            if img is None:
                raise SystemExit(f"no catalog image {args.input}")
            return img.path, lib.load_edit_params(img.id)
    return args.input, EditParams()


def cmd_develop(args) -> int:
    from raweditor_tpu.pipeline.engine import DevelopEngine
    from raweditor_tpu.utils.config import Config

    cfg = Config.from_env()
    path, base = _resolve_input(args)
    params = _params_from_args(args, base)
    zoom = _clamp_zoom(args.zoom, cfg)
    # Branch-specific flags must error, not silently drop
    # (code-review r3): geometry/JPEG-encoder options apply to the
    # full-res export; zoom/pan apply to the preview render.
    if getattr(args, "preview", False):
        dropped = [f for f, on in (
            ("--rotate", getattr(args, "rotate", 0.0)),
            ("--crop", getattr(args, "crop", None)),
            ("--optimize-jpeg", getattr(args, "optimize_jpeg", False)),
            ("--jpeg-restart", getattr(args, "jpeg_restart", 0)),
            ("--chroma 444", getattr(args, "chroma", "420") == "444"),
            ("--lens-*", _parse_lens(args) is not None),
            ("--keystone-*", _parse_perspective(args) is not None),
        ) if on]
        if dropped:
            raise SystemExit(
                f"develop: {', '.join(dropped)} do(es) not apply to "
                "--preview renders (full-res export options)")
    elif (args.zoom != 1.0 or getattr(args, "pan_x", 0.0)
          or getattr(args, "pan_y", 0.0)):
        raise SystemExit(
            "develop: --zoom/--pan-x/--pan-y apply to --preview "
            "renders only (the full-res export has no view transform)")
    eng = _open_engine(
        path, "develop", mode=args.mode,
        use_pallas=getattr(args, "fast", False),
        fast_gamma=getattr(args, "fast_gamma", False),
        demosaic_method=getattr(args, "demosaic", "nearest"),
        transfer=getattr(args, "transfer", "gamma22"),
        auto_orient=getattr(args, "auto_orient", False),
        color_space=getattr(args, "color_space", "srgb"))
    if args.preview:
        from PIL import Image

        img = eng.preview(params, zoom=zoom, pan=_finite_pan(args))
        if getattr(args, "auto_orient", False) and eng.raw.orientation != 1:
            img = eng.apply_orientation(img, eng.raw.orientation)
        # Wide-gamut previews need the profile too — untagged
        # wide-gamut pixels render desaturated (code-review r3).
        icc = eng._icc_bytes()
        kw = {"icc_profile": icc} if icc else {}
        Image.fromarray(np.ascontiguousarray(img)).save(
            args.output, quality=args.quality, **kw
        )
    else:
        try:
            eng.export(args.output, params, quality=args.quality,
                       jpeg_optimize=(getattr(args, "optimize_jpeg", False)
                                      or cfg.jpeg_optimize),
                       chroma=getattr(args, "chroma", "420"),
                       jpeg_restart_rows=getattr(args, "jpeg_restart", 0),
                       rotate=_finite_rotate(args),
                       crop=_parse_crop(getattr(args, "crop", None)),
                       lens=_parse_lens(args),
                       perspective=_parse_perspective(args))
        except ValueError as e:
            # e.g. an unsupported output extension — a usage error, not
            # a traceback.
            raise SystemExit(f"develop: {e}")
    print(args.output)
    return 0


def cmd_histogram(args) -> int:
    from raweditor_tpu.pipeline.engine import DevelopEngine
    from raweditor_tpu.utils.config import Config

    path, base = _resolve_input(args)
    eng = _open_engine(path, "histogram")
    hist = eng.histogram(_params_from_args(args, base),
                         zoom=_clamp_zoom(getattr(args, "zoom", 1.0),
                                          Config.from_env()),
                         pan=_finite_pan(args))
    if args.ascii:
        print(render_ascii_histogram(hist))
    else:
        print(json.dumps({"r": hist[0].tolist(), "g": hist[1].tolist(),
                          "b": hist[2].tolist()}))
    return 0


def render_ascii_histogram(hist, width: int = 64, height: int = 8) -> str:
    """Terminal rendering of the (3, 256) histogram — the headless
    analogue of the reference's canvas widget, max-normalized like it
    (reference: ui/histogram.rs:26-75). ``width`` must divide 256
    (the bins collapse into whole columns)."""
    if width <= 0 or 256 % width:
        # The reshape below would raise an opaque 'cannot reshape'
        # otherwise (code-review r3).
        raise ValueError(
            f"width must be a positive divisor of 256, got {width}")
    hist = np.asarray(hist, dtype=np.float64)
    # Collapse 256 bins into `width` columns.
    bins = hist.reshape(3, width, 256 // width).sum(axis=2)
    peak = bins.max() or 1.0
    levels = np.round(bins / peak * height).astype(int)
    lines = []
    for ch, name in enumerate("RGB"):
        rows = []
        for level in range(height, 0, -1):
            rows.append(
                "".join("#" if levels[ch, c] >= level else " "
                        for c in range(width))
            )
        lines.append(f"{name}:")
        lines.extend(rows)
        lines.append("0" + " " * (width - 4) + "255")
    return "\n".join(lines)


def cmd_synth(args) -> int:

    from raweditor_tpu.raw.synth import write_synthetic_raw

    rng = np.random.default_rng(args.seed)
    comp = args.compression
    mosaic = rng.integers(0, 1 << args.bpp,
                          size=(args.height, args.width), dtype=np.uint16)
    if comp == "orf":
        from raweditor_tpu.raw.synth import write_synthetic_orf

        write_synthetic_orf(args.output, mosaic)
    elif comp == "rw2":
        from raweditor_tpu.raw.panasonic import rw2_representable
        from raweditor_tpu.raw.synth import write_synthetic_rw2

        w14 = (args.width // 14) * 14  # RW2 rows are 14-pixel groups
        if w14 == 0:
            raise SystemExit("rw2 needs --width >= 14")
        if w14 != args.width:
            print(f"rw2: width cropped to {w14} (14-pixel groups)",
                  file=sys.stderr)
        write_synthetic_rw2(args.output,
                            rw2_representable(mosaic[:, :w14]))
    elif comp == "srw3":
        w16 = (args.width // 16) * 16  # v3 rows are 16-pixel blocks
        if w16 == 0:
            raise SystemExit("srw3 needs --width >= 16")
        if w16 != args.width:
            print(f"srw3: width cropped to {w16} (16-pixel blocks)",
                  file=sys.stderr)
        write_synthetic_raw(args.output, mosaic[:, :w16], bpp=args.bpp,
                            compression="srw3", srw_wb=True)
    elif comp == "radc":
        from raweditor_tpu.raw.kodak_radc import radc_representable

        w4 = (args.width // 4) * 4
        h4 = (args.height // 4) * 4
        if w4 == 0 or h4 == 0:
            raise SystemExit("radc needs --width/--height >= 4")
        write_synthetic_raw(args.output,
                            radc_representable(mosaic[:h4, :w4]),
                            bpp=args.bpp, compression="radc")
    elif comp == "crw":
        from raweditor_tpu.raw.ciff import write_crw

        if args.bpp > 12:
            raise SystemExit("crw is a 12-bit format; use --bpp <= 12")
        write_crw(args.output, mosaic)
    elif comp == "raf":
        from raweditor_tpu.raw.raf import write_raf

        with open(args.output, "wb") as f:
            f.write(write_raf(mosaic))
    elif comp in ("cr3", "cr3-craw"):
        from raweditor_tpu.raw.bmff import write_synthetic_cr3

        kw = {"levels": 2, "q_detail": 8} if comp == "cr3-craw" else {}
        write_synthetic_cr3(args.output, mosaic=mosaic,
                            n_bits=args.bpp, **kw)
    else:
        write_synthetic_raw(args.output, mosaic, bpp=args.bpp,
                            compression=comp)
    print(args.output)
    return 0


def cmd_auto(args) -> int:
    from raweditor_tpu.pipeline.auto import suggest_auto
    from raweditor_tpu.pipeline.engine import DevelopEngine

    image_id = None
    if args.input.isdigit():
        # One library open for the whole command: loading params,
        # computing on device, and saving the suggestion — a re-open
        # after the expensive compute could fail and drop the result
        # (code-review r3).
        with _open_library(args) as lib:
            img = lib.get_image(int(args.input))
            if img is None:
                raise SystemExit(f"no catalog image {args.input}")
            path, image_id = img.path, img.id
            base = lib.load_edit_params(image_id)
            eng = _open_engine(path, "auto")
            suggestion = suggest_auto(
                eng, base,
                include_levels=getattr(args, "levels", False),
                include_contrast=getattr(args, "contrast", False),
                include_tone=getattr(args, "tone", False),
            )
            if not args.dry_run:
                lib.save_edit_params(image_id, suggestion)
    else:
        path, base = args.input, EditParams()
        eng = _open_engine(path, "auto")
        suggestion = suggest_auto(
            eng, base,
            include_levels=getattr(args, "levels", False),
            include_contrast=getattr(args, "contrast", False),
            include_tone=getattr(args, "tone", False),
        )
    print(suggestion.to_json())
    return 0
