"""Headless command-line interface.

The reference is a GUI app; its workflows map to subcommands here:

  import   recursive folder import + tier-cache generation
           (reference: main.rs:1840-1924 + raw/processor.rs)
  list     catalog listing (reference library grid, main.rs:1295-1430)
  info     decode metadata for one file (reference: raw/loader.rs:75-143)
  convert  rewrite RAW files as archival DNG (bit-exact sensor data)
  develop  one-shot develop of a file or catalog id to JPEG/PNG
           (reference develop tab + export, main.rs:1433-1799)
  edit     save/reset slider values for a catalog image
           (reference: main.rs:597-717)
  export   batch export with stored edits, optionally mesh-sharded
           (BASELINE.md config 4)
  tiers    work the pending cache queue (reference: main.rs:404-495)
  histogram  print the 256-bin histogram (reference: gpu/pipeline.rs:615-736)
  synth    write a synthetic RAW (test/bench fixture)
  rate     star ratings / pick-reject flags (beyond the reference)
  verify   catalog integrity check (startup self-healing, on demand)
  auto     auto exposure/WB (+ levels/contrast/tone) suggestions
  collect  named collections: add/remove/delete/list
  preset   named develop presets: save/list/show/delete
  session  interactive develop loop on stdin (the develop tab, headless)
  serve    TCP develop service speaking the session protocol
  warmup   precompile develop programs for a sensor shape
  doctor   production environment self-check (one JSON report)
  bench    run the headline benchmark
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

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
    return params.replace(**overrides)


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


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="raweditor-tpu",
        description="TPU-native headless RAW develop engine",
    )
    ap.add_argument("--db", default=None, help="catalog database path")
    ap.add_argument(
        "--xlat", default=None, metavar="FILE",
        help="Nikon xlat substitution tables (512-byte file: xlat0 "
             "then xlat1) used to decrypt 0x0097 white balance; "
             "equivalent to RAWEDITOR_NIKON_XLAT=FILE")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("import", help="import a folder of RAW files")
    p.add_argument("folder")
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--no-tiers", action="store_true",
                   help="skip preview tier generation")
    p.add_argument("--watch", action="store_true",
                   help="keep polling the folder for new files "
                        "(tethered ingest; Ctrl-C to stop)")
    p.add_argument("--interval", type=float, default=2.0,
                   help="poll interval in seconds with --watch")
    p.add_argument("--sidecars", action="store_true",
                   help="after importing, apply any .xmp sidecar "
                        "found next to each RAW (edits + rating)")

    p = sub.add_parser("list", help="list catalog images")
    p.add_argument("--min-rating", type=int, default=0)
    p.add_argument("--flag", choices=("pick", "reject", "none"),
                   default=None)
    p.add_argument("--collection", default=None,
                   help="only images in this collection")
    p.add_argument("--search", default=None, metavar="TEXT",
                   help="substring match on filename/path")
    p.add_argument("--json", action="store_true",
                   help="one JSON object per line (for scripting)")

    p = sub.add_parser("info", help="print decoded RAW metadata")
    p.add_argument("input")
    p.add_argument("--save-preview", default=None, metavar="PATH",
                   help="also extract the largest embedded JPEG preview")

    p = sub.add_parser(
        "convert",
        help="convert RAW files to archival DNG (bit-exact sensor data)")
    p.add_argument("inputs", nargs="+", help="RAW file path(s)")
    p.add_argument("-o", "--output", default=None,
                   help="output path (single input only; default: "
                        "input name with .dng)")
    p.add_argument("--out-dir", default=None,
                   help="directory for the .dng outputs (multi-input)")
    p.add_argument("--compression", choices=("ljpeg", "none"),
                   default="ljpeg",
                   help="ljpeg = lossless JPEG (DNG standard, default); "
                        "none = uncompressed 16-bit")
    p.add_argument("--no-preview", action="store_true",
                   help="skip carrying over the embedded JPEG preview")
    p.add_argument("--force", action="store_true",
                   help="overwrite existing outputs")

    p = sub.add_parser("develop", help="develop one image to JPEG/PNG")
    p.add_argument("input", help="RAW file path or catalog image id")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--preview", action="store_true",
                   help="render at 1280px preview size instead of full res")
    p.add_argument("--zoom", type=float, default=1.0)
    p.add_argument("--pan-x", type=float, default=0.0)
    p.add_argument("--pan-y", type=float, default=0.0)
    p.add_argument("--mode", choices=("parity", "accurate"),
                   default=None,
                   help="develop semantics (default: Config.mode, "
                        "parity)")
    p.add_argument("--quality", type=int, default=None,
                   help="JPEG quality (default: Config.jpeg_quality, "
                        "95)")
    p.add_argument("--optimize-jpeg", action="store_true",
                   help="per-image optimal Huffman tables (~3-5%% "
                        "smaller files, ~1.9x encode time)")
    p.add_argument("--chroma", choices=("420", "444"), default="420",
                   help="JPEG chroma subsampling (444 = full-res "
                        "chroma for color-critical output)")
    p.add_argument("--jpeg-restart", type=int, default=0,
                   metavar="ROWS",
                   help="emit DRI/RSTn restart markers every ROWS MCU "
                        "rows and encode the independent segments on "
                        "all host cores (resilient streams + parallel "
                        "single-image encode; 0 = off)")
    p.add_argument("--fast", action="store_true",
                   help="use the fused Pallas kernel (±1 LSB)")
    p.add_argument("--fast-gamma", action="store_true",
                   help="with --fast: polynomial gamma (~17%% faster, "
                        "±1 LSB of exact pow)")
    p.add_argument("--auto-orient", action="store_true",
                   help="rotate output by the EXIF orientation tag")
    p.add_argument("--demosaic", default="nearest",
                   choices=("nearest", "bilinear", "malvar", "grad"),
                   help="demosaic kernel for full-res output (grad = "
                        "gradient-weighted + chroma refinement, best "
                        "quality on Bayer AND X-Trans; malvar = "
                        "gradient-corrected Bayer); previews always "
                        "use the parity sampler")
    p.add_argument("--transfer", default="gamma22",
                   choices=("gamma22", "srgb"),
                   help="output transfer curve (srgb = true IEC "
                        "61966-2-1 encode, beyond the reference)")
    p.add_argument("--color-space", default="srgb",
                   choices=("srgb", "display-p3", "adobe-rgb"),
                   help="output color space (accurate mode; wide-gamut "
                        "outputs embed a matching ICC profile)")
    p.add_argument("--rotate", type=float, default=0.0, metavar="DEG",
                   help="straighten: rotate the developed image by "
                        "this many degrees, positive = clockwise "
                        "(device-side bilinear; auto-crops the "
                        "largest source-aspect rectangle unless "
                        "--crop is given)")
    p.add_argument("--crop", default=None, metavar="L,T,W,H",
                   help="crop rectangle in STORED-frame pixels (after "
                        "--rotate, before EXIF auto-orientation; "
                        "combining with --auto-orient on a rotated "
                        "shot is rejected), e.g. 100,50,3000,2000")
    _add_lens_args(p)
    _add_slider_args(p)

    p = sub.add_parser("rate", help="star rating / pick-reject flag")
    p.add_argument("image_id", type=int)
    p.add_argument("--stars", type=int, default=None, help="0..5")
    p.add_argument("--flag", choices=("pick", "reject", "none"),
                   default=None)

    p = sub.add_parser(
        "sidecar",
        help="XMP sidecar interchange: edits + ratings as .xmp files "
             "next to the RAW (raweditor_tpu/xmp.py)")
    p.add_argument("action", choices=("write", "apply"),
                   help="write = catalog -> .xmp sidecars; "
                        "apply = .xmp sidecars -> catalog")
    p.add_argument("ids", nargs="*", type=int,
                   help="image ids (default: every catalog image)")
    p.add_argument("--force", action="store_true",
                   help="apply: overwrite existing catalog edits "
                        "even when the image already has some")

    p = sub.add_parser("collect",
                       help="named collections (beyond the reference)")
    p.add_argument("action",
                   choices=("add", "remove", "delete", "list"))
    p.add_argument("name", nargs="?", default=None,
                   help="collection name (not needed for list)")
    p.add_argument("ids", nargs="*", type=int,
                   help="image ids (for add/remove)")

    p = sub.add_parser(
        "preset",
        help="named develop presets (sparse EditParams bundles)")
    p.add_argument("action",
                   choices=("save", "list", "show", "delete"))
    p.add_argument("name", nargs="?", default=None,
                   help="preset name (not needed for list)")
    _add_slider_args(p)

    p = sub.add_parser("edit", help="save slider values for a catalog image")
    p.add_argument("image_id", type=int)
    p.add_argument("--reset", action="store_true",
                   help="delete stored edits")
    _add_slider_args(p)

    p = sub.add_parser("export", help="batch export with stored edits")
    p.add_argument("-o", "--out-dir", required=True)
    p.add_argument("--ids", type=int, nargs="*", default=None)
    p.add_argument("--files", nargs="*", default=None,
                   help="export files directly instead of the catalog")
    p.add_argument("--ext", default="jpg", choices=("jpg", "png", "tif"),
                   help="tif = 16-bit TIFF (beyond the reference)")
    p.add_argument("--batch-size", type=int, default=None,
                   help="images per device batch (default: "
                        "Config.batch_size, 8)")
    p.add_argument("--fast", action="store_true",
                   help="batched fused Pallas kernel (±1 LSB)")
    p.add_argument("--fast-gamma", action="store_true",
                   help="polynomial gamma (~17%% faster, ±1 LSB)")
    p.add_argument("--demosaic", default="nearest",
                   choices=("nearest", "bilinear", "malvar", "grad"))
    p.add_argument("--transfer", default="gamma22",
                   choices=("gamma22", "srgb"))
    p.add_argument("--color-space", default="srgb",
                   choices=("srgb", "display-p3", "adobe-rgb"),
                   help="output color space (accurate mode; wide-gamut "
                        "outputs embed a matching ICC profile)")
    p.add_argument("--rotate", type=float, default=0.0, metavar="DEG",
                   help="uniform straighten applied to EVERY image "
                        "(positive = clockwise; auto-crops the largest "
                        "source-aspect rectangle unless --crop is "
                        "given) — the fixed-rig batch workflow")
    p.add_argument("--crop", default=None, metavar="L,T,W,H",
                   help="uniform crop rectangle in STORED-frame pixels "
                        "(after --rotate), applied to every image")
    _add_lens_args(p, batch=True)
    p.add_argument("--decode-threads", type=int, default=None,
                   help="host decode workers (default: "
                        "Config.decode_threads, 4)")
    p.add_argument("--mesh-rows", type=int, default=None,
                   help="shard each image's rows over this many chips "
                        "(0 = no mesh, single device)")
    p.add_argument("--auto", action="store_true",
                   help="per-image auto exposure + white balance "
                        "measured on device before export (applied on "
                        "top of stored edits / CLI sliders; costs one "
                        "extra decode per image)")
    p.add_argument("--auto-levels", action="store_true",
                   help="with --auto: also percentile auto-levels")
    p.add_argument("--auto-contrast", action="store_true",
                   help="with --auto: also IQR auto-contrast")
    p.add_argument("--auto-tone", action="store_true",
                   help="with --auto: also scene-aware "
                        "shadows/highlights")
    p.add_argument("--num-hosts", type=int, default=1,
                   help="multi-host export: total process count (run "
                        "one process per host with distinct --host-id)")
    p.add_argument("--host-id", type=int, default=0,
                   help="this process's id in [0, num-hosts)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0's JAX coordination "
                        "service (required when --num-hosts > 1)")
    p.add_argument("--mode", choices=("parity", "accurate"),
                   default=None,
                   help="develop semantics (default: Config.mode, "
                        "parity)")
    p.add_argument("--quality", type=int, default=None,
                   help="JPEG quality (default: Config.jpeg_quality, "
                        "95)")
    p.add_argument("--optimize-jpeg", action="store_true",
                   help="per-image optimal Huffman tables (~3-5%% "
                        "smaller files, ~1.9x encode time)")
    p.add_argument("--chroma", choices=("420", "444"), default="420",
                   help="JPEG chroma subsampling (444 = full-res "
                        "chroma for color-critical output)")
    p.add_argument("--jpeg-restart", type=int, default=0,
                   metavar="ROWS",
                   help="emit DRI/RSTn restart markers every ROWS MCU "
                        "rows (resilient streams; 0 = off)")
    p.add_argument("--long-edge", type=int, default=0,
                   help="resize so the longer side is this many pixels "
                        "(device-side Lanczos3; never upscales; 0 = "
                        "full size)")
    p.add_argument("--resume", action="store_true",
                   help="skip jobs whose output file already exists")
    p.add_argument("--min-rating", type=int, default=0,
                   help="catalog exports only: require at least this "
                        "star rating")
    p.add_argument("--flag", choices=("pick", "reject", "none"),
                   default=None,
                   help="catalog exports only: require this flag")
    p.add_argument("--collection", default=None,
                   help="catalog exports only: only this collection")
    _add_slider_args(p)

    sub.add_parser(
        "verify",
        help="catalog integrity check: re-pend images with missing tier "
             "files, tombstone missing RAW files",
    )

    p = sub.add_parser("tiers", help="generate pending preview tiers")
    p.add_argument("--cache-dir", default=None)

    p = sub.add_parser("histogram", help="print 256-bin histogram")
    p.add_argument("input", help="RAW file path or catalog image id")
    p.add_argument("--ascii", action="store_true",
                   help="render as a terminal chart instead of JSON")
    p.add_argument("--zoom", type=float, default=1.0)
    p.add_argument("--pan-x", type=float, default=0.0)
    p.add_argument("--pan-y", type=float, default=0.0)
    _add_slider_args(p)

    p = sub.add_parser(
        "serve",
        help="TCP develop service speaking the session line protocol")
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address (trusted networks only: no auth)")
    p.add_argument("--port", type=int, default=0,
                   help="0 = pick a free port (printed on startup)")
    p.add_argument("--mode", choices=("parity", "accurate"),
                   default=None,
                   help="develop semantics (default: Config.mode, "
                        "parity)")
    p.add_argument("--fast", action="store_true",
                   help="fused Pallas kernel for opened images")
    p.add_argument("--fast-gamma", action="store_true")
    p.add_argument("--demosaic", default="nearest",
                   choices=("nearest", "bilinear", "malvar", "grad"))
    p.add_argument("--transfer", default="gamma22",
                   choices=("gamma22", "srgb"))

    p = sub.add_parser("synth", help="write a synthetic RAW fixture")
    p.add_argument("output")
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--bpp", type=int, default=12)
    p.add_argument("--compression",
                   choices=("none", "ljpeg", "ljpeg4", "nikon", "arw2",
                            "pentax", "kodak65000", "srw1", "srw3",
                            "radc", "orf", "rw2", "crw", "raf", "cr3",
                            "cr3-craw"),
                   default="none",
                   help="TIFF-container codecs, or a whole-container "
                        "format (orf/rw2/crw/raf/cr3[-craw])")
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser(
        "auto",
        help="compute auto exposure/WB for an image and store the edits",
    )
    p.add_argument("input", help="RAW file path or catalog image id")
    p.add_argument("--dry-run", action="store_true",
                   help="print the suggestion without saving")
    p.add_argument("--levels", action="store_true",
                   help="also suggest auto-levels (blacks/whites "
                        "percentile stretch)")
    p.add_argument("--contrast", action="store_true",
                   help="also suggest a contrast delta (interquartile "
                        "spread toward a midtone target)")
    p.add_argument("--tone", action="store_true",
                   help="also suggest scene-aware shadows/highlights "
                        "(deep-shadow lift / clipped-highlight recovery)")

    p = sub.add_parser(
        "session",
        help="interactive develop session (line protocol on stdin)",
    )
    p.add_argument("input", help="RAW file path or catalog image id")
    p.add_argument("--mode", choices=("parity", "accurate"),
                   default=None,
                   help="develop semantics (default: Config.mode, "
                        "parity)")
    p.add_argument("--fast", action="store_true")
    p.add_argument("--fast-gamma", action="store_true",
                   help="polynomial gamma (~17%% faster, ±1 LSB)")
    p.add_argument("--demosaic", default="nearest",
                   choices=("nearest", "bilinear", "malvar", "grad"))

    p = sub.add_parser(
        "warmup",
        help="precompile develop programs for a sensor shape (fills the "
             "persistent compile cache so production cold-starts skip "
             "the minutes-long first compile)",
    )
    p.add_argument("--width", type=int, required=True)
    p.add_argument("--height", type=int, required=True)
    p.add_argument("--batch-size", type=int, default=0,
                   help="also compile the batched export program")
    p.add_argument("--fast", action="store_true",
                   help="also compile the Pallas kernels")

    p = sub.add_parser(
        "doctor",
        help="environment self-check: native extension freshness, JPEG "
             "SIMD path, JAX backend, compile cache, Nikon xlat tables, "
             "catalog (one JSON report; exit 1 on hard failures)",
    )
    p.add_argument("--probe", action="store_true",
                   help="also time a tiny on-device round trip (first "
                        "run may compile; can take minutes on a "
                        "congested tunnel)")

    sub.add_parser("bench", help="run the headline benchmark")
    return ap


def cmd_import(args) -> int:
    from raweditor_tpu.pipeline.tiers import (process_pending_cache,
                                              watch_folder)

    with _open_library(args) as lib:
        if getattr(args, "watch", False):
            totals = watch_folder(
                lib, args.folder, cache_dir=args.cache_dir,
                interval=args.interval, tiers=not args.no_tiers,
                on_cycle=lambda s: print(json.dumps(s), flush=True),
            )
            print(json.dumps(totals))
            return 0
        stats = lib.import_folder(args.folder)
        out = {"imported": stats["imported"], "duplicates": stats["skipped"]}
        if getattr(args, "sidecars", False):
            out["sidecars_applied"] = _apply_sidecars(lib)["applied"]
        if not args.no_tiers:
            out.update(process_pending_cache(lib, args.cache_dir))
        print(json.dumps(out))
    return 0


def _apply_sidecars(lib, ids=None, force=False) -> dict:
    """Apply .xmp sidecars found next to catalog RAWs: edits (unless
    the image already has catalog edits and ``force`` is off — the
    catalog is the primary store; a stale sidecar must not clobber
    newer in-catalog work) and rating/flag (always — they're cheap to
    re-rate and third-party tools routinely update them)."""
    from raweditor_tpu.xmp import find_sidecar, read_sidecar

    images = (lib.get_all_images() if ids is None
              else [lib.get_image(i) for i in ids])
    applied, skipped, errors = 0, 0, []
    for img in images:
        if img is None or img.is_deleted():
            continue
        sc = find_sidecar(img.path)
        if sc is None:
            continue
        try:
            params, rating, flag, _label = read_sidecar(sc)
        except (ValueError, OSError) as e:
            errors.append({"path": sc, "error": str(e)})
            continue
        if not params.is_unedited():
            if lib.has_edits(img.id) and not force:
                skipped += 1
            else:
                lib.save_edit_params(img.id, params)
        if rating is not None or flag != "none":
            lib.set_rating(img.id, rating=rating,
                           flag=flag if flag != "none" else None)
        applied += 1
    return {"applied": applied, "skipped_edits": skipped,
            "errors": errors}


def cmd_sidecar(args) -> int:
    from raweditor_tpu.xmp import write_sidecar

    with _open_library(args) as lib:
        ids = args.ids or None
        if args.action == "apply":
            out = _apply_sidecars(lib, ids=ids, force=args.force)
            print(json.dumps(out))
            return 1 if out["errors"] else 0
        images = (lib.get_all_images() if ids is None
                  else [lib.get_image(i) for i in ids])
        written = []
        for img in images:
            if img is None or img.is_deleted():
                continue
            rating, flag = lib.get_rating(img.id)
            path = write_sidecar(
                img.path, lib.load_edit_params(img.id),
                rating=rating if (rating or flag != "none") else None,
                flag=flag)
            written.append(path)
        print(json.dumps({"written": len(written),
                          "paths": written}))
    return 0


def cmd_list(args) -> int:
    with _open_library(args) as lib:
        lib.verify_files()
        min_rating = getattr(args, "min_rating", 0) or 0
        flag = getattr(args, "flag", None)
        collection = getattr(args, "collection", None)
        search = getattr(args, "search", None)
        if min_rating or flag or collection or search:
            images = lib.filter_images(min_rating=min_rating, flag=flag,
                                       collection=collection,
                                       search=search)
        else:
            images = lib.get_all_images()
        for img in images:
            edited = "*" if lib.has_edits(img.id) else " "
            status = "deleted" if img.is_deleted() else (
                "cached" if img.cache_path_working else "pending")
            rating, rflag = lib.get_rating(img.id)
            if getattr(args, "json", False):
                print(json.dumps({
                    "id": img.id, "filename": img.filename,
                    "path": img.path, "status": status,
                    "edited": edited == "*", "rating": rating,
                    "flag": rflag,
                }))
                continue
            stars = ("★" * rating).ljust(5)
            mark = {"pick": "P", "reject": "X"}.get(rflag, " ")
            print(f"{img.id:6d} {edited} {status:8s} {stars} {mark} "
                  f"{img.filename}")
    return 0


def cmd_rate(args) -> int:
    with _open_library(args) as lib:
        if args.stars is None and args.flag is None:
            if lib.get_image(args.image_id) is None:
                # A typo'd id must not read as "real, unrated"
                # (code-review r3).
                raise SystemExit(f"rate: no catalog image "
                                 f"{args.image_id}")
            rating, flag = lib.get_rating(args.image_id)
            print(json.dumps({"id": args.image_id, "rating": rating,
                              "flag": flag}))
            return 0
        try:
            lib.set_rating(args.image_id, rating=args.stars,
                           flag=args.flag)
        except ValueError as e:
            raise SystemExit(f"rate: {e}")
        rating, flag = lib.get_rating(args.image_id)
        print(json.dumps({"id": args.image_id, "rating": rating,
                          "flag": flag}))
    return 0


def cmd_collect(args) -> int:
    with _open_library(args) as lib:
        if args.action == "list":
            for name, count in lib.list_collections():
                print(json.dumps({"name": name, "images": count}))
            return 0
        if not args.name:
            raise SystemExit("collect: a collection name is required")
        try:
            if args.action == "add":
                n = lib.add_to_collection(args.name, args.ids)
                print(json.dumps({"name": args.name, "added": n}))
            elif args.action == "remove":
                n = lib.remove_from_collection(args.name, args.ids)
                print(json.dumps({"name": args.name, "removed": n}))
            elif args.action == "delete":
                ok = lib.delete_collection(args.name)
                print(json.dumps({"name": args.name, "deleted": ok}))
        except ValueError as e:
            raise SystemExit(f"collect: {e}")
    return 0


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
                       lens=_parse_lens(args))
        except ValueError as e:
            # e.g. an unsupported output extension — a usage error, not
            # a traceback.
            raise SystemExit(f"develop: {e}")
    print(args.output)
    return 0


def cmd_edit(args) -> int:
    with _open_library(args) as lib:
        if lib.get_image(args.image_id) is None:
            raise SystemExit(f"no catalog image {args.image_id}")
        if args.reset:
            lib.delete_edits(args.image_id)
            print(json.dumps({"image_id": args.image_id, "reset": True}))
            return 0
        overrides = {
            name for name in EditParams.field_names()
            if getattr(args, name, None) is not None
        }
        if not overrides and not getattr(args, "preset", None):
            # Query mode: print the stored params without writing.
            print(lib.load_edit_params(args.image_id).to_json())
            return 0
        params = _params_from_args(args, lib.load_edit_params(args.image_id))
        lib.save_edit_params(args.image_id, params)
        print(params.to_json())
    return 0


def cmd_export(args) -> int:
    from raweditor_tpu.pipeline.export import (
        ExportJob,
        jobs_from_catalog,
        run_batch_export,
    )
    from raweditor_tpu.utils.config import Config

    num_hosts = getattr(args, "num_hosts", 1)
    host_id = getattr(args, "host_id", 0)
    if num_hosts < 1:
        raise SystemExit(f"--num-hosts must be >= 1 (got {num_hosts})")
    if not 0 <= host_id < num_hosts:
        raise SystemExit(
            f"--host-id {host_id} out of range for --num-hosts {num_hosts}")
    if num_hosts > 1:
        # Must run before anything touches the JAX backend (backend
        # init is lazy in this CLI precisely so this works). Each host
        # then exports its share over its OWN chips — see
        # parallel/distributed.py for why no global mesh is needed.
        if not args.coordinator:
            raise SystemExit("--num-hosts > 1 requires --coordinator")
        from raweditor_tpu.parallel.distributed import init_distributed

        init_distributed(args.coordinator, num_hosts, host_id)

    cfg = Config.from_env()
    override = _params_from_args(args)
    if args.files is not None:
        # `is not None`: an EMPTY --files (a glob that matched
        # nothing) must not silently fall through to a full-catalog
        # export (code-review r3).
        if not args.files:
            raise SystemExit("export: --files matched no files")
        import os

        jobs = []
        taken = set()
        for f in args.files:
            stem = os.path.splitext(os.path.basename(f))[0]
            # Same stem-collision guard as jobs_from_catalog: two
            # IMG_0001.NEF from different folders must not clobber
            # each other (code-review r3).
            name = f"{stem}.{args.ext}"
            if name.lower() in taken:
                i = 2
                while f"{stem}_{i}.{args.ext}".lower() in taken:
                    i += 1
                name = f"{stem}_{i}.{args.ext}"
            taken.add(name.lower())
            jobs.append(ExportJob(
                raw_path=f,
                out_path=os.path.join(args.out_dir, name),
                params=override,
            ))
    else:
        with _open_library(args) as lib:
            ids = args.ids
            min_rating = getattr(args, "min_rating", 0) or 0
            flag = getattr(args, "flag", None)
            collection = getattr(args, "collection", None)
            if min_rating or flag or collection:
                picked = {i.id for i in lib.filter_images(
                    min_rating=min_rating, flag=flag,
                    collection=collection)}
                ids = sorted(picked if ids is None
                             else picked & set(ids))
            jobs = jobs_from_catalog(lib, args.out_dir, ids, args.ext)
        # CLI slider overrides apply ON TOP of each image's stored
        # edits (the export parser advertises every slider; they were
        # silently dropped for catalog exports — code-review r3).
        if (getattr(args, "preset", None)
                or getattr(args, "local", None)
                or any(getattr(args, n, None) is not None
                       for n in EditParams.field_names())):
            import dataclasses as _dc

            jobs = [_dc.replace(j, params=_params_from_args(
                args, j.params)) for j in jobs]

    mesh = None
    if num_hosts > 1:
        from raweditor_tpu.parallel.distributed import (
            local_export_mesh,
            partition_jobs,
        )

        jobs = partition_jobs(jobs, args.host_id, num_hosts)
        mesh = local_export_mesh(row=args.mesh_rows or 1)
    elif args.mesh_rows:
        from raweditor_tpu.parallel import batch_row_mesh

        mesh = batch_row_mesh(row=args.mesh_rows)
    auto_extras = [n for n in ("auto_levels", "auto_contrast",
                               "auto_tone") if getattr(args, n, False)]
    if auto_extras and not getattr(args, "auto", False):
        raise SystemExit(
            f"--{auto_extras[0].replace('_', '-')} refines the --auto "
            "pass and needs it; pass --auto as well")
    if getattr(args, "auto", False):
        # Per-image auto adjustments measured on device at preview
        # resolution, applied on top of each job's params (stored edits
        # or CLI overrides — same composition as the `auto`
        # subcommand). This is a separate measurement pass, so each
        # image is decoded once extra; the per-image decodes are
        # independent, so they run on the same thread width as the
        # export proper. Decode errors are left for the export's
        # per-image quarantine to report; anything else is a real
        # problem (tunnel/compile/suggest bug) and must be visible at
        # the default log level — the image still exports, un-adjusted.
        import dataclasses as _dc
        from concurrent.futures import ThreadPoolExecutor as _TPE

        from raweditor_tpu.pipeline.auto import suggest_auto
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.raw.decode import RawDecodeError
        from raweditor_tpu.utils.logging import get_logger

        _log = get_logger("raweditor_tpu.cli")

        if getattr(args, "resume", False):
            # skip_existing drops these jobs inside run_batch_export
            # anyway — don't pay a decode + device measurement pass
            # per already-exported image (code-review r3).
            import os as _os

            jobs = [j for j in jobs if not _os.path.exists(j.out_path)]

        def _measure(j):
            try:
                eng = DevelopEngine.open(j.raw_path)
                return _dc.replace(j, params=suggest_auto(
                    eng, j.params,
                    include_levels="auto_levels" in auto_extras,
                    include_contrast="auto_contrast" in auto_extras,
                    include_tone="auto_tone" in auto_extras,
                ))
            except (OSError, RawDecodeError) as e:
                _log.info("auto pass skipped for %s (%s: %s)",
                          j.raw_path, type(e).__name__, str(e)[:120])
            except Exception as e:
                _log.warning(
                    "auto pass failed for %s — exporting without auto "
                    "adjustments (%s: %s)",
                    j.raw_path, type(e).__name__, str(e)[:120])
            return j

        with _TPE(max_workers=max(1, args.decode_threads)) as pool:
            jobs = list(pool.map(_measure, jobs))
    try:
        report = _run_batch_export_checked(
            run_batch_export, jobs, mesh, args, cfg, num_hosts)
    except ValueError as e:
        raise SystemExit(f"export: {e}")
    rep = report.as_dict()
    if num_hosts > 1:
        rep["host_id"] = args.host_id
        rep["num_hosts"] = num_hosts
    print(json.dumps(rep))
    return 0 if not report.failed else 1


def _run_batch_export_checked(run_batch_export, jobs, mesh, args, cfg,
                              num_hosts):
    """The export invocation, separated so config ValueErrors surface
    as usage errors (code-review r3)."""
    return run_batch_export(
        jobs, mesh=mesh, batch_size=args.batch_size,
        decode_threads=args.decode_threads,
        encode_threads=cfg.encode_threads, quality=args.quality,
        mode=args.mode, skip_existing=args.resume,
        fast_gamma=getattr(args, "fast_gamma", False),
        demosaic_method=getattr(args, "demosaic", "nearest"),
        use_pallas=getattr(args, "fast", False),
        transfer=(args.transfer if getattr(args, "transfer", "gamma22")
                  != "gamma22" else None),
        bits=16 if args.ext == "tif" else 8,
        long_edge=getattr(args, "long_edge", 0) or None,
        jpeg_optimize=(getattr(args, "optimize_jpeg", False)
                       or cfg.jpeg_optimize),
        chroma=getattr(args, "chroma", "420"),
        jpeg_restart_rows=getattr(args, "jpeg_restart", 0),
        color_space=getattr(args, "color_space", "srgb"),
        rotate=_finite_rotate(args),
        crop=_parse_crop(getattr(args, "crop", None)),
        lens=_parse_lens(args),
    )


def cmd_verify(args) -> int:
    with _open_library(args) as lib:
        print(json.dumps({
            "repending": lib.verify_cache(),
            "tombstoned": lib.verify_files(),
            "images": lib.image_count(),
        }))
    return 0


def cmd_tiers(args) -> int:
    from raweditor_tpu.pipeline.tiers import process_pending_cache

    with _open_library(args) as lib:
        lib.verify_cache()
        print(json.dumps(process_pending_cache(lib, args.cache_dir)))
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


def cmd_warmup(args) -> int:
    import time

    from raweditor_tpu.utils import ensure_backend

    ensure_backend()
    import jax

    from raweditor_tpu.ops.develop import develop_preview, develop_rgba
    from raweditor_tpu.ops.sampling import preview_shape

    h, w = args.height, args.width
    rng = np.random.default_rng(0)
    mosaic = jax.device_put(
        rng.integers(0, 4096, size=(h, w), dtype=np.uint16))
    wb = np.array([2.0, 1.0, 1.4], np.float32)
    cm = np.eye(3, dtype=np.float32)
    params = EditParams(exposure=0.1)
    compiled = []

    def step(name, fn):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        compiled.append({"program": name,
                         "seconds": round(time.perf_counter() - t0, 2)})

    step("develop_rgba", lambda: develop_rgba(mosaic, params, wb, cm))
    pw, ph = preview_shape(w, h)
    step("develop_preview",
         lambda: develop_preview(mosaic, params, wb, cm,
                                 out_w=pw, out_h=ph))
    if args.fast:
        from raweditor_tpu.ops.pallas_develop import pallas_develop_rgba

        step("pallas_develop_rgba",
             lambda: pallas_develop_rgba(mosaic, params, wb, cm))
        step("pallas_develop_rgba_poly",
             lambda: pallas_develop_rgba(mosaic, params, wb, cm,
                                         gamma="poly"))
    if args.batch_size:
        from raweditor_tpu.parallel.batch import (
            batch_develop_rgba,
            pack_params,
        )

        n = args.batch_size
        mosaics = jax.device_put(
            rng.integers(0, 4096, size=(n, h, w), dtype=np.uint16))
        pp = pack_params([params] * n)
        wbs = np.tile(wb, (n, 1))
        cms = np.tile(cm, (n, 1, 1))
        step(f"batch_develop_rgba[{n}]",
             lambda: batch_develop_rgba(mosaics, pp, wbs, cms))
        if args.fast:
            from raweditor_tpu.ops.pallas_develop import (
                pallas_batch_develop_rgba,
            )

            step(f"pallas_batch_develop_rgba[{n}]",
                 lambda: pallas_batch_develop_rgba(
                     mosaics, pp, wbs, cms, gamma="poly"))
    print(json.dumps({"width": w, "height": h, "compiled": compiled}))
    return 0


def cmd_doctor(args) -> int:
    """Production environment self-check, one JSON report on stdout.

    Statuses: ok / warn (degraded but functional: Python-fallback
    decoders, scalar JPEG, no xlat tables) / fail (unusable: stale
    native binary, unreachable JAX backend, broken catalog). Exit 1
    iff any check fails. The reference has no analogue (its checks
    are scattered panics); a headless production engine needs one
    front door for "is this box set up right".
    """
    import os

    checks = []

    def add(name, status, detail):
        checks.append({"check": name, "status": status, "detail": detail})

    import platform as _plat

    import numpy as _np
    try:
        import jax

        add("versions", "ok",
            f"python {_plat.python_version()}, jax {jax.__version__}, "
            f"numpy {_np.__version__}")
    except Exception as e:
        add("versions", "fail", f"jax import failed: {e}")

    # Native extension: loaded, and exporting everything the current
    # source binds (same canonical list test_native_binary_current
    # pins — a stale committed .so silently falls back per-function).
    from raweditor_tpu.native import get_rawkit

    rk = get_rawkit()
    if rk is None:
        add("native", "warn",
            "_rawkit extension not loaded - Python fallback decoders "
            "active (slow); build with `make native`")
    else:
        from raweditor_tpu.native import REQUIRED_EXPORTS as required
        missing = [f for f in required if not hasattr(rk, f)]
        if missing:
            add("native", "fail",
                "stale _rawkit binary (missing: " + ", ".join(missing)
                + ") - rebuild with `make native`")
        else:
            add("native", "ok", getattr(rk, "__file__", "loaded"))
        if hasattr(rk, "jpeg_simd"):
            simd = rk.jpeg_simd()
            forced = os.environ.get("RAWKIT_JPEG_NO_AVX2") == "1"
            if simd == "avx2":
                add("jpeg_simd", "ok", "avx2 (runtime-dispatched)")
            else:
                add("jpeg_simd", "warn",
                    "scalar JPEG encode ("
                    + ("RAWKIT_JPEG_NO_AVX2=1 forces it"
                       if forced else "host lacks AVX2")
                    + "; ~4x slower, bytes identical)")

    # JAX backend + persistent compile cache.
    try:
        from raweditor_tpu.utils.device import ensure_backend

        ensure_backend()
        import jax

        devs = jax.devices()
        add("backend", "ok",
            f"{devs[0].platform} x{len(devs)} ({devs[0].device_kind})")
        cache_dir = jax.config.jax_compilation_cache_dir
        if os.environ.get("RAWEDITOR_TPU_NO_COMPILE_CACHE"):
            add("compile_cache", "warn",
                "disabled by RAWEDITOR_TPU_NO_COMPILE_CACHE (first "
                "compiles of production shapes can take minutes)")
        elif cache_dir and os.path.isdir(cache_dir):
            n = sum(1 for f in os.listdir(cache_dir)
                    if not f.startswith("."))
            add("compile_cache", "ok",
                f"{cache_dir} ({n} cached executables)")
        else:
            add("compile_cache", "warn",
                f"cache dir not available ({cache_dir!r})")
    except Exception as e:
        add("backend", "fail",
            f"backend init failed: {type(e).__name__}: {str(e)[:200]}")

    # Nikon 0x0097 xlat tables (modern-NEF white balance).
    from raweditor_tpu.raw import nikon_crypt

    tables = nikon_crypt.load_xlat_tables()
    if tables is not None:
        import hashlib

        add("nikon_xlat", "ok",
            "sha256 " + hashlib.sha256(tables[0] + tables[1]).hexdigest())
    else:
        add("nikon_xlat", "warn",
            "no xlat tables (--xlat FILE / RAWEDITOR_NIKON_XLAT): "
            "0x0097 NEFs fall back to neutral WB")

    # Presets: every stored preset must load cleanly (a shared or
    # hand-edited file with NaN/unknown fields fails at apply time —
    # surface it here instead).
    from raweditor_tpu import presets as _presets

    names = _presets.list_presets()
    bad = []
    for n in names:
        try:
            _presets.load_preset(n)
        except (KeyError, ValueError) as e:
            bad.append(f"{n}: {e}")
    if bad:
        add("presets", "warn",
            f"{len(bad)}/{len(names)} presets unloadable: "
            + "; ".join(bad)[:200])
    else:
        add("presets", "ok",
            f"{len(names)} preset(s) in {_presets.presets_dir()}")

    # ICC profiles: build + self-parse (wide-gamut exports embed them).
    try:
        from raweditor_tpu.icc import profile_bytes

        sizes = {cs: len(profile_bytes(cs))
                 for cs in ("srgb", "display-p3", "adobe-rgb")}
        add("icc", "ok",
            ", ".join(f"{k} {v}B" for k, v in sizes.items()))
    except Exception as e:
        add("icc", "fail", f"{type(e).__name__}: {str(e)[:160]}")

    # Catalog, when one was named.
    if getattr(args, "db", None):
        try:
            with _open_library(args) as lib:
                add("catalog", "ok",
                    f"{args.db}: {lib.image_count()} images")
        except Exception as e:
            add("catalog", "fail",
                f"{args.db}: {type(e).__name__}: {str(e)[:200]}")

    # Optional live round trip: dispatch + 1-byte fetch of a scalar —
    # the same sync bench.py uses; on a tunneled chip this is the RPC
    # floor, locally it is sub-millisecond.
    if getattr(args, "probe", False) and all(
            c["check"] != "backend" or c["status"] == "ok"
            for c in checks):
        import time

        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda a: (a * 2.0).sum())
        x = jnp.ones((8, 128), jnp.float32)
        float(f(x))  # compile + warm
        t0 = time.perf_counter()
        float(f(x))
        add("probe", "ok",
            f"round trip {1e3 * (time.perf_counter() - t0):.2f} ms "
            "(dispatch + scalar fetch)")

    worst = ("fail" if any(c["status"] == "fail" for c in checks)
             else "warn" if any(c["status"] == "warn" for c in checks)
             else "ok")
    print(json.dumps({"status": worst, "checks": checks}))
    return 1 if worst == "fail" else 0


def cmd_bench(args) -> int:
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
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


def cmd_serve(args) -> int:
    from raweditor_tpu.pipeline.serve import serve

    serve(args.host, args.port, args.db, {
        "mode": args.mode,
        "use_pallas": args.fast,
        "fast_gamma": getattr(args, "fast_gamma", False),
        "demosaic_method": getattr(args, "demosaic", "nearest"),
        "transfer": getattr(args, "transfer", "gamma22"),
    })
    return 0


def cmd_session(args) -> int:
    from raweditor_tpu.pipeline.engine import DevelopEngine
    from raweditor_tpu.pipeline.session import DevelopSession
    from raweditor_tpu.utils.config import Config

    library = image_id = None
    try:
        if args.input.isdigit():
            library = _open_library(args)
            img = library.get_image(int(args.input))
            if img is None:
                raise SystemExit(f"no catalog image {args.input}")
            path, image_id = img.path, img.id
        else:
            path = args.input
        eng = _open_engine(
            path, "session", mode=args.mode, use_pallas=args.fast,
            fast_gamma=getattr(args, "fast_gamma", False),
            demosaic_method=getattr(args, "demosaic", "nearest"))
        if library is None and args.db is not None:
            # A file path with --db: attach (importing on first
            # successful open) so checkpoint/undo/persistence work.
            # Catalog paths are stored normalized-absolute (matching
            # import_folder).
            import os as _os
            import sqlite3 as _sq

            library = _open_library(args)
            full = _os.path.abspath(path)
            row = library.conn.execute(
                "SELECT id FROM images WHERE path = ?", (full,)
            ).fetchone()
            if row:
                image_id = row[0]
            else:
                try:
                    image_id = library.import_image(
                        full, _os.path.basename(full)
                    )
                except _sq.IntegrityError:
                    image_id = None
        DevelopSession(eng, library, image_id, Config.from_env()).repl()
    finally:
        # Close on every exit path — a decode error or an exception
        # escaping repl() must not leak the sqlite connection
        # (code-review r3).
        if library is not None:
            library.close()
    return 0


def cmd_preset(args) -> int:
    from raweditor_tpu import presets as _presets

    if args.action == "list":
        print(json.dumps({"presets": _presets.list_presets(),
                          "dir": str(_presets.presets_dir())}))
        return 0
    if args.name is None:
        raise SystemExit(f"preset {args.action} needs a name")
    try:
        if args.action == "save":
            path = _presets.save_preset(
                args.name, _params_from_args(args))
            print(json.dumps({"saved": args.name, "path": path}))
        elif args.action == "show":
            print(json.dumps(_presets.load_preset(args.name),
                             sort_keys=True))
        elif args.action == "delete":
            _presets.delete_preset(args.name)
            print(json.dumps({"deleted": args.name}))
    except (KeyError, ValueError) as e:
        raise SystemExit(f"preset: {e}")
    return 0


_COMMANDS = {
    "import": cmd_import,
    "list": cmd_list,
    "info": cmd_info,
    "convert": cmd_convert,
    "rate": cmd_rate,
    "sidecar": cmd_sidecar,
    "collect": cmd_collect,
    "develop": cmd_develop,
    "edit": cmd_edit,
    "preset": cmd_preset,
    "export": cmd_export,
    "tiers": cmd_tiers,
    "verify": cmd_verify,
    "histogram": cmd_histogram,
    "serve": cmd_serve,
    "synth": cmd_synth,
    "auto": cmd_auto,
    "session": cmd_session,
    "bench": cmd_bench,
    "warmup": cmd_warmup,
    "doctor": cmd_doctor,
}


def generate_cli_reference() -> str:
    """docs/cli.md content, generated from the argparse tree (a test
    asserts the committed file matches, so it can't go stale)."""
    ap = build_parser()
    out = ["# CLI reference", "",
           "Generated from the argparse tree "
           "(`python -m raweditor_tpu --help`).", ""]
    sub = next(a for a in ap._actions
               if hasattr(a, "choices") and a.choices)
    for name, p in sub.choices.items():
        out += [f"## `{name}`", "", "```", p.format_help().rstrip(),
                "```", ""]
    return "\n".join(out)


def main(argv=None) -> int:
    # Backend init happens lazily where JAX is actually used
    # (DevelopEngine/exporter/bench) — catalog-only commands must not
    # touch the TPU runtime.
    args = build_parser().parse_args(argv)
    _apply_env_config_defaults(args)
    if getattr(args, "xlat", None):
        from raweditor_tpu.raw import nikon_crypt

        try:
            nikon_crypt.inject_xlat_file(args.xlat)
        except (OSError, ValueError) as e:
            raise SystemExit(f"--xlat: {e}")
    try:
        return _COMMANDS[args.cmd](args)
    except BrokenPipeError:
        # `raweditor-tpu list | head`: the consumer closed the pipe.
        # Exit quietly like standard unix tools (128 + SIGPIPE),
        # pointing stdout at devnull so interpreter teardown doesn't
        # traceback on the final flush.
        import os as _os

        devnull = _os.open(_os.devnull, _os.O_WRONLY)
        _os.dup2(devnull, sys.stdout.fileno())
        return 141


if __name__ == "__main__":
    sys.exit(main())
