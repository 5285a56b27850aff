"""The argparse tree — one function so ``--help`` ordering and text stay byte-stable across the subcommand modules."""

from __future__ import annotations

import argparse


from raweditor_tpu.cli._shared import _add_lens_args, _add_slider_args


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
    p.add_argument("--progress", action="store_true",
                   help="print a JSON progress line (done/failed/"
                        "total/rate/ETA) to stderr ~1/s as images "
                        "complete")
    p.add_argument("--arena-respawn", action="store_true",
                   help="re-exec with MALLOC_ARENA_MAX=1 before any "
                        "thread starts (the measured best-case RSS "
                        "profile: peak-then-decline) unless already "
                        "launched that strict; also "
                        "RAWEDITOR_TPU_ARENA_RESPAWN=1")
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

    p = sub.add_parser(
        "validate",
        help="validate the decoder stack against a folder of real RAW "
             "files: decode, develop, and score structural agreement "
             "with each file's embedded camera preview "
             "(pipeline/validate.py; rawpy is used as a differential "
             "oracle when importable)",
    )
    p.add_argument("dir", help="folder of RAW files (walked recursively)")
    p.add_argument("--limit", type=int, default=None,
                   help="validate at most N files")
    p.add_argument("--threshold", type=float, default=None,
                   help="correlation below this marks a mismatch "
                        "(default 0.5)")
    p.add_argument("--preview-px", type=int, default=256,
                   help="width of the develop used for scoring")
    p.add_argument("--threads", type=int, default=1,
                   help="validate N files concurrently (decode is "
                        "GIL-released; scales with host cores)")
    p.add_argument("--no-recursive", action="store_true",
                   help="top-level files only")
    p.add_argument("--json", dest="json_out", default=None,
                   help="also write the full per-file report here")
    p.add_argument("--per-file", action="store_true",
                   help="include per-file records on stdout")
    p.add_argument("--manifest", default=None,
                   help="validate against a pinned corpus manifest "
                        "(JSON file list with per-file SHA-256 and "
                        "expected codec; see "
                        "docs/corpus_manifest.template.json)")
    p.add_argument("--pin", action="store_true",
                   help="with --manifest: record SHA-256 for present "
                        "files whose hash is still null "
                        "(trust-on-first-use)")

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
    p.add_argument("--no-pipeline", action="store_true",
                   help="true-sync slider ticks (disable the default "
                        "latest-wins pipelined preview mode)")

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
    p.add_argument("--no-pipeline", action="store_true",
                   help="true-sync slider ticks (disable the default "
                        "latest-wins pipelined preview mode)")

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
