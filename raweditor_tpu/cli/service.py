"""Interactive session + TCP service subcommands."""

from __future__ import annotations

from raweditor_tpu.cli._shared import _open_engine, _open_library


def _session_config(args):
    """The session Config: env/JSON layers, with --no-pipeline forcing
    true-sync slider ticks over the default pipelined mode."""
    import dataclasses

    from raweditor_tpu.utils.config import Config

    cfg = Config.from_env()
    if getattr(args, "no_pipeline", False):
        cfg = dataclasses.replace(cfg, session_pipeline_depth=0)
    return cfg


def cmd_serve(args) -> int:
    from raweditor_tpu.pipeline.serve import serve

    serve(args.host, args.port, args.db, {
        "mode": args.mode,
        "use_pallas": args.fast,
        "fast_gamma": getattr(args, "fast_gamma", False),
        "demosaic_method": getattr(args, "demosaic", "nearest"),
        "transfer": getattr(args, "transfer", "gamma22"),
    }, session_config=_session_config(args))
    return 0


def cmd_session(args) -> int:
    from raweditor_tpu.pipeline.engine import DevelopEngine
    from raweditor_tpu.pipeline.session import DevelopSession

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
        DevelopSession(eng, library, image_id,
                       _session_config(args)).repl()
    finally:
        # Close on every exit path — a decode error or an exception
        # escaping repl() must not leak the sqlite connection
        # (code-review r3).
        if library is not None:
            library.close()
    return 0
