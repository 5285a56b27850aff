"""Batch export + warmup subcommands."""

from __future__ import annotations

import json

import numpy as np

from raweditor_tpu.params import EditParams
from raweditor_tpu.cli._shared import (
    _finite_rotate,
    _open_library,
    _params_from_args,
    _parse_crop,
    _parse_lens,
    _parse_perspective,
)


def cmd_export(args) -> int:
    # FIRST: the opt-in arena respawn must run before thread pools or
    # the JAX backend exist (exec replaces the process; glibc reads
    # MALLOC_ARENA_MAX only at startup). No-op unless --arena-respawn
    # or RAWEDITOR_TPU_ARENA_RESPAWN=1.
    from raweditor_tpu.utils.memory import maybe_respawn_for_arena_cap

    maybe_respawn_for_arena_cap(
        enabled=getattr(args, "arena_respawn", False))

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
                or getattr(args, "curve", None) is not None
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
        perspective=_parse_perspective(args),
        on_progress=(_progress_printer()
                     if getattr(args, "progress", False) else None),
    )


def _progress_printer():
    """--progress: one JSON line per update on stderr (stdout stays
    the single report line) with done/failed/total, rate, and an ETA
    from the completed-image rate."""
    import sys
    import time as _time

    def emit(done, failed, total, seconds):
        rate = done / seconds if seconds > 0 else 0.0
        left = total - done - failed
        eta = left / rate if rate > 0 else None
        print(json.dumps({
            "progress": True, "done": done, "failed": failed,
            "total": total, "seconds": round(seconds, 1),
            "images_per_sec": round(rate, 3),
            "eta_seconds": round(eta, 1) if eta is not None else None,
            "ts": _time.strftime("%H:%M:%S"),
        }), file=sys.stderr, flush=True)

    return emit


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
