"""Diagnostics: the doctor self-check, real-file decoder validation,
and the bench runner."""

from __future__ import annotations

import json
import os

from raweditor_tpu.cli._shared import _open_library


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

    # glibc malloc arenas: long batch-export runs move GB of 36 MB/img
    # transfer buffers across several threads; default per-thread
    # arenas retain them and RSS grows with cumulative volume
    # (measured: +3.4 GB over a 100-image 24 MP soak, flat with
    # MALLOC_ARENA_MAX=1 — docs/bench_r04_session1/4.json).
    # run_batch_export applies an in-process mitigation (mallopt arena
    # cap + mmap-threshold pin + per-flush malloc_trim,
    # utils/memory.py) unless disabled; a strict launch-time
    # MALLOC_ARENA_MAX remains the strongest setting.
    arena = os.environ.get("MALLOC_ARENA_MAX", "").strip()
    from raweditor_tpu.utils.memory import arena_cap_from_env, can_cap

    cap = arena_cap_from_env()
    if arena.isdigit() and 0 < int(arena) <= 2:
        add("malloc_arenas", "ok", f"MALLOC_ARENA_MAX={arena}")
    elif cap and can_cap():
        detail = (f"exporter mitigates in-process (mallopt "
                  f"M_ARENA_MAX={cap} + 1 MB mmap threshold + "
                  "per-flush malloc_trim); for the strictest RSS bound "
                  "launch with MALLOC_ARENA_MAX=1 or use "
                  "`export --arena-respawn` / "
                  "RAWEDITOR_TPU_ARENA_RESPAWN=1 (re-execs once with "
                  "it set; docs/performance.md, RSS finding)")
        if arena:
            detail = (f"MALLOC_ARENA_MAX={arena} is weaker than the "
                      "soak-validated <=2; " + detail)
        add("malloc_arenas", "ok", detail)
    elif cap:
        add("malloc_arenas", "warn",
            "libc without mallopt (non-glibc): in-process arena cap "
            "unavailable; RSS retention behavior unknown on this "
            "platform")
    else:
        add("malloc_arenas", "warn",
            "in-process arena cap disabled "
            "(RAWEDITOR_TPU_MALLOC_ARENA_CAP=0"
            + (f"; MALLOC_ARENA_MAX={arena} set but >2" if arena
               else "; MALLOC_ARENA_MAX unset")
            + ") - long export runs retain RSS via glibc arenas "
            "(~35 MB/image observed); set MALLOC_ARENA_MAX=1 or 2 "
            "for production batch hosts")

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


def cmd_validate(args) -> int:
    """Real-file decoder validation (pipeline/validate.py): the
    day-one button for a camera corpus. Exit 1 when any file
    quarantined or structurally mismatched — CI-composable."""
    from raweditor_tpu.pipeline.validate import (DEFAULT_THRESHOLD,
                                                 validate_dir,
                                                 validate_manifest)

    if not os.path.isdir(args.dir):
        raise SystemExit(f"not a directory: {args.dir}")
    threshold = (args.threshold if args.threshold is not None
                 else DEFAULT_THRESHOLD)
    if getattr(args, "manifest", None):
        report = validate_manifest(
            args.dir, args.manifest, pin=getattr(args, "pin", False),
            preview_px=args.preview_px, threshold=threshold,
        )
    else:
        report = validate_dir(
            args.dir, limit=args.limit,
            preview_px=args.preview_px,
            threshold=threshold,
            recursive=not args.no_recursive,
            threads=max(1, getattr(args, "threads", 1)),
        )
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)
    out = dict(report)
    if not args.per_file:
        out.pop("files")
    print(json.dumps(out))
    return 0 if report["summary"]["passed"] else 1


def cmd_bench(args) -> int:
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(__file__))), "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    return 0
