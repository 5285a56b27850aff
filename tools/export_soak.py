#!/usr/bin/env python
"""Full-resolution sustained export soak (the BASELINE batch config,
shape-true): N synthetic 24 MP Nikon-compressed NEFs through the
production batch exporter on the live backend, with a watcher thread
sampling progress + RSS so rate stability over the run is on record.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/export_soak.py \
        --images 100 --out docs/bench_r04_session1.json

The watcher samples (elapsed_s, outputs_done, rss_mb) every few
seconds; flat per-quartile rates and flat RSS are the "no degradation"
evidence the session capture exists to provide. A warmup pass first
compiles the batched develop for the shape so the timed run measures
steady state, not compilation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _rss_mb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return round(int(line.split()[1]) / 1024.0, 1)
    except OSError:
        pass
    return 0.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=100)
    ap.add_argument("--width", type=int, default=6016)
    ap.add_argument("--height", type=int, default=4016)
    ap.add_argument("--compression", default="nikon")
    ap.add_argument("--batch-size", type=int, default=2,
                    help="2 keeps the staged working set inside the "
                         "shared dev chip's observed ~1 GB free HBM")
    ap.add_argument("--decode-threads", type=int, default=0,
                    help="0 = cpu count")
    ap.add_argument("--sample-s", type=float, default=5.0)
    ap.add_argument("--out", default=None,
                    help="write the session JSON here (stdout always)")
    ap.add_argument("--keep-fixtures", action="store_true")
    args = ap.parse_args()

    from raweditor_tpu.utils import ensure_backend

    ensure_backend()
    import jax

    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export
    from raweditor_tpu.raw.synth import write_synthetic_raw

    t0 = time.perf_counter()

    def log(msg):
        print(f"[soak +{time.perf_counter() - t0:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    w, h = args.width, args.height
    threads = args.decode_threads or (os.cpu_count() or 1)
    tmp = tempfile.mkdtemp(prefix="raweditor-soak-")
    rng = np.random.default_rng(0)
    log(f"generating {args.images} fixtures ({w}x{h} "
        f"{args.compression}) in {tmp}")
    base = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    jobs = []
    for i in range(args.images):
        path = os.path.join(tmp, f"shot{i:04d}.nef")
        # Roll so files differ (distinct decodes/devices/encodes)
        # without paying 100 full synth encodes of fresh noise.
        write_synthetic_raw(path, np.roll(base, i * 7, axis=1),
                            compression=args.compression)
        jobs.append(ExportJob(
            raw_path=path,
            out_path=os.path.join(tmp, "out", f"shot{i:04d}.jpg"),
            params=EditParams(exposure=0.002 * i, saturation=10.0),
        ))
        if (i + 1) % 20 == 0:
            log(f"  {i + 1}/{args.images}")
    gen_s = time.perf_counter() - t0

    kwargs = dict(batch_size=args.batch_size, decode_threads=threads,
                  encode_threads=threads, use_pallas=True,
                  fast_gamma=True)
    log("warmup (compiles the batched develop for this shape)")
    warm = [ExportJob(j.raw_path,
                      os.path.join(tmp, "warm",
                                   os.path.basename(j.out_path)),
                      j.params)
            for j in jobs[:args.batch_size]]
    run_batch_export(warm, **kwargs)
    log("warmup done; starting the timed soak")

    out_dir = os.path.join(tmp, "out")
    samples = []
    stop = threading.Event()

    def watch():
        while not stop.wait(args.sample_s):
            try:
                done = len(os.listdir(out_dir))
            except OSError:
                done = 0
            samples.append({
                "t_s": round(time.perf_counter() - t1, 1),
                "done": done,
                "rss_mb": _rss_mb(),
            })
            if samples and len(samples) % 6 == 0:
                s = samples[-1]
                log(f"  {s['done']}/{args.images} at {s['t_s']}s, "
                    f"rss {s['rss_mb']} MB")

    t1 = time.perf_counter()
    watcher = threading.Thread(target=watch, daemon=True)
    watcher.start()
    report = run_batch_export(jobs, **kwargs)
    wall = time.perf_counter() - t1
    stop.set()
    watcher.join(timeout=2 * args.sample_s)

    # Per-quartile completion rates from the samples: flat = sustained.
    quartiles = []
    if samples:
        q = max(1, len(samples) // 4)
        prev_t, prev_d = 0.0, 0
        for k in range(0, len(samples), q):
            s = samples[min(k + q - 1, len(samples) - 1)]
            dt = s["t_s"] - prev_t
            if dt > 0:
                quartiles.append(round((s["done"] - prev_d) / dt, 3))
            prev_t, prev_d = s["t_s"], s["done"]

    doc = {
        # The canned comment must describe what to READ, not assert a
        # conclusion the samples may contradict (code-review r4: a
        # capture recorded "rss flat" above samples that grew).
        "_comment": (
            "Sustained full-resolution export soak "
            "(tools/export_soak.py): BASELINE batch config shape-true "
            "on the live backend. Judge degradation from the recorded "
            "samples: quartile_img_per_s for rate stability, the rss_mb "
            "series for memory behavior."),
        "mosaic": f"{w}x{h}",
        "compression": args.compression,
        "e2e_images": args.images,
        "batch_size": args.batch_size,
        "decode_threads": threads,
        "device": str(jax.devices()[0]),
        "stage_budget_mb": round(int(os.environ.get(
            "RAWEDITOR_TPU_STAGE_BUDGET_MB", "512"))),
        "fixture_gen_seconds": round(gen_s, 1),
        "wall_seconds": round(wall, 1),
        "img_per_s": round(report.succeeded / wall, 3) if wall else 0.0,
        "quartile_img_per_s": quartiles,
        "rss_first_mb": samples[0]["rss_mb"] if samples else _rss_mb(),
        "rss_last_mb": samples[-1]["rss_mb"] if samples else _rss_mb(),
        "samples": samples,
        "report": report.as_dict(),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        log(f"wrote {args.out}")
    print(json.dumps(doc))
    if not args.keep_fixtures:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
