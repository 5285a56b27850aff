"""End-to-end pipeline benchmark: decode → sharded develop → encode.

Covers BASELINE.json configs 1-4 at configurable scale (the canonical
driver benchmark stays bench.py; this one measures the full host+device
pipeline including the C++ decoder and JPEG encode).

    python benchmarks/pipeline_bench.py --images 32 --width 1504 --height 1004
    python benchmarks/pipeline_bench.py --images 8 --full-res   # 24 MP
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--width", type=int, default=1504)
    ap.add_argument("--height", type=int, default=1004)
    ap.add_argument("--fast", action="store_true",
                    help="batched Pallas kernel + polynomial gamma")
    ap.add_argument("--full-res", action="store_true",
                    help="use 6016x4016 (24 MP) mosaics")
    ap.add_argument("--compression", choices=("none", "ljpeg", "nikon"),
                    default="none")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--devices", type=int, default=0,
                    help="shard the batch across an N-device "
                         "('batch','row') mesh — the BASELINE 8-chip "
                         "config; with fewer live devices a virtual "
                         "CPU mesh of that size is built")
    ap.add_argument("--row", type=int, default=1,
                    help="row-shard factor of the mesh (with --devices)")
    ap.add_argument("--decode-threads", type=int, default=4)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); note jax "
                         "captures JAX_PLATFORMS at import, so the env "
                         "var alone may be too late")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from raweditor_tpu.utils import ensure_backend

    ensure_backend()

    mesh = None
    if args.devices:
        if len(jax.devices()) < args.devices:
            import jax.extend.backend

            jax.extend.backend.clear_backends()
            jax.config.update("jax_num_cpu_devices", args.devices)
            jax.config.update("jax_platforms", "cpu")
        from raweditor_tpu.parallel import batch_row_mesh

        mesh = batch_row_mesh(n_devices=args.devices, row=args.row)

    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export
    from raweditor_tpu.raw.synth import write_synthetic_raw

    w, h = (6016, 4016) if args.full_res else (args.width, args.height)
    tmp = tempfile.mkdtemp(prefix="raweditor-bench-")
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    jobs = []
    base = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    for i in range(args.images):
        # Perturb so files differ without re-generating full mosaics.
        mosaic = np.roll(base, i, axis=1)
        path = os.path.join(tmp, f"shot{i}.nef")
        write_synthetic_raw(path, mosaic, compression=args.compression)
        jobs.append(
            ExportJob(
                raw_path=path,
                out_path=os.path.join(tmp, "out", f"shot{i}.jpg"),
                params=EditParams(exposure=0.01 * i, saturation=10.0),
            )
        )
    gen_s = time.perf_counter() - t0

    report = run_batch_export(
        jobs, mesh=mesh, batch_size=args.batch_size,
        decode_threads=args.decode_threads,
        use_pallas=args.fast, fast_gamma=args.fast,
    )
    out = report.as_dict()
    out.update({
        "mosaic": f"{w}x{h}",
        "compression": args.compression,
        "mesh": (f"{args.devices}dev(batch={args.devices // args.row}"
                 f",row={args.row})" if mesh is not None else "none"),
        "fixture_gen_seconds": round(gen_s, 2),
        "megapixels_per_sec": round(
            report.succeeded * w * h / 1e6 / report.seconds, 1
        ),
    })
    print(json.dumps(out))
    if not args.keep:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
