"""Device-time microbench for the fused Pallas develop kernel.

Profiles each kernel variant with ``jax.profiler`` and reports the
per-launch DEVICE execution time (ms) — the transport-immune ground
truth this repo uses for kernel A/B work (the tunneled dev TPU's wall
clock jitters ±20% run to run; device times don't; see
docs/performance.md). Wall-clock develops/sec for the same variants
come from bench.py.

Usage:
    python tools/kernel_bench.py [--shape 4016x6016] [--iters 24]
            [--variants pallas_poly,pallas_pow,...]

Prints one JSON line: {variant: {"device_p50_ms": ..., "n": ...}}.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="4016x6016")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument(
        "--variants",
        default="pallas_pow,pallas_poly,pallas_srgbpoly,"
        "pallas_malvar_poly,xla_poly",
    )
    args = ap.parse_args()
    h, w = (int(t) for t in args.shape.split("x"))

    import jax
    import jax.numpy as jnp

    from raweditor_tpu.ops.cfa_generic import XTRANS_PATTERN as _XTRANS
    from raweditor_tpu.ops.develop import develop_rgba
    from raweditor_tpu.ops.develop import develop_xtrans as _dx
    from raweditor_tpu.ops.pallas_develop import pallas_develop_rgba
    from raweditor_tpu.params import EditParams
    from raweditor_tpu.utils.profiling import (device_execution_times,
                                               device_trace)

    rng = np.random.default_rng(7)
    mosaic = jnp.asarray(
        rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    )
    wb = jnp.asarray([2.0, 1.0, 1.4], jnp.float32)
    cm = jnp.eye(3, dtype=jnp.float32)
    params = EditParams(exposure=0.5, contrast=10.0, saturation=20.0,
                        vibrance=15.0, highlights=-20.0, shadows=15.0)

    from raweditor_tpu.ops.pallas_develop import pallas_batch_develop_rgba
    from raweditor_tpu.parallel.batch import pack_params

    nb = 8
    mosaics_nb = jnp.asarray(jnp.broadcast_to(mosaic, (nb,) + mosaic.shape))
    wbs_nb = jnp.broadcast_to(wb, (nb, 3))
    cms_nb = jnp.broadcast_to(cm, (nb, 3, 3))

    variants = {
        "pallas_batch8_poly": lambda p: pallas_batch_develop_rgba(
            mosaics_nb, pack_params([p] * nb), wbs_nb, cms_nb,
            gamma="poly"),
        "pallas_pow": lambda p: pallas_develop_rgba(mosaic, p, wb, cm),
        "pallas_poly": lambda p: pallas_develop_rgba(
            mosaic, p, wb, cm, gamma="poly"),
        "pallas_srgbpoly": lambda p: pallas_develop_rgba(
            mosaic, p, wb, cm, gamma="srgb_poly"),
        "pallas_malvar_poly": lambda p: pallas_develop_rgba(
            mosaic, p, wb, cm, gamma="poly", demosaic="malvar"),
        "pallas_grad_poly": lambda p: pallas_develop_rgba(
            mosaic, p, wb, cm, gamma="poly", demosaic="grad"),
        "pallas_grad_srgbpoly": lambda p: pallas_develop_rgba(
            mosaic, p, wb, cm, gamma="srgb_poly", demosaic="grad"),
        "xla_poly": lambda p: develop_rgba(
            mosaic, p, wb, cm, transfer="gamma22_poly"),
        # Finish extras (sharpen/denoise, ops/extras.py): the cost of
        # the fused stencils on top of the same XLA develop.
        "xla_poly_extras": lambda p: develop_rgba(
            mosaic, p.replace(sharpen=80.0, denoise=50.0), wb, cm,
            transfer="gamma22_poly", extras=True),
        # The Pallas post-pass alternative: fused develop + the
        # standalone extras kernel over the RGBA words.
        "pallas_poly_extras_post": lambda p: __import__(
            "raweditor_tpu.ops.pallas_develop",
            fromlist=["pallas_finish_extras_rgba"],
        ).pallas_finish_extras_rgba(
            pallas_develop_rgba(mosaic, p, wb, cm, gamma="poly"),
            80.0, 50.0),
        "xla_grad_srgb": lambda p: develop_rgba(
            mosaic, p, wb, cm, transfer="srgb",
            demosaic_method="grad"),
        # Generic-CFA (X-Trans) lanes — the measurements behind the
        # routing decisions in docs/performance.md "measured and
        # rejected" (kernel wins grad only).
        "pallas_xtrans_grad_srgbpoly": lambda p: pallas_develop_rgba(
            mosaic, p, wb, cm, pattern=_XTRANS, demosaic="grad",
            gamma="srgb_poly", matrix_transpose=False),
        "pallas_xtrans_smooth_srgbpoly": lambda p: pallas_develop_rgba(
            mosaic, p, wb, cm, pattern=_XTRANS, demosaic="smooth",
            gamma="srgb_poly", matrix_transpose=False),
        "pallas_xtrans_nearest_srgbpoly": lambda p: pallas_develop_rgba(
            mosaic, p, wb, cm, pattern=_XTRANS, demosaic="nearest",
            gamma="srgb_poly", matrix_transpose=False),
        "xla_xtrans_grad_srgb": lambda p: _dx(
            mosaic, p, wb, cm, pattern=_XTRANS, demosaic_method="grad",
            transfer="srgb", rgba=True),
        "xla_xtrans_smooth_srgb": lambda p: _dx(
            mosaic, p, wb, cm, pattern=_XTRANS,
            demosaic_method="smooth", transfer="srgb", rgba=True),
        "xla_xtrans_nearest_srgb": lambda p: _dx(
            mosaic, p, wb, cm, pattern=_XTRANS,
            demosaic_method="nearest", transfer="srgb", rgba=True),
    }
    chosen = [v.strip() for v in args.variants.split(",") if v.strip()]

    def _ckmax(x):
        return jnp.max(x)

    checksum = jax.jit(_ckmax)
    out = {}
    for name in chosen:
        fn = variants[name]
        r = fn(params)  # compile
        np.asarray(checksum(r))
        with tempfile.TemporaryDirectory() as tdir:
            with device_trace(tdir):
                for i in range(args.iters):
                    r = fn(params.replace(exposure=0.5 + 0.01 * i))
                np.asarray(checksum(r))
            # Every launch inside the trace window; match any jit'd
            # module on the device plane (the pallas call is inlined
            # into the surrounding jit program). The final-sync
            # checksum launch also matches "jit_" — its module is
            # named after _ckmax, so drop its launches by name, not by
            # a duration threshold (over a 24 MP output the max
            # reduction is NOT cheap, and a threshold filter would let
            # it pollute device_min_ms).
            durs = device_execution_times(tdir, "jit_")
            ck = device_execution_times(tdir, "jit__ckmax")
        from collections import Counter

        ck_left = Counter(ck)
        kept = []
        for d in durs:
            if ck_left.get(d, 0) > 0:
                ck_left[d] -= 1
                continue
            kept.append(d)
        # Some variants dispatch small auxiliary modules per call
        # (e.g. the batch variant's params-table staging). The main
        # program launches exactly `iters` times — keep the iters
        # largest durations so p50/min measure the kernel, not the
        # helpers.
        durs = sorted(sorted(kept, reverse=True)[:args.iters])
        rec = {
            "n": len(durs),
            "device_p50_ms": round(durs[len(durs) // 2], 4) if durs else 0,
            "device_min_ms": round(durs[0], 4) if durs else 0,
        }
        out[name] = rec
        print(f"[kernel_bench] {name}: {rec}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
