"""Runnable tour of the framework (CPU-safe, no TPU required).

    PYTHONPATH=/root/repo:$PYTHONPATH python examples/quickstart.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import tempfile
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from raweditor_tpu import EditParams
    from raweditor_tpu.catalog import Library
    from raweditor_tpu.pipeline import DevelopEngine, run_batch_export
    from raweditor_tpu.pipeline.export import jobs_from_catalog
    from raweditor_tpu.pipeline.session import DevelopSession
    from raweditor_tpu.pipeline.tiers import process_pending_cache
    from raweditor_tpu.raw.synth import write_synthetic_raw

    work = Path(tempfile.mkdtemp(prefix="raweditor-quickstart-"))
    print(f"working in {work}")

    # 1. Make a couple of synthetic RAW files (stand-ins for camera NEFs).
    rng = np.random.default_rng(42)
    photos = work / "photos"
    photos.mkdir()
    for i, compression in enumerate(("none", "ljpeg")):
        write_synthetic_raw(
            photos / f"shot{i}.nef",
            rng.integers(0, 4096, size=(240, 320), dtype=np.uint16),
            compression=compression,
        )

    # 2. Catalog: import + preview tier cache.
    lib = Library(work / "catalog.db")
    print("import:", lib.import_folder(photos))
    print("tiers:", process_pending_cache(lib, cache_dir=work / "cache"))

    # 3. Interactive develop: open an image, move sliders, export.
    images = lib.get_all_images()
    eng = DevelopEngine.open(images[0].path)
    session = DevelopSession(eng, lib, images[0].id)
    print("slider tick:", session.set_slider("exposure", 0.8))
    print("histogram sums:",
          [int(s) for s in np.asarray(session.histogram()["r"])[:3]], "...")
    session.checkpoint()
    session.set_slider("saturation", 30.0)
    print("history:", len(session.history()["history"]), "entries")
    out = work / "developed.jpg"
    session.full(str(out))
    print("exported:", out, out.stat().st_size, "bytes")

    # 4. Batch export with the stored edits.
    report = run_batch_export(
        jobs_from_catalog(lib, work / "out"), batch_size=2
    )
    print("batch export:", json.dumps(report.as_dict()))
    lib.close()


if __name__ == "__main__":
    main()
