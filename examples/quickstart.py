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

    # 4. Batch export with the stored edits. All-JPEG runs fetch
    # device-subsampled YCbCr planes (1.5 bytes/pixel) and encode
    # through the native JFIF encoder when the extension is built.
    report = run_batch_export(
        jobs_from_catalog(lib, work / "out"), batch_size=2
    )
    print("batch export:", json.dumps(report.as_dict()))
    lib.close()

    # 5. Round-2 capabilities: Canon CR3 (CRX codec — beyond the
    # reference app, whose backend can't decode CR3 sensor data),
    # accurate color mode, the gradient-weighted demosaic, and
    # 16-bit TIFF output.
    from raweditor_tpu.raw.bmff import write_synthetic_cr3

    h, w = 120, 160
    yy, xx = np.mgrid[0:h, 0:w]
    scene = ((xx + yy) / (w + h) * 16383).astype(np.uint16)
    cr3 = work / "shot.cr3"
    write_synthetic_cr3(cr3, mosaic=scene, model="EOS Quickstart",
                        levels=2, q_detail=8)  # C-RAW wavelet variant
    eng2 = DevelopEngine.open(cr3, mode="accurate",
                              demosaic_method="grad", transfer="srgb")
    print("cr3 decode:", eng2.raw.camera_model,
          f"{eng2.width}x{eng2.height}",
          f"white={eng2.white_level:.0f}")
    tif = work / "archival.tiff"
    eng2.export(tif, EditParams(exposure=0.3))
    print("16-bit tiff:", tif.stat().st_size, "bytes")

    # 6. Finish extras (beyond the reference's ten sliders): luma
    # unsharp mask + edge-preserving denoise, fused into the same
    # develop program (ops/extras.py). Defaults off — parity stays
    # bit-exact; the sliders persist through the catalog like any
    # other edit.
    crisp = work / "crisp.jpg"
    eng2.export(crisp, EditParams(exposure=0.3, sharpen=80.0,
                                  denoise=30.0, clarity=40.0,
                                  curve_shadows=25.0, vignette=-20.0,
                                  grade_shadow_hue=30.0,
                                  grade_shadow_sat=25.0,
                                  grade_high_hue=220.0,
                                  grade_high_sat=15.0),
                quality=92)
    print("finished jpeg (sharpen+denoise+curve+clarity+vignette"
          "+split-tone):", crisp.stat().st_size, "bytes")

    # Presets: save the look, reapply it by name.
    import os as _os

    _os.environ.setdefault("RAWEDITOR_TPU_PRESETS_DIR",
                           str(work / "presets"))
    from raweditor_tpu import presets as _presets

    _presets.save_preset("tour-look", EditParams(sharpen=80.0,
                                                 clarity=40.0))
    looked = _presets.apply_preset(EditParams(exposure=0.3),
                                   "tour-look")
    print("preset 'tour-look' fields:",
          sorted(_presets.load_preset("tour-look")),
          "| applied exposure kept:", float(looked.exposure))

    # 7. Output-stage geometry (straighten + crop) and wide-gamut
    # output with an embedded ICC profile — both beyond the
    # reference (ops/geometry.py, raweditor_tpu/icc.py).
    level = work / "level.jpg"
    eng2.export(level, EditParams(exposure=0.3), rotate=2.5)
    print("straightened jpeg:", level.stat().st_size, "bytes")
    from raweditor_tpu.pipeline.engine import DevelopEngine as _DE

    p3 = work / "wide.jpg"
    _DE.open(cr3, mode="accurate",
             color_space="display-p3").export(p3, EditParams())
    from PIL import Image

    print("display-p3 jpeg:", p3.stat().st_size, "bytes, icc:",
          bool(Image.open(p3).info.get("icc_profile")))


if __name__ == "__main__":
    main()
