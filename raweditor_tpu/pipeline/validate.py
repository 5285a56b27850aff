"""Turnkey real-file validation harness.

Every decoder in ``raw/`` is validated against this repo's own
synthetic writers (docs/formats.md lists the caveat on every row); the
reference's decode stack is field-proven through years of real camera
files (reference: src/raw/loader.rs:50-54). No real-camera corpus
exists in this build environment — so this module makes day one with
one a *validation run* instead of an engineering project:

    raweditor-tpu validate /path/to/corpus --json report.json

Per file it:

1. decodes the sensor (a ``RawDecodeError`` quarantines the file —
   the same contract the batch exporter enforces),
2. develops a small accurate-mode preview through the product engine
   (real WB + camera matrix + sRGB transfer — the path a user ships),
3. extracts the camera's own embedded preview JPEG,
4. scores structural agreement between the two renders: downsampled
   luma cross-correlation plus per-channel mean deltas. The camera
   JPEG carries the camera's own processing, so agreement is
   structural, not bit-exact — a high correlation says the decode
   (geometry, CFA phase, WB, levels) is sane; a low one flags a
   mis-decode even when no exception was raised,
5. when ``rawpy``/libraw is importable, cross-checks the decoded
   mosaic against it — a true differential oracle (max abs sensor
   diff over the common window).

Orientation is scored as the best of {as-stored, orientation-applied}:
cameras disagree about whether the embedded preview is pre-rotated,
and a 90° mismatch would zero the correlation for a perfect decode.

The report is machine-readable: per-file records plus a per-codec
rollup of decoded / quarantined / mismatch / no_preview counts.
"""

from __future__ import annotations

import io
import os
from typing import Optional

import numpy as np

from raweditor_tpu.catalog.library import RAW_EXTENSIONS
from raweditor_tpu.params import EditParams

#: Downsampled grid edge for the structural-agreement score. 32×32
#: block means are robust to demosaic/tone differences while still
#: catching geometry (stride/offset/slice) mistakes, which scramble
#: large-scale structure.
GRID = 32

#: Default classification threshold: natural scenes develop→preview
#: correlate ≥0.8 on a correct decode; a wrong stride/phase/slice
#: drops it near 0. 0.5 keeps margin for exotic camera tone curves.
DEFAULT_THRESHOLD = 0.5


def _luma_grid(rgb_u8: np.ndarray, n: int = GRID) -> np.ndarray:
    """(n, n) f64 luma block-means of an (H, W, 3) u8 image. Center
    crops to the target aspect first so letterboxed previews compare
    against the same field of view."""
    from PIL import Image

    h, w = rgb_u8.shape[:2]
    side = min(h, w)
    y0, x0 = (h - side) // 2, (w - side) // 2
    img = Image.fromarray(rgb_u8[y0:y0 + side, x0:x0 + side])
    small = np.asarray(img.resize((n, n), Image.BILINEAR), np.float64)
    return small @ np.array([0.299, 0.587, 0.114])


def _correlation(a: np.ndarray, b: np.ndarray) -> float:
    """Pearson correlation of two equal-shape grids (0.0 when either
    is constant — a flat render carries no structural evidence)."""
    a = a.ravel() - a.mean()
    b = b.ravel() - b.mean()
    na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
    if na < 1e-9 or nb < 1e-9:
        return 0.0
    return float(a @ b / (na * nb))


def _libraw_oracle(path: str, mosaic: np.ndarray) -> Optional[dict]:
    """Differential sensor check against rawpy/libraw when that
    package is importable (it is not baked into this environment —
    the harness auto-upgrades wherever it is). Shapes can legitimately
    differ (libraw reports the visible window); the comparison runs
    over the common top-left window and reports both shapes."""
    try:
        import rawpy  # noqa: F401
    except Exception:
        return None
    try:
        with rawpy.imread(str(path)) as lr:
            theirs = np.asarray(lr.raw_image_visible)
        if theirs.ndim != 2 or mosaic.ndim != 2:
            return {"libraw": "incomparable (non-2D sensor plane)"}
        h = min(theirs.shape[0], mosaic.shape[0])
        w = min(theirs.shape[1], mosaic.shape[1])
        diff = int(np.max(np.abs(
            theirs[:h, :w].astype(np.int64)
            - mosaic[:h, :w].astype(np.int64)))) if h and w else -1
        return {
            "libraw_shape": list(theirs.shape),
            "own_shape": list(mosaic.shape),
            "libraw_shape_match": list(theirs.shape) == list(mosaic.shape),
            "libraw_max_abs_diff": diff,
        }
    except Exception as e:  # noqa: BLE001 - oracle is best-effort
        return {"libraw_error": f"{type(e).__name__}: {e}"[:160]}


def validate_file(path: str, preview_px: int = 256,
                  threshold: float = DEFAULT_THRESHOLD) -> dict:
    """Validate one RAW file. Returns a record with ``status`` one of
    ``ok`` / ``mismatch`` / ``no_preview`` / ``quarantined`` plus the
    evidence fields (correlation, channel deltas, oracle results)."""
    from raweditor_tpu.pipeline.engine import DevelopEngine
    from raweditor_tpu.raw.decode import (RawDecodeError,
                                          extract_preview_jpeg)

    ext = os.path.splitext(path)[1].lstrip(".").lower()
    rec = {"file": path, "codec": ext}
    try:
        eng = DevelopEngine.open(path, mode="accurate",
                                 max_preview_width=int(preview_px),
                                 demosaic_method="malvar",
                                 transfer="srgb")
    except RawDecodeError as e:
        rec.update(status="quarantined",
                   error=f"{type(e).__name__}: {e}"[:200])
        return rec
    except (OSError, ValueError) as e:
        # Unreadable (permissions, vanished between walk and open,
        # NFS) or structurally impossible input: one bad file must
        # not abort a 10,000-file corpus run and discard its report.
        rec.update(status="unreadable",
                   error=f"{type(e).__name__}: {e}"[:200])
        return rec
    raw = eng.raw
    rec.update(
        sensor_shape=list(raw.mosaic.shape),
        cfa=raw.cfa_pattern if not raw.is_linear else "linear",
        wb_is_default=bool(raw.wb_is_default),
        camera=(raw.camera_make + " " + raw.camera_model).strip(),
    )
    oracle = _libraw_oracle(path, raw.mosaic)
    if oracle:
        rec.update(oracle)

    ours = eng.preview(EditParams())
    try:
        with open(path, "rb") as f:
            preview_bytes = extract_preview_jpeg(f.read())
    except OSError as e:
        rec.update(status="unreadable",
                   error=f"{type(e).__name__}: {e}"[:200])
        return rec
    if not preview_bytes:
        rec["status"] = "no_preview"
        return rec
    try:
        from PIL import Image

        cam = np.asarray(
            Image.open(io.BytesIO(preview_bytes)).convert("RGB"))
    except Exception as e:  # noqa: BLE001 - a broken embedded JPEG
        rec.update(status="no_preview",
                   preview_error=f"{type(e).__name__}: {e}"[:160])
        return rec
    rec["preview_shape"] = list(cam.shape[:2])

    cam_grid = _luma_grid(cam)
    best_corr, best_orient = -1.0, 1
    for orient, img in ((1, ours),
                        (raw.orientation,
                         eng.apply_orientation(ours, raw.orientation))):
        corr = _correlation(_luma_grid(img), cam_grid)
        if corr > best_corr:
            best_corr, best_orient = corr, orient
        if orient == 1 and raw.orientation == 1:
            break
    ours_best = (ours if best_orient == 1
                 else eng.apply_orientation(ours, raw.orientation))
    # Per-channel mean deltas (0-255 scale): catches WB/level mistakes
    # that preserve structure (correlation is luma-only by design).
    mean_dl = [
        round(float(ours_best[..., c].mean() - cam[..., c].mean()), 1)
        for c in range(3)
    ]
    rec.update(
        correlation=round(best_corr, 4),
        scored_orientation=int(best_orient),
        channel_mean_delta=mean_dl,
        status="ok" if best_corr >= threshold else "mismatch",
    )
    return rec


def load_manifest(path: str) -> dict:
    """Load + structurally validate a corpus manifest (JSON):

    ``{"name": ..., "files": [{"file": "rel/path.nef",
       "codec": "nef", "sha256": "..."|null, "url": ...,
       "camera": ...}, ...]}``

    ``file`` is required per entry; ``codec`` (expected routing,
    normally the extension), ``sha256`` (content pin; null = record
    with --pin on first fetch), ``url``/``camera``/``notes`` are
    optional provenance. Raises ValueError on malformed input so a
    typo'd manifest fails loudly, not as 'everything missing'."""
    import json as _json

    with open(path) as f:
        doc = _json.load(f)
    if not isinstance(doc, dict) or not isinstance(doc.get("files"),
                                                   list):
        raise ValueError(
            f"manifest {path}: expected an object with a 'files' list")
    for i, ent in enumerate(doc["files"]):
        if not isinstance(ent, dict) or not ent.get("file"):
            raise ValueError(
                f"manifest {path}: files[{i}] needs a 'file' key")
        sha = ent.get("sha256")
        if sha is not None and (not isinstance(sha, str)
                                or len(sha) != 64):
            raise ValueError(
                f"manifest {path}: files[{i}].sha256 must be a 64-char "
                f"hex digest or null, got {sha!r}")
    return doc


def _sha256_file(path: str) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def validate_manifest(root: str, manifest_path: str,
                      pin: bool = False,
                      preview_px: int = 256,
                      threshold: float = DEFAULT_THRESHOLD) -> dict:
    """Validate a corpus against a pinned manifest: presence, SHA-256
    (when pinned), expected codec routing, then the full per-file
    structural validation (validate_file). Day one with a public
    corpus is literally fetch + `validate --manifest` (VERDICT r4
    item 6); the environment this repo was built in has no network
    egress, so hashes ship null and ``pin=True`` records them from
    the first trusted fetch (trust-on-first-use, like SSH).

    Returns the aggregate report; ``summary.passed`` is true iff
    every entry is present, hash-clean, codec-routed as expected, and
    structurally ok (or no_preview)."""
    import json as _json

    doc = load_manifest(manifest_path)
    files, per_codec = [], {}
    dirty = False
    for ent in doc["files"]:
        rec = {"file": ent["file"],
               "codec": ent.get("codec",
                                os.path.splitext(ent["file"])[1]
                                .lstrip(".").lower())}
        path = os.path.join(root, ent["file"])
        if not os.path.exists(path):
            rec["status"] = "missing"
            if ent.get("url"):
                rec["url"] = ent["url"]
        else:
            digest = _sha256_file(path)
            want = ent.get("sha256")
            if want is None and pin:
                ent["sha256"] = digest
                dirty = True
                want = digest
            if want is not None and digest != want:
                rec.update(status="hash_mismatch", sha256=digest,
                           expected_sha256=want)
            else:
                rec.update(validate_file(path, preview_px=preview_px,
                                         threshold=threshold))
                rec["file"] = ent["file"]  # keep the relative name
                got_codec = os.path.splitext(path)[1].lstrip(".").lower()
                if got_codec != rec["codec"]:
                    rec["status"] = "codec_mismatch"
        files.append(rec)
        bucket = per_codec.setdefault(rec["codec"], {})
        bucket[rec["status"]] = bucket.get(rec["status"], 0) + 1
    if dirty:
        with open(manifest_path, "w") as f:
            _json.dump(doc, f, indent=1)
            f.write("\n")
    bad = {"missing", "hash_mismatch", "codec_mismatch", "mismatch",
           "quarantined", "unreadable"}
    n_bad = sum(n for b in per_codec.values()
                for s, n in b.items() if s in bad)
    return {
        "root": os.fspath(root),
        "manifest": os.fspath(manifest_path),
        "manifest_name": doc.get("name"),
        "threshold": threshold,
        "pinned": pin and dirty,
        "files": files,
        "per_codec": per_codec,
        "summary": {
            "total": len(files),
            "ok": sum(b.get("ok", 0) for b in per_codec.values()),
            "missing": sum(b.get("missing", 0)
                           for b in per_codec.values()),
            "hash_mismatch": sum(b.get("hash_mismatch", 0)
                                 for b in per_codec.values()),
            "passed": n_bad == 0,
        },
    }


def validate_dir(root: str, limit: Optional[int] = None,
                 preview_px: int = 256,
                 threshold: float = DEFAULT_THRESHOLD,
                 recursive: bool = True,
                 threads: int = 1) -> dict:
    """Walk ``root`` for RAW files (the catalog's import extension
    set) and validate each. Returns the aggregate report:

    ``files``      per-file records (validate_file)
    ``per_codec``  {ext: {decoded, ok, mismatch, no_preview,
                   quarantined, unreadable}}
    ``summary``    totals + the pass verdict (ok iff nothing
                   quarantined or mismatched)

    ``threads`` parallelizes the per-file work (decode is GIL-released
    C++, the small develop is a device dispatch — both overlap), so a
    10k-file corpus run scales with host cores; records keep corpus
    order regardless.
    """
    paths = []
    if recursive:
        for dirpath, _dirs, names in os.walk(root):
            for name in sorted(names):
                paths.append(os.path.join(dirpath, name))
    else:
        paths = sorted(
            os.path.join(root, n) for n in os.listdir(root)
            if os.path.isfile(os.path.join(root, n)))
    raw_paths = [p for p in paths
                 if os.path.splitext(p)[1].lstrip(".").lower()
                 in RAW_EXTENSIONS]
    if limit:
        raw_paths = raw_paths[:int(limit)]

    def _one(p):
        return validate_file(p, preview_px=preview_px,
                             threshold=threshold)

    if threads and int(threads) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=int(threads)) as pool:
            records = list(pool.map(_one, raw_paths))
    else:
        records = [_one(p) for p in raw_paths]

    files, per_codec = [], {}
    for rec in records:
        files.append(rec)
        bucket = per_codec.setdefault(rec["codec"], {
            "decoded": 0, "ok": 0, "mismatch": 0, "no_preview": 0,
            "quarantined": 0, "unreadable": 0,
        })
        if rec["status"] not in ("quarantined", "unreadable"):
            bucket["decoded"] += 1
        bucket[rec["status"]] += 1

    n_bad = sum(b["quarantined"] + b["mismatch"] + b["unreadable"]
                for b in per_codec.values())
    return {
        "root": os.fspath(root),
        "threshold": threshold,
        "files": files,
        "per_codec": per_codec,
        "summary": {
            "total": len(files),
            "ok": sum(b["ok"] for b in per_codec.values()),
            "mismatch": sum(b["mismatch"] for b in per_codec.values()),
            "no_preview": sum(b["no_preview"]
                              for b in per_codec.values()),
            "quarantined": sum(b["quarantined"]
                               for b in per_codec.values()),
            "unreadable": sum(b["unreadable"]
                              for b in per_codec.values()),
            "passed": n_bad == 0,
        },
    }
