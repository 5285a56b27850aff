"""Multi-tier preview cache generation.

The reference extracts the largest embedded JPEG from each RAW once and
Lanczos-resizes it into three width tiers — 256 px grid thumbs, 384 px
instant previews, 1280 px working previews — stored as
``<cache>/<tier>/<image_id>.jpg`` (reference: raw/processor.rs:13-88).
Same tiers, same layout here. Failures quarantine the image
('failed' cache status) instead of aborting the run
(reference: main.rs:460-464).
"""

from __future__ import annotations

import io
import os
from pathlib import Path
from typing import Optional, Tuple

from raweditor_tpu.catalog import Library

# (reference: raw/processor.rs:13-15)
TIER_THUMB = 256
TIER_INSTANT = 384
TIER_WORKING = 1280
TIERS = (("thumb", TIER_THUMB), ("instant", TIER_INSTANT),
         ("working", TIER_WORKING))


def _tiers_spec():
    """The (name, width) tier spec: the parity constants above overlaid
    with the RAWEDITOR_TPU_TIER_* env config (utils/config.py declares
    the fields; affects new generations only — stored cache paths keep
    whatever widths they were built with)."""
    from raweditor_tpu.utils.config import Config

    cfg = Config.from_env()
    return (("thumb", cfg.tier_thumb), ("instant", cfg.tier_instant),
            ("working", cfg.tier_working))


def default_cache_dir() -> Path:
    base = os.environ.get("XDG_CACHE_HOME")
    base = Path(base) if base else Path.home() / ".cache"
    return base / "raw-editor"


def watch_folder(lib, folder, cache_dir=None, interval: float = 2.0,
                 iterations: Optional[int] = None,
                 on_cycle=None, tiers: bool = True) -> dict:
    """Continuous ingest: poll ``folder`` for new RAW files, import
    them, and work the pending tier queue — the tethered-shoot loop
    the reference's one-shot import dialog can't do.

    A file is imported only once its (size, mtime) is unchanged across
    two consecutive polls, so a shot still streaming from the camera
    is never decoded half-written; if decoding a file still fails, its
    'failed' status is retried once per on-disk file state — when the
    file changes, and once at watcher start for failures recorded
    before this run (the file may have finished writing while no
    watcher was up). Already-imported paths are skipped without
    touching the catalog (the UNIQUE constraint stays the backstop).
    ``iterations=None`` runs until KeyboardInterrupt; ``on_cycle(stats)``
    (when given) observes each cycle; ``tiers=False`` imports only.

    Returns cumulative {'cycles', 'imported', 'cached', 'failed'}."""
    import sqlite3
    import time as _time

    from raweditor_tpu.catalog import RAW_EXTENSIONS

    totals = {"cycles": 0, "imported": 0, "cached": 0, "failed": 0}
    seen: dict = {}  # path -> (size, mtime) from the previous poll
    # Paths known to be in the catalog: without this, every stable
    # file re-runs a failing INSERT on every poll — O(folder) catalog
    # writes per cycle on a large archive.
    imported_paths = {img.path for img in lib.get_all_images()}
    failed_sigs: dict = {}  # path -> (size, mtime) that already failed

    def _scan() -> dict:
        sigs = {}
        seen_dirs = set()  # realpath cycle guard (as Library.import_folder)
        for root, dirs, files in os.walk(folder, followlinks=True):
            real = os.path.realpath(root)
            if real in seen_dirs:
                dirs[:] = []  # symlink cycle: don't descend again
                continue
            seen_dirs.add(real)
            for name in sorted(files):
                ext = os.path.splitext(name)[1].lstrip(".").lower()
                if ext not in RAW_EXTENSIONS:
                    continue
                full = os.path.abspath(os.path.join(root, name))
                try:
                    st = os.stat(full)
                except OSError:
                    continue
                sigs[full] = (st.st_size, st.st_mtime)
        return sigs

    try:
        while iterations is None or totals["cycles"] < iterations:
            sigs = _scan()
            imported = 0
            for full, sig in sigs.items():
                if full in imported_paths or seen.get(full) != sig:
                    continue  # known, or still being written: wait
                try:
                    lib.import_image(full, os.path.basename(full))
                    imported += 1
                except sqlite3.IntegrityError:
                    pass  # already imported
                imported_paths.add(full)
            # Failures get another chance once the file is stable in a
            # state that hasn't already failed this run: a truncated
            # shot that finished writing after the failed decode —
            # including one that finished while no watcher was running
            # (a pre-run failure retries once on its first stable poll).
            failed_at_start = set()
            # Import-only mode must not flip failed → pending: nothing
            # would ever reprocess it, so the quarantine marker would
            # just be destroyed (code-review r3).
            for img_id, path in (lib.get_failed_cache() if tiers
                                 else ()):
                failed_at_start.add(path)
                sig = sigs.get(path)
                if sig is None or seen.get(path) != sig:
                    continue  # gone, or still being written
                if failed_sigs.get(path) == sig:
                    continue  # these exact bytes already failed
                failed_sigs[path] = sig
                lib.set_cache_status(img_id, "pending")
            seen = sigs
            cache = (process_pending_cache(lib, cache_dir=cache_dir)
                     if tiers else {})
            # Pin the file state each NEWLY failed image failed at, so
            # its retry fires only when the file changes. (Pre-run
            # failures are deliberately not pinned here — they keep
            # their one first-stable-poll retry above.)
            for _id, path in lib.get_failed_cache():
                if path not in failed_at_start:
                    failed_sigs[path] = sigs.get(path)
            totals["cycles"] += 1
            totals["imported"] += imported
            totals["cached"] += cache.get("cached", 0)
            totals["failed"] += cache.get("failed", 0)
            if on_cycle is not None:
                on_cycle({"imported": imported, **cache,
                          "cycle": totals["cycles"]})
            if iterations is not None and totals["cycles"] >= iterations:
                break
            _time.sleep(interval)
    except KeyboardInterrupt:
        pass
    return totals


def generate_tiers(raw_path: str, image_id: int,
                   cache_dir: Optional[os.PathLike] = None,
                   fallback_develop: bool = True) -> Tuple[str, str, str]:
    """Extract the embedded JPEG and write all three tiers.

    Returns (thumb, instant, working) paths; raises on failure
    (reference: raw/processor.rs:37-64). When the file has no usable
    embedded JPEG the reference quarantines it; with
    ``fallback_develop`` we instead develop the sensor data at default
    params and tier that — an improvement over the reference, on by
    default, disable for strict parity.
    """
    from PIL import Image

    from raweditor_tpu.raw.decode import extract_preview_jpeg

    cache = Path(cache_dir) if cache_dir else default_cache_dir()
    jpeg = extract_preview_jpeg(raw_path)
    if jpeg is not None:
        try:
            with Image.open(io.BytesIO(jpeg)) as img:
                img.load()
                pimg = img.convert("RGB")
        except Exception:
            # A corrupt embedded JPEG (e.g. a marker scan hit inside a
            # damaged file) must not quarantine an image whose sensor
            # data decodes fine — fall through to the develop path.
            if not fallback_develop:
                raise
            jpeg = None
    if jpeg is not None:
        biggest = max(w for _, w in _tiers_spec())
        if not fallback_develop or pimg.width >= biggest:
            return _write_tiers(pimg, image_id, cache)
        # The embedded JPEG is smaller than the working tier — a grid
        # thumb, not a preview. Upscaling it makes a blurry 1280 px
        # cache entry; develop the sensor instead when that yields
        # more real pixels (the engine preview caps at the working
        # width). An undecodable sensor falls back to the small JPEG —
        # a usable preview must never turn into a quarantine.
        try:
            dev = Image.fromarray(_develop_default(raw_path))
        except Exception:
            dev = None
        if dev is not None and dev.width > pimg.width:
            return _write_tiers(dev, image_id, cache)
        return _write_tiers(pimg, image_id, cache)
    if not fallback_develop:
        raise ValueError(f"no embedded JPEG in {raw_path}")
    img = Image.fromarray(_develop_default(raw_path))
    return _write_tiers(img, image_id, cache)


def _develop_default(raw_path: str):
    """Develop at default params for tiering (camera-JPEG substitute)."""
    from raweditor_tpu.params import EditParams
    from raweditor_tpu.pipeline.engine import DevelopEngine

    eng = DevelopEngine.open(raw_path)
    return eng.preview(EditParams())


def _write_tiers(img, image_id: int, cache: Path) -> Tuple[str, str, str]:
    from PIL import Image

    paths = []
    for tier_name, width in _tiers_spec():
        tier_dir = cache / tier_name
        tier_dir.mkdir(parents=True, exist_ok=True)
        out_path = tier_dir / f"{image_id}.jpg"
        # Width-constrained aspect-preserving resize (the reference
        # bounds height at 10x width, which never binds for photos,
        # reference: raw/processor.rs:74).
        scale = width / img.width
        resized = img.resize(
            (width, max(1, round(img.height * scale))),
            Image.LANCZOS,
        )
        resized.save(out_path, quality=90)
        paths.append(str(out_path))
    return tuple(paths)


def process_pending_cache(lib: Library,
                          cache_dir: Optional[os.PathLike] = None,
                          limit: int = 1_000_000) -> dict:
    """Work the pending queue: tiers for every 'pending' image, failures
    quarantined (the resumable import→cache loop of
    reference: main.rs:404-434,472-495, without the UI round trips)."""
    from raweditor_tpu.utils.logging import get_logger

    log = get_logger("raweditor_tpu.tiers")
    pending = lib.get_pending_cache(limit)
    done = failed = 0
    for i, img in enumerate(pending):
        try:
            thumb, instant, working = generate_tiers(
                img.path, img.id, cache_dir
            )
            lib.set_image_cache_paths(img.id, thumb, instant, working)
            done += 1
        except Exception as e:
            log.warning("tier generation failed for %s: %s",
                        img.filename, e)
            lib.set_cache_status(img.id, "failed")
            failed += 1
        if (i + 1) % 25 == 0:
            log.info("tier cache: %d/%d", i + 1, len(pending))
    return {"cached": done, "failed": failed}
