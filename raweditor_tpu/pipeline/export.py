"""Batch export: RAW files → developed sRGB JPEG/PNG at scale.

The production path BASELINE.md targets (1,000 NEFs sharded across a
v5e slice). Architecture:

    decode thread pool ──▶ shape buckets ──▶ device batches ──▶ encode
      (host CPU,            (pad to fixed      (fused sharded    thread
       bounded window)       batch shape:       develop over      pool
                             one compile        the mesh)        (host)
                             per mosaic size)

- Host decode runs ahead of the device through a bounded in-flight
  window (double buffering; the reference decodes one image per UI task,
  reference: main.rs:2036-2071).
- Mosaics are bucketed by shape and batches padded to a fixed size, so
  the whole run compiles one program per distinct camera resolution.
- Per-image failure quarantine at decode and encode: one corrupt file
  must not kill the run (reference: main.rs:460-464 semantics).
"""

from __future__ import annotations

import dataclasses
import os
import time
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from raweditor_tpu.color import cam_to_output_matrix as _cam_to_output
from raweditor_tpu.ops.cfa_generic import \
    generic_cfa_method as _generic_cfa_method
from raweditor_tpu.params import EditParams
from raweditor_tpu.parallel.batch import (
    batch_develop_rgba,
    batch_develop_sharded,
    batch_sharding,
    pack_params,
)


@dataclasses.dataclass
class ExportJob:
    raw_path: str
    out_path: str
    params: EditParams = dataclasses.field(default_factory=EditParams)
    image_id: Optional[int] = None


@dataclasses.dataclass
class ExportReport:
    total: int = 0
    succeeded: int = 0
    skipped: int = 0
    failed: List[Tuple[str, str]] = dataclasses.field(default_factory=list)
    seconds: float = 0.0
    # Sum of per-image codec+metadata time on the decode workers (can
    # exceed wall clock with several threads — it's the host-CPU
    # budget, not a wall split). decode_megapixels is the matching
    # numerator for a true per-codec MP/s.
    decode_seconds: float = 0.0
    decode_megapixels: float = 0.0
    # Host staging work split out of decode: the bit-pack + async
    # device_put enqueue on the decode workers.
    stage_seconds: float = 0.0
    # Dispatch→retire on the fetch thread: an upper bound including
    # overlapped upload waits, NOT pure device compute (the profiler
    # lanes measure that); see docs/performance.md.
    device_seconds: float = 0.0
    encode_seconds: float = 0.0
    # Device→host transfer of developed batches, separated from
    # device_seconds: on a tunneled dev chip the link (single-digit
    # MB/s) dominates everything, and conflating it with compute
    # would make the device look 3 orders of magnitude too slow.
    fetch_seconds: float = 0.0
    fetch_bytes: int = 0
    # Host→device staging: bytes enqueued from the decode workers and
    # the residual wait observed at flush (0 when fully overlapped).
    upload_seconds: float = 0.0
    upload_bytes: int = 0

    @property
    def develops_per_sec(self) -> float:
        return self.succeeded / self.seconds if self.seconds > 0 else 0.0

    @property
    def fetch_mbps(self) -> float:
        return (self.fetch_bytes / 1e6 / self.fetch_seconds
                if self.fetch_seconds > 0 else 0.0)

    @property
    def decode_mps(self) -> float:
        """Per-codec decode rate in MP/s per worker-second."""
        return (self.decode_megapixels / self.decode_seconds
                if self.decode_seconds > 0 else 0.0)

    def as_dict(self) -> dict:
        return {
            "total": self.total,
            "succeeded": self.succeeded,
            "skipped": self.skipped,
            "failed": len(self.failed),
            "seconds": round(self.seconds, 3),
            "develops_per_sec": round(self.develops_per_sec, 2),
            "decode_seconds": round(self.decode_seconds, 3),
            "decode_mps": round(self.decode_mps, 1),
            "stage_seconds": round(self.stage_seconds, 3),
            "device_seconds": round(self.device_seconds, 3),
            "fetch_seconds": round(self.fetch_seconds, 3),
            "fetch_mb": round(self.fetch_bytes / 1e6, 1),
            "fetch_mbps": round(self.fetch_mbps, 1),
            "upload_seconds": round(self.upload_seconds, 3),
            "upload_mb": round(self.upload_bytes / 1e6, 1),
            "encode_seconds": round(self.encode_seconds, 3),
        }


@dataclasses.dataclass
class _Decoded:
    job: ExportJob
    mosaic: np.ndarray
    wb: np.ndarray
    cam_matrix: np.ndarray
    white_level: float
    black_level: float
    cfa_phase: tuple = (0, 0)
    # Async host→device staging started from the decode worker, so the
    # upload (48 MB per 24 MP mosaic) overlaps the next file's decode
    # instead of serializing at flush time. 12-bit mosaics stage
    # bit-packed at 1.5 B/px (ops/staging.py) and unpack on device.
    staged: object = None
    staged_fmt: str = "raw"  # "raw" | "u12" | "u14"
    staged_nbytes: int = 0
    # Export metadata (raw/exif.py): camera provenance + the stored
    # orientation tag so viewers rotate the output.
    make: str = ""
    model: str = ""
    orientation: int = 1


def _decode_job(job: ExportJob, mode: str, upload_pool=None,
                color_space: str = "srgb"):
    """Returns (decoded, decode_seconds, stage_seconds).

    decode_seconds covers the codec + metadata work only; the staging
    pack is timed separately so the report's decode split reflects
    the real per-codec MP/s (VERDICT r2: the two were conflated,
    making decode look 8x slower than the codec benchmarks).

    The ``device_put`` itself runs on ``upload_pool`` (one dedicated
    thread), NOT here: on slow transports the "async" enqueue has
    been measured blocking for seconds per image, and a blocked
    decode worker collapses the decode pool's throughput. The flush
    path resolves the resulting future (its wait is accounted as
    upload_seconds, where transport time belongs)."""
    from raweditor_tpu.raw.decode import decode_raw

    t0 = time.perf_counter()
    raw = decode_raw(job.raw_path)
    if mode == "parity":
        # The reference hardcodes 4096 and the RGGB stencil
        # (gpu/shaders.rs:110-125). LinearRaw still has to skip the
        # demosaic regardless of mode.
        white, black = 4096.0, 0.0
        phase = "__linear__" if raw.is_linear else (0, 0)
    else:
        from raweditor_tpu.ops.cfa_generic import is_xtrans
        from raweditor_tpu.ops.demosaic import phase_of

        white, black = float(raw.white_level), float(raw.black_level)
        if raw.is_linear:
            phase = "__linear__"
        elif is_xtrans(raw.cfa_pattern):
            # X-Trans buckets carry the pattern string instead of a
            # Bayer phase; flush routes them to the generic-CFA batch.
            phase = raw.cfa_pattern
        else:
            phase = phase_of(raw.cfa_pattern)
    decoded = _Decoded(
        job=job,
        mosaic=raw.fold_site_blacks() if mode == "accurate" else raw.mosaic,
        wb=raw.wb_rgb(),
        cam_matrix=_cam_to_output(raw.xyz_to_cam, mode, color_space),
        white_level=white,
        black_level=black,
        cfa_phase=phase,
        make=raw.camera_make,
        model=raw.camera_model,
        orientation=raw.orientation,
    )
    decode_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    if upload_pool is not None:
        m = decoded.mosaic
        fmt = "raw"
        if m.ndim == 2 and m.dtype == np.uint16:
            peak = m.max(initial=0)
            if peak < 4096 and m.shape[1] % 2 == 0:
                fmt = "u12"  # 1.5 B/px (the dominant sensor depth)
            elif peak < 16384 and m.shape[1] % 4 == 0:
                fmt = "u14"  # 1.75 B/px
        nbytes = {"u12": m.nbytes * 3 // 4,
                  "u14": m.nbytes * 7 // 8}.get(fmt, m.nbytes)
        # Budget check BEFORE the pack so a pegged budget costs no
        # host work; any staging failure (e.g. device OOM) resolves
        # at flush time — budget released there, image degrades to a
        # flush-time raw upload, never a quarantine.
        if _stage_budget_acquire(nbytes):
            try:
                import jax

                from raweditor_tpu.ops.staging import (pack12_rows,
                                                       pack14_rows)

                # `peak` was scanned above to pick the format; passing
                # it skips the pack's own range re-scan (a full memory
                # pass that matters on single-core hosts).
                if fmt == "u12":
                    host_buf = pack12_rows(m, peak)
                elif fmt == "u14":
                    host_buf = pack14_rows(m, peak)
                else:
                    host_buf = np.ascontiguousarray(m)
                # Hand the enqueue to the upload thread; transfers
                # serialize on the link anyway, and the worker moves
                # straight to the next file.
                decoded.staged = upload_pool.submit(
                    jax.device_put, host_buf)
                decoded.staged_fmt = fmt
                decoded.staged_nbytes = nbytes
            except Exception:
                _stage_budget_release(nbytes)
                decoded.staged = None
                decoded.staged_fmt = "raw"
                decoded.staged_nbytes = 0
    return decoded, decode_s, time.perf_counter() - t0


# Pre-staged mosaics waiting in the decode window are live HBM; cap
# them so deep windows on big images can't exhaust device memory
# (notably the shared tunneled dev chip). Over budget, images upload
# at flush time instead — correctness is unaffected.
# Default sized to fit one default batch of packed 24 MP mosaics
# (8 x 36 MB) with headroom; partial batches use whatever fit.
_STAGE_BUDGET = int(os.environ.get(
    "RAWEDITOR_TPU_STAGE_BUDGET_MB", "512")) * 1_000_000
# Module-level construction: a lazily-built lock would itself need a
# lock (two first-ever concurrent runs could each build one and guard
# the budget counters with different objects — code-review r3).
import threading as _threading  # noqa: E402

_stage_lock = _threading.Lock()
_stage_used = 0


_stage_runs = 0  # active run_batch_export calls (leak self-healing)


def _stage_run_begin() -> None:
    """Mark a run active; if no other run holds staging, clear any
    budget leaked by an aborted previous run (its buffers are long
    garbage-collected — only the counter survived)."""
    global _stage_runs, _stage_used
    with _stage_lock:
        if _stage_runs == 0:
            _stage_used = 0
        _stage_runs += 1


def _stage_run_end() -> None:
    global _stage_runs
    with _stage_lock:
        _stage_runs = max(0, _stage_runs - 1)


def _stage_budget_acquire(nbytes: int) -> bool:
    global _stage_used
    with _stage_lock:
        if _stage_used + nbytes > _STAGE_BUDGET:
            return False
        _stage_used += nbytes
        return True


def _stage_budget_release(nbytes: int) -> None:
    global _stage_used
    with _stage_lock:
        _stage_used = max(0, _stage_used - nbytes)


def _atomic_write(out_path: str, write_fn) -> None:
    """Write via a temp name + rename so an interrupted run never
    leaves a partial file that ``skip_existing`` would later trust.
    ``write_fn(tmp_path)`` produces the file."""
    import threading

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tmp_path = (f"{out_path}.{os.getpid()}."
                f"{threading.get_ident()}.tmp")
    try:
        write_fn(tmp_path)
        os.replace(tmp_path, out_path)
    finally:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)


def _encode_one(out_path: str, rgba_words: np.ndarray, quality: int,
                exif: bytes = b"", optimize: bool = False,
                chroma: str = "420", restart_rows: int = 0,
                icc: bytes = None) -> None:
    """Encode a (H, W) u32 packed-RGBA image. The RGBA→RGB strip for
    JPEG happens here on the host, exactly like the reference
    (reference: main.rs:1778-1781). ``exif`` carries the camera
    provenance + orientation metadata (raw/exif.py). When this PIL
    path stands in for the native planes encoder (stale/absent
    extension), it still honors chroma='444' (subsampling=0),
    ``optimize``, and ``restart_rows`` (PIL's restart_marker_rows is
    the same MCU-row unit) so the user's flags survive the fallback."""
    from PIL import Image

    h, w = rgba_words.shape
    img = Image.frombuffer(
        "RGBA", (w, h), np.ascontiguousarray(rgba_words).tobytes(),
        "raw", "RGBA", 0, 1,
    )

    ext = os.path.splitext(out_path)[1].lower()
    if ext not in (".png", ".jpg", ".jpeg"):
        # 8-bit exports are JPEG/PNG only; writing JPEG bytes under a
        # .tif name (etc.) would report success and poison
        # skip_existing reruns (code-review r3). 16-bit TIFF rides
        # _encode_one_tiff16 via bits=16.
        raise ValueError(f"unsupported 8-bit export extension {ext!r} "
                         "(use .jpg/.jpeg/.png, or bits=16 for .tif)")

    def write(tmp_path):
        ikw = {"icc_profile": icc} if icc else {}
        if ext == ".png":
            img.save(tmp_path, format="PNG", exif=exif, **ikw)
        else:
            kw = {"subsampling": 0} if chroma == "444" else {}
            if restart_rows > 0:
                kw["restart_marker_rows"] = int(restart_rows)
            img.convert("RGB").save(tmp_path, format="JPEG",
                                    quality=quality, exif=exif,
                                    optimize=optimize, **kw, **ikw)

    _atomic_write(out_path, write)


_JIT_CACHE = {}


def _cached_jit(key: str):
    """Process-wide jitted helpers, one trace cache per function (a
    fresh jax.jit per batch would retrace every flush). One keyed
    cache replaces three copy-pasted global+getter pairs
    (code-review r3)."""
    if key not in _JIT_CACHE:
        import jax

        if key == "u12" or key == "u14":
            from raweditor_tpu.ops.staging import (unpack12_rows,
                                                   unpack14_rows)

            fn = unpack12_rows if key == "u12" else unpack14_rows
        elif key == "ycbcr420":
            from raweditor_tpu.ops.jpeg import rgba_words_to_ycbcr420

            fn = rgba_words_to_ycbcr420
        elif key == "ycbcr444":
            from raweditor_tpu.ops.jpeg import rgba_words_to_ycbcr444

            fn = rgba_words_to_ycbcr444
        else:
            raise KeyError(key)
        _JIT_CACHE[key] = jax.jit(fn)
    return _JIT_CACHE[key]


def _unpack_jit(fmt: str):
    return _cached_jit(fmt)


def _ycbcr420_jit():
    return _cached_jit("ycbcr420")


def _ycbcr444_jit():
    return _cached_jit("ycbcr444")


class _Batcher:
    """Shape-bucketed batching with pad-to-fixed-size semantics."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.buckets: Dict[Tuple[int, int], List[_Decoded]] = {}

    def add(self, item: _Decoded) -> Optional[List[_Decoded]]:
        # Finish extras split the bucket: an extras-enabled graph
        # shifts zero-amount images by ±1 LSB (the opponent-split
        # round trip), so mixing would make an UNEDITED image's bytes
        # depend on which jobs share its batch — the bit-exact
        # default must not be batch-composition-dependent
        # (code-review r3).
        # Locals split the bucket too: the mask structure (count +
        # kinds) is part of the compiled program AND pack_params needs
        # it uniform per batch. Same for the point-curve length
        # (ops/curve.py): point COUNT is structure, coordinates are
        # per-image traced leaves.
        key = (item.mosaic.shape, item.cfa_phase,
               item.job.params.has_finish_extras(),
               tuple(m.kind for m in item.job.params.locals),
               len(item.job.params.point_curve))
        bucket = self.buckets.setdefault(key, [])
        bucket.append(item)
        if len(bucket) >= self.batch_size:
            return self.buckets.pop(key)
        return None

    def drain(self):
        while self.buckets:
            _, bucket = self.buckets.popitem()
            yield bucket


def _encode_one_jpeg420(out_path: str, y: np.ndarray, cb: np.ndarray,
                        cr: np.ndarray, quality: int,
                        exif: bytes = b"",
                        optimize: bool = False,
                        chroma: str = "420",
                        restart_rows: int = 0,
                        icc: bytes = None) -> None:
    """Encode device-produced YCbCr planes (ops/jpeg.py) through the
    native baseline JFIF encoder — no host colorspace pass; 1.5
    bytes/pixel fetched instead of 4 for '420' (3 B/px for '444').
    Atomic like the PIL path. ``restart_rows`` > 0 writes DRI/RSTn
    resilient streams; single-threaded here because the encode POOL
    already saturates the host cores across images."""
    from raweditor_tpu.native import get_rawkit

    rk = get_rawkit()
    h, w = y.shape
    encode = rk.encode_jpeg_444 if chroma == "444" else rk.encode_jpeg_420
    # The binding takes any contiguous buffer — pass the arrays
    # directly (they arrive as contiguous per-image copies).
    data = encode(
        np.ascontiguousarray(y), np.ascontiguousarray(cb),
        np.ascontiguousarray(cr), w, h, quality, optimize,
        max(0, int(restart_rows)), 1)
    if exif:
        from raweditor_tpu.raw.exif import splice_exif

        data = splice_exif(data, exif)
    if icc:
        from raweditor_tpu.icc import splice_icc_jpeg

        data = splice_icc_jpeg(data, icc)

    def write(tmp_path):
        with open(tmp_path, "wb") as f:
            f.write(data)

    _atomic_write(out_path, write)


def _encode_one_tiff16(out_path: str, rgb_u16: np.ndarray,
                       make: str = "", model: str = "",
                       orientation: int = 1,
                       icc: bytes = None) -> None:
    """Encode an (H, W, 3) u16 frame as 16-bit TIFF, atomically."""
    ext = os.path.splitext(out_path)[1].lower()
    if ext not in (".tif", ".tiff"):
        # Same contract as _encode_one: TIFF bytes under a .jpg/.png
        # name would report success and poison skip_existing reruns.
        raise ValueError(f"unsupported 16-bit export extension {ext!r} "
                         "(bits=16 writes .tif/.tiff)")
    from raweditor_tpu.raw.exif import SOFTWARE
    from raweditor_tpu.raw.tiff_out import write_tiff16

    _atomic_write(out_path, lambda tmp: write_tiff16(
        tmp, rgb_u16, make=make, model=model, orientation=orientation,
        software=SOFTWARE, icc=icc))


def run_batch_export(
    jobs: Sequence[ExportJob],
    mesh=None,
    batch_size: int = 8,
    decode_threads: int = 4,
    encode_threads: int = 4,
    quality: int = 95,
    mode: str = "parity",
    matrix_transpose: Optional[bool] = None,
    skip_existing: bool = False,
    fast_gamma: bool = False,
    demosaic_method: str = "nearest",
    use_pallas: bool = False,
    transfer: str = None,
    bits: int = 8,
    long_edge: Optional[int] = None,
    jpeg_optimize: bool = False,
    chroma: str = "420",
    jpeg_restart_rows: int = 0,
    color_space: str = "srgb",
    rotate: float = 0.0,
    crop=None,
    lens=None,
    perspective=None,
    on_progress=None,
) -> ExportReport:
    """Develop and encode every job; returns a report with throughput
    and the per-image quarantine list.

    ``on_progress(done, failed, total, seconds)`` is called (at most
    ~1/s) as images complete — a 1,000-image production run should not
    be silent for its whole duration (the CLI's ``--progress`` prints
    a JSON line per call to stderr). Exceptions from the callback are
    swallowed: observability must never fail the run.

    ``skip_existing`` makes a rerun resume where it stopped: jobs whose
    output file already exists are counted as skipped, the analogue of
    the reference's resumable pending-queue cache loop
    (reference: main.rs:404-434).

    ``rotate``/``crop`` apply UNIFORM output-stage geometry to every
    image (ops/geometry.py; device-side, per shape bucket, in the
    stored sensor frame) — the fixed-rig batch workflow. Per-image
    geometry stays a single-image engine feature."""
    import jax

    from raweditor_tpu.utils import ensure_backend
    from raweditor_tpu.utils.memory import (
        arena_cap_from_env, cap_malloc_arenas, trim_malloc)

    ensure_backend()  # must precede thread-pool creation (see utils.device)
    # glibc arena retention made long-run RSS track cumulative decode
    # volume (~35 MB/image) instead of the working set; cap arenas
    # before the pools below can create them, and trim between flushes
    # (utils/memory.py has the soak evidence). 0 disables both.
    _arena_cap = arena_cap_from_env()
    if _arena_cap:
        cap_malloc_arenas(_arena_cap)

    if matrix_transpose is None:
        matrix_transpose = mode == "parity"
    # Wide-gamut output (beyond the reference): the space mandates its
    # transfer and the cam matrices target its primaries
    # (color.cam_to_output_matrix); every encoder embeds the matching
    # ICC profile below.
    from raweditor_tpu.color import COLOR_SPACES, TRANSFER_BY_SPACE

    color_space = (color_space or "srgb").lower()
    if color_space not in COLOR_SPACES:
        raise ValueError(
            f"unknown color space {color_space!r}; expected one of "
            f"{COLOR_SPACES}")
    if color_space != "srgb" and mode != "accurate":
        raise ValueError(
            "wide-gamut output requires mode='accurate' (parity is "
            "defined as the reference's sRGB bytes)")
    if color_space in TRANSFER_BY_SPACE:
        transfer = TRANSFER_BY_SPACE[color_space]
    # Polynomial 1/2.2 gamma: ~17% faster develop, within 1 LSB of the
    # exact pow after u8 quantization (see color.gamma22_poly_encode).
    if transfer is None:
        transfer = "gamma22_poly" if fast_gamma else "gamma22"
    elif fast_gamma and transfer == "srgb":
        # Accurate-mode fast gamma: exact linear segment + polynomial
        # pow branch (color.srgb_poly_encode); u8 only (see transfer16).
        transfer = "srgb_poly"
    if bits not in (8, 16):
        raise ValueError("bits must be 8 or 16")
    from raweditor_tpu.color import PALLAS_GAMMA_BY_TRANSFER, encoder_for

    try:
        # Validated up front so an unknown transfer can't silently
        # quarantine every batch deep in the flush (code-review r3).
        encoder_for(transfer)
    except ValueError:
        raise ValueError(
            f"unknown transfer {transfer!r}; expected one of "
            f"{sorted(PALLAS_GAMMA_BY_TRANSFER) + ['gamma_adobe']}")
    _icc = None
    if color_space != "srgb":
        from raweditor_tpu.icc import profile_bytes

        _icc = profile_bytes(color_space)
    if mesh is not None and not {"batch", "row"} <= set(mesh.shape):
        # The staging/dispatch shardings name both axes; a mesh missing
        # one would fail deep inside the first flush and quarantine the
        # whole run batch by batch (code-review r3).
        raise ValueError(
            "run_batch_export meshes need 'batch' and 'row' axes "
            "(parallel.batch_row_mesh builds one)")
    if bits == 16 and mesh is not None and \
            dict(mesh.shape).get("row", 1) != 1:
        # The 16-bit lane is the vmapped develop (no row-sharded
        # variant); data-parallel meshes work — inputs are staged with
        # the batch sharding and XLA partitions the vmapped program.
        raise ValueError(
            "16-bit export supports mesh=None or data-parallel meshes "
            "(row axis of size 1)")
    # The batched fused kernel (±1 LSB) is the fastest single-chip
    # Bayer path; covers nearest/bilinear/malvar/grad demosaic, no row
    # sharding. (X-Trans buckets use the kernel for GRAD only —
    # nearest/smooth measured faster on XLA; see the dispatch sites.)
    pallas_ok = (use_pallas and mesh is None
                 and transfer in PALLAS_GAMMA_BY_TRANSFER
                 and demosaic_method in ("nearest", "bilinear", "malvar",
                                         "grad"))
    # Shape buckets whose Pallas attempt failed once (unsupported
    # shape, backend without Mosaic, or a VMEM-overflow compile on
    # ultra-wide sensors): retrying per flush would pay a failed
    # multi-minute trace+compile for EVERY batch before each XLA
    # fallback.
    _pallas_failed: set = set()

    def _note_pallas_demotion(key, exc):
        """Record a failed Pallas lane AND say so: the r5 planes-lane
        bug (f32→u8 cast unsupported in Mosaic on real chips, passing
        in CPU interpret mode) hid behind this exact silence for two
        rounds — every all-JPEG hardware run quietly took the slower
        conversion-pass path. A demotion is legitimate (exotic
        shapes, non-Mosaic backends) but must be visible."""
        _pallas_failed.add(key)
        from raweditor_tpu.utils.logging import get_logger

        get_logger("raweditor_tpu.export").warning(
            "Pallas lane %s demoted to the XLA path: %s: %s",
            key, type(exc).__name__, str(exc)[:200])
    from raweditor_tpu.color import pallas_gamma_for, transfer16_for

    pallas_gamma = pallas_gamma_for(transfer)
    # The polynomial gammas are u8-accuracy only — never let them into
    # 16-bit archival output (color.TRANSFER16_BY_TRANSFER).
    transfer16 = transfer16_for(transfer)
    if mesh is not None:
        n_b = mesh.shape["batch"]
        if batch_size % n_b:
            batch_size = ((batch_size // n_b) + 1) * n_b

    report = ExportReport(total=len(jobs))
    t_start_progress = time.perf_counter()
    _progress_last = [0.0]

    def _note_progress(force: bool = False):
        """Rate-limited completion callback (≥1 s apart unless forced);
        never raises into the run."""
        if on_progress is None:
            return
        now = time.perf_counter()
        if not force and now - _progress_last[0] < 1.0:
            return
        _progress_last[0] = now
        try:
            on_progress(report.succeeded, len(report.failed),
                        report.total, now - t_start_progress)
        except Exception:  # noqa: BLE001 - observability must not
            pass           # fail the export

    if skip_existing:
        remaining = []
        for job in jobs:
            if os.path.exists(job.out_path):
                report.skipped += 1
            else:
                remaining.append(job)
        jobs = remaining

    # Device-side YCbCr 4:2:0 (ops/jpeg.py) + native JFIF encode: the
    # develop program additionally converts and box-subsamples chroma
    # on the TPU, so 1.5 bytes/pixel cross to the host instead of 4
    # and the encoder skips its colorspace pass. Taken whenever every
    # output still to be written is a JPEG (decided after the
    # skip_existing prune) and the native encoder is present; PNG/TIFF
    # runs and odd-sized frames keep the packed-RGBA path.
    from raweditor_tpu.native import get_rawkit as _get_rawkit

    # (PIL's plain save uses 4:2:0 chroma at every quality — verified
    # against its SOF sampling factors — so the planes path matches
    # its subsampling behavior across the quality range.)
    # Row-sharded meshes qualify too (since r3): shard heights are even
    # (H % 2*n_rows == 0), so the conversion + 2×2 chroma box runs
    # inside each row shard with no boundary exchange — values are
    # identical to the single-chip path (asserted by tests), so the
    # 1.5 B/px fetch applies to the full BASELINE 8-chip config.
    #
    # The conversion composes INTO the develop program wherever
    # possible (parallel/batch.py `output=` / the Pallas kernel's
    # in-kernel planes) instead of running as a separate jit — the
    # separate pass re-read + re-wrote the full RGBA batch through HBM
    # (~5.5 B/px of traffic that XLA fusion or the kernel now elides).
    # The standalone _ycbcr420_jit pass remains only for outputs that
    # were resized on device after develop.
    if chroma not in ("420", "444"):
        raise ValueError(f"chroma must be '420' or '444', got {chroma!r}")
    _rk = _get_rawkit()
    _encode_attr = "encode_jpeg_444" if chroma == "444" else "encode_jpeg_420"
    jpeg_planes_ok = (
        bits == 8
        and _rk is not None and hasattr(_rk, _encode_attr)
        and all(j.out_path.lower().endswith((".jpg", ".jpeg"))
                for j in jobs)
    )
    t_start = time.perf_counter()
    _stage_run_begin()
    try:
        encode_futures: List[Tuple[Future, ExportJob]] = []
        # Device batches in flight: develop is dispatched asynchronously;
        # a dedicated fetch thread pulls results one batch behind, so TPU
        # compute, host decode/encode, the H2D uploads, and the D2H fetch
        # all overlap (the double-buffering BASELINE.md calls for, plus
        # full-duplex use of the link).
        inflight: List[tuple] = []

        def submit_encodes(batch, host, encode_pool):
            for i, d in enumerate(batch):
                # Per-image copy: an encode job must not pin the whole
                # (B, H, W) batch array while it waits in the queue.
                from raweditor_tpu.raw.exif import build_exif

                exif = build_exif(d.make, d.model, d.orientation)
                if isinstance(host, tuple) and len(host) == 2:
                    # Fused-kernel planes: Y + NV12-interleaved CbCr
                    # (ops/pallas_develop.py output='ycbcr420'). The
                    # strided de-interleave copies are 2×(H/2·W/2)
                    # bytes on the host — noise next to the encode.
                    y, cbcr = host[0][i], host[1][i]
                    fut = encode_pool.submit(
                        _encode_one_jpeg420, d.job.out_path, y.copy(),
                        cbcr[:, 0::2].copy(), cbcr[:, 1::2].copy(),
                        quality, exif, jpeg_optimize, chroma,
                        jpeg_restart_rows, _icc
                    )
                elif isinstance(host, tuple):  # YCbCr plane triple
                    y, cb, cr = (p[i] for p in host)
                    fut = encode_pool.submit(
                        _encode_one_jpeg420, d.job.out_path, y.copy(),
                        cb.copy(), cr.copy(), quality, exif,
                        jpeg_optimize, chroma, jpeg_restart_rows, _icc
                    )
                elif bits == 16:
                    fut = encode_pool.submit(
                        _encode_one_tiff16, d.job.out_path,
                        host[i].copy(), d.make, d.model, d.orientation,
                        _icc
                    )
                else:
                    fut = encode_pool.submit(
                        _encode_one, d.job.out_path, host[i].copy(),
                        quality, exif, jpeg_optimize, chroma,
                        jpeg_restart_rows, _icc
                    )
                encode_futures.append((fut, d.job))
            # Backpressure: the device can outrun host JPEG encode by ~20×;
            # without a bound the queue would pin unbounded RGBA buffers.
            max_inflight = 4 * encode_threads
            while len(encode_futures) > max_inflight:
                fut, job = encode_futures.pop(0)
                t_enc = time.perf_counter()
                try:
                    fut.result()
                    report.succeeded += 1
                except Exception as e:
                    report.failed.append((job.raw_path, f"encode: {e}"))
                report.encode_seconds += time.perf_counter() - t_enc
                _note_progress()

        def _fetch_batch(out, batch, t0):
            """Runs on the fetch thread: sync compute, then pull the batch
            to host. Off the main thread so the D2H transfer of batch N
            overlaps batch N+1's decode AND its H2D upload (the two legs
            run full duplex on the link)."""
            # True sync first: block_until_ready is optimistic on the
            # tunneled dev transport (CLAUDE.md) — fetch ONE element of
            # the first output buffer instead. TPU programs retire in
            # order, so that element landing implies the batch's compute
            # is done; the 4-byte fetch keeps compute time (measured from
            # dispatch; an upper bound, overlapped work included) out of
            # the fetch leg the link rate is derived from.
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            dev_s = time.perf_counter() - t0
            t1 = time.perf_counter()
            # Slice the padding off ON DEVICE before fetching: a
            # drain-time bucket of 1 with batch_size=8 would otherwise
            # pull 7 replayed frames across the link (material on the
            # bandwidth-starved dev transport; code-review r3). The
            # device slice is a cheap copy next to the transfer.
            n = len(batch)
            if isinstance(out, tuple):  # YCbCr planes
                host = tuple(np.asarray(p[:n]) for p in out)
                nbytes = sum(p.nbytes for p in host)
            else:
                host = np.asarray(out[:n])
                nbytes = host.nbytes
            return host, dev_s, time.perf_counter() - t1, nbytes

        def drain_inflight(encode_pool, depth: int):
            while len(inflight) > depth:
                fut, batch = inflight.pop(0)
                try:
                    host, dev_s, fetch_s, nbytes = fut.result()
                except Exception as e:  # device/transport failure: the
                    # batch quarantines like any other per-image failure —
                    # one OOM'd batch must not kill a 1,000-image run.
                    for d in batch:
                        report.failed.append(
                            (d.job.raw_path, f"device: {e}"))
                    _note_progress()
                    continue
                report.device_seconds += dev_s
                report.fetch_seconds += fetch_s
                report.fetch_bytes += nbytes
                submit_encodes(batch, host, encode_pool)

        def _flush_dispatch(batch: List[_Decoded]):
            n_real = len(batch)
            # Pad to the fixed batch shape: one compiled program per
            # (batch_size, H, W). Padding replays item 0 and is dropped
            # before encode.
            padded = batch + [batch[0]] * (batch_size - n_real)
            # Resolve the upload-thread futures first: a transfer the
            # link finished costs nothing here; one still in flight is
            # waited for (that wait IS upload time); a failed enqueue
            # (device OOM) degrades to a flush-time raw upload.
            t_res = time.perf_counter()
            for d in batch:
                if isinstance(d.staged, Future):
                    fut, d.staged = d.staged, None
                    try:
                        d.staged = fut.result()
                    except Exception:
                        _stage_budget_release(d.staged_nbytes)
                        d.staged_fmt = "raw"
                        d.staged_nbytes = 0
            report.upload_seconds += time.perf_counter() - t_res
            if mesh is None and any(d.staged is not None for d in batch):
                # Use every pre-staged buffer (partial batches included —
                # an over-budget straggler must not discard the bytes the
                # link already streamed); items without one upload here.
                # The residual wait (timed as upload) is whatever the link
                # hasn't streamed yet — fully overlapped staging costs ~0.
                import jax.numpy as jnp

                t_up = time.perf_counter()
                parts = []
                late_bytes = 0
                built = {}  # padding replays batch[0]: upload/unpack once
                for d in padded:
                    if id(d) not in built:
                        if d.staged is None:
                            late = np.ascontiguousarray(d.mosaic)
                            late_bytes += late.nbytes
                            built[id(d)] = jax.device_put(late)
                        elif d.staged_fmt != "raw":
                            # Bit-packed staging: fused device unpack.
                            built[id(d)] = _unpack_jit(d.staged_fmt)(
                                d.staged)
                        else:
                            built[id(d)] = d.staged
                    parts.append(built[id(d)])
                mosaics = jnp.stack(parts)
                jax.block_until_ready(mosaics)
                report.upload_seconds += time.perf_counter() - t_up
                report.upload_bytes += late_bytes + sum(
                    d.staged_nbytes for d in batch if d.staged is not None)
            else:
                mosaics = np.stack([d.mosaic for d in padded])
            params = pack_params([d.job.params for d in padded])
            wbs = np.stack([d.wb for d in padded])
            cms = np.stack([d.cam_matrix for d in padded])
            whites = np.array([d.white_level for d in padded], np.float32)
            blacks = np.array([d.black_level for d in padded], np.float32)

            phase = batch[0].cfa_phase
            # Clipped-highlight reconstruction (ops/highlights.py):
            # statically gated per flush like the extras; inside an
            # active batch the per-image traced amounts keep
            # zero-amount images bit-exact (u16 where-passthrough), so
            # no bucket split is needed. Runs on the stacked mosaics
            # before develop — every downstream route (XLA / Pallas /
            # mesh / planes / 16-bit) sees a plain u16 batch.
            if any(float(d.job.params.highlight_recovery) != 0.0
                   for d in batch):
                from raweditor_tpu.ops import highlights as _hl

                amounts = np.array(
                    [float(d.job.params.highlight_recovery)
                     for d in padded], np.float32)
                if phase == "__linear__":
                    mosaics = _hl._HL_JIT_BATCH_LINEAR(
                        mosaics, wbs, amounts, whites, blacks)
                elif isinstance(phase, str):
                    mosaics = _hl._HL_JIT_BATCH_MOSAIC(
                        mosaics, wbs, amounts, whites, blacks,
                        cfa_phase=(0, 0), xtrans_pattern=phase)
                else:
                    mosaics = _hl._HL_JIT_BATCH_MOSAIC(
                        mosaics, wbs, amounts, whites, blacks,
                        cfa_phase=phase)
            # Finish extras (sharpen/denoise, ops/extras.py): static
            # per-flush flag — only batches that actually use them pay
            # the extra stencil work (zero-amount images inside such a
            # batch develop within 1 LSB of their extras-off render).
            ex_on = any(d.job.params.has_finish_extras() for d in batch)
            # Local adjustments (ops/local_adjust.py): the bucket key
            # guarantees a uniform mask structure per batch. The fused
            # Pallas kernels don't carry the locals stage, so
            # locals-active batches stay on the XLA lanes (which fuse
            # the pointwise masks into the develop program for free).
            locals_on = bool(batch[0].job.params.locals)
            # Point curves ride the XLA finish (ops/curve.py, applied
            # inside finish_to_* pre-quantize); the fused Pallas
            # kernels don't trace the stage, so curve-active batches
            # stay on the XLA lanes like locals-active ones.
            curve_on = bool(batch[0].job.params.point_curve)
            # The static extras specialization for the XLA lanes:
            # "base" skips the whole-frame clarity pyramid at trace
            # time when no image in the flush uses clarity; the
            # "+mixer" (ops/mixer.py) and "+grading" (ops/grading.py)
            # axes join when any image uses them, and a pointwise-only
            # flush skips the stencil stages entirely.
            ex_mode = False
            if ex_on:
                from raweditor_tpu.params import _STENCIL_FIELDS

                clar_any = any(
                    float(d.job.params.clarity) != 0.0
                    or float(d.job.params.dehaze) != 0.0
                    for d in batch)
                stenc_any = clar_any or any(
                    float(getattr(d.job.params, f)) != 0.0
                    for d in batch for f in _STENCIL_FIELDS)
                mix_any = any(d.job.params.has_mixer() for d in batch)
                grade_any = any(
                    d.job.params.has_grading() for d in batch)
                grain_any = any(
                    float(d.job.params.grain) != 0.0 for d in batch)
                mode_parts = []
                if stenc_any:
                    mode_parts.append("full" if clar_any else "base")
                if mix_any:
                    mode_parts.append("mixer")
                if grade_any:
                    mode_parts.append("grading")
                if grain_any:
                    mode_parts.append("grain")
                ex_mode = "+".join(mode_parts) if mode_parts else False
                ex_on = bool(mode_parts)

            def _extras_amounts(ds, field):
                return np.array(
                    [float(getattr(d.job.params, field)) for d in ds],
                    np.float32)

            def _extras_curve(ds):
                return tuple(
                    _extras_amounts(ds, f)
                    for f in ("curve_shadows", "curve_darks",
                              "curve_lights", "curve_highlights"))

            def _extras_mixer(ds):
                """(n, 24) per-image HSL-mixer amounts, or None when
                no image in the flush uses the mixer (statically off
                in both the kernel and the XLA words form)."""
                if not any(d.job.params.has_mixer() for d in ds):
                    return None
                return np.array(
                    [[float(v) for v in d.job.params.mixer_values()]
                     for d in ds], np.float32)

            def _extras_grading(ds):
                """(n, 7) per-image color-grading amounts
                (ops/grading.py), or None when no image in the flush
                grades (statically off, like the mixer)."""
                if not any(d.job.params.has_grading() for d in ds):
                    return None
                return np.array(
                    [[float(v) for v in d.job.params.grading_values()]
                     for d in ds], np.float32)

            def _extras_words_gspmd(words, ds):
                """Words-form extras for SHARDED outputs: the same
                post-quantize semantics as the fused kernel, executed
                as XLA over the GSPMD-sharded words (XLA inserts the
                stencil/resize boundary exchanges; the single-device
                kernel can't run on a sharded array). The composition
                mirrors the mesh-less route EXACTLY — clarity as its
                own requantizing words pass (skipped statically when
                no image uses it), then the core extras with a
                literal-zero clarity sentinel — so mesh-vs-solo stays
                byte-equal wherever both reduce to the XLA words form
                (the CPU test backend always does; code-review r3:
                the old inline-clarity form both diverged by 1 LSB
                and defeated the pyramid's trace-time skip)."""
                from raweditor_tpu.ops.extras import (
                    apply_clarity_words,
                    apply_dehaze_words,
                    finish_extras_rgba_words,
                )

                hz = _extras_amounts(ds, "dehaze")
                if hz.any():
                    # Veil removal before clarity — the plane order of
                    # apply_finish_extras on every route.
                    words = apply_dehaze_words(words,
                                               hz[:, None, None])
                cl = _extras_amounts(ds, "clarity")
                if cl.any():
                    words = apply_clarity_words(words,
                                                cl[:, None, None])
                sh = _extras_amounts(ds, "sharpen")
                dn = _extras_amounts(ds, "denoise")
                cv = _extras_curve(ds)
                vg = _extras_amounts(ds, "vignette")
                mix = _extras_mixer(ds)
                grd = _extras_grading(ds)
                ga = _extras_amounts(ds, "grain")
                gs = _extras_amounts(ds, "grain_size")
                stencils = bool(sh.any() or dn.any() or vg.any()
                                or any(c.any() for c in cv))
                if stencils or mix is not None or grd is not None:
                    words = finish_extras_rgba_words(
                        words,
                        sh[:, None, None],
                        dn[:, None, None],
                        tuple(c[:, None, None] for c in cv),
                        vg[:, None, None],
                        0.0,
                        mixer=(None if mix is None else tuple(
                            mix[:, k, None, None] for k in range(24))),
                        grading=(None if grd is None else tuple(
                            grd[:, k, None, None] for k in range(7))),
                        stencils=stencils)
                if ga.any():
                    # Grain as its own requantizing words pass, LAST —
                    # the exact composition of the mesh-less route
                    # (_extras_post_batch applies it after the
                    # kernel), keeping mesh-vs-solo byte-equal.
                    from raweditor_tpu.ops.extras import (
                        apply_grain_words,
                    )

                    words = apply_grain_words(words,
                                              ga[:, None, None],
                                              gs[:, None, None])
                return words

            def _extras_post_batch(words, ds, kernel, xla_output):
                """Fused extras post-pass over a batch of words (JPEG
                planes emitted directly when the run wants them). A
                kernel failure falls back to the XLA words form in its
                own guard — it must not unwind into the enclosing
                except, which would demote the WORKING develop kernel
                for this shape too (code-review r3)."""
                want = ("ycbcr420" if xla_output == "ycbcr420"
                        else "rgba")
                sh = _extras_amounts(ds, "sharpen")
                dn = _extras_amounts(ds, "denoise")
                cv = _extras_curve(ds)
                vg = _extras_amounts(ds, "vignette")
                cl = _extras_amounts(ds, "clarity")
                hz = _extras_amounts(ds, "dehaze")
                mix = _extras_mixer(ds)
                grd = _extras_grading(ds)
                if hz.any():
                    from raweditor_tpu.ops.extras import (
                        apply_dehaze_words,
                    )

                    # Veil removal before clarity (whole-frame stage,
                    # can't live in the banded kernel).
                    words = apply_dehaze_words(words,
                                               hz[:, None, None])
                if cl.any():
                    from raweditor_tpu.ops.extras import (
                        apply_clarity_words,
                    )

                    # Whole-frame pyramid pass (can't live in the
                    # banded kernel); per-image amounts broadcast.
                    words = apply_clarity_words(words,
                                                cl[:, None, None])
                stencils = bool(sh.any() or dn.any() or vg.any()
                                or any(c.any() for c in cv))
                ga = _extras_amounts(ds, "grain")
                gs = _extras_amounts(ds, "grain_size")
                grain_on = bool(ga.any())

                def _tail(out_words):
                    """Film grain LAST, then the JPEG-plane convert —
                    grain must land on RGBA words, so a grain-active
                    flush asks the kernel for RGBA and converts
                    here."""
                    if grain_on:
                        from raweditor_tpu.ops.extras import (
                            apply_grain_words,
                        )

                        out_words = apply_grain_words(
                            out_words, ga[:, None, None],
                            gs[:, None, None])
                    if want == "ycbcr420":
                        out_words = _ycbcr420_jit()(out_words)
                    return out_words

                if not stencils and mix is None and grd is None:
                    # dehaze/clarity/grain-only flush.
                    return _tail(words)
                kern_out = "rgba" if grain_on else want
                key = ("extras", words.shape, kern_out, stencils,
                       mix is not None, grd is not None)
                if key not in _pallas_failed:
                    try:
                        out = kernel(words, sh, dn, cv, vg,
                                     mixer=mix, grading=grd,
                                     stencils=stencils,
                                     output=kern_out)
                        if kern_out == want and not grain_on:
                            return out
                        return _tail(out)
                    except Exception as e:
                        _note_pallas_demotion(key, e)
                from raweditor_tpu.ops.extras import (
                    finish_extras_rgba_words,
                )

                # Clarity already applied above.
                out = finish_extras_rgba_words(
                    words, sh[:, None, None], dn[:, None, None],
                    tuple(c[:, None, None] for c in cv),
                    vg[:, None, None],
                    mixer=(None if mix is None else tuple(
                        mix[:, k, None, None] for k in range(24))),
                    grading=(None if grd is None else tuple(
                        grd[:, k, None, None] for k in range(7))),
                    stencils=stencils)
                return _tail(out)
            # JPEG-plane output folded into the develop program (see the
            # jpeg_planes_ok comment): decide per shape bucket — a
            # device-side long-edge resize needs RGBA words, so those
            # buckets keep the post-develop conversion pass.
            h_m, w_m = mosaics.shape[1], mosaics.shape[2]
            resize_changes = False
            if long_edge:
                from raweditor_tpu.ops.resize import long_edge_shape

                resize_changes = (
                    long_edge_shape(h_m, w_m, long_edge) != (h_m, w_m))
            geometry_on = (bool(rotate) or crop is not None
                           or lens is not None
                           or perspective is not None)
            # Extras on mesh-less 8-bit flushes ALWAYS ride the fused
            # post-pass kernel (with its own XLA-words fallback),
            # regardless of --fast: the in-chain XLA extras
            # materialize every stencil stage (~12.7 ms @24 MP vs
            # ~2.3 for the kernel). Mesh flushes run the SAME
            # words-form semantics as sharded XLA
            # (_extras_words_gspmd — the single-device kernel can't
            # take a sharded array); 16-bit stays in-chain (the words
            # pass is u8).
            post_extras = ex_on and mesh is None and bits != 16
            xla_output = "rgba_words"
            if (jpeg_planes_ok and bits != 16 and not resize_changes
                    and not geometry_on):
                if chroma == "444":
                    xla_output = "ycbcr444"
                elif h_m % 2 == 0 and w_m % 2 == 0:
                    xla_output = "ycbcr420"
            t0 = time.perf_counter()
            if bits == 16:
                from raweditor_tpu.ops.develop import (
                    develop_linear,
                    develop_u16,
                    develop_xtrans,
                )

                if mesh is not None:
                    # Data-parallel 16-bit: stage with the batch
                    # sharding; XLA partitions the vmapped develop
                    # over the mesh ("computation follows data").
                    mosaics = jax.device_put(mosaics,
                                             batch_sharding(mesh))


                if phase == "__linear__":
                    out = jax.vmap(
                        lambda m, p, w, c, wl, bl: develop_linear(
                            m, p, w, c, wl, bl,
                            matrix_transpose=matrix_transpose,
                            transfer=transfer16, bits=16, extras=ex_mode,
                        )
                    )(mosaics, params, wbs, cms, whites, blacks)
                elif isinstance(phase, str):
                    out = jax.vmap(
                        lambda m, p, w, c, wl, bl: develop_xtrans(
                            m, p, w, c, wl, bl, pattern=phase,
                            matrix_transpose=matrix_transpose,
                            transfer=transfer16, bits=16,
                            demosaic_method=_generic_cfa_method(demosaic_method),
                            extras=ex_mode,
                        )
                    )(mosaics, params, wbs, cms, whites, blacks)
                else:
                    out = jax.vmap(
                        lambda m, p, w, c, wl, bl: develop_u16(
                            m, p, w, c, wl, bl,
                            demosaic_method=demosaic_method,
                            matrix_transpose=matrix_transpose,
                            transfer=transfer16, cfa_phase=phase,
                            extras=ex_mode,
                        )
                    )(mosaics, params, wbs, cms, whites, blacks)
            elif phase == "__linear__":
                from raweditor_tpu.parallel.batch import (
                    batch_develop_linear_rgba,
                )

                if mesh is not None:
                    # Data-parallel like the 16-bit lane: stage with
                    # the batch sharding and let XLA partition the
                    # vmapped program (these buckets previously ran
                    # single-device under a mesh — code-review r3).
                    mosaics = jax.device_put(mosaics,
                                             batch_sharding(mesh))
                # output=xla_output: JPEG planes fuse into the develop
                # program like the Bayer/X-Trans lanes (the standalone
                # pass re-read + re-wrote the RGBA batch through HBM —
                # code-review r3).
                out = batch_develop_linear_rgba(
                    mosaics, params, wbs, cms, whites, blacks,
                    matrix_transpose=matrix_transpose,
                    transfer=transfer,
                    output="rgba_words" if ex_on else xla_output,
                )
                if post_extras:
                    from raweditor_tpu.ops.pallas_develop import (
                        pallas_finish_extras_rgba,
                    )

                    out = _extras_post_batch(
                        out, padded, pallas_finish_extras_rgba,
                        xla_output)
                elif ex_on:
                    # Sharded words-form extras (same semantics as the
                    # mesh-less post-pass; code-review r3 — these mesh
                    # buckets were left in-chain when the mesh-less
                    # route switched).
                    out = _extras_words_gspmd(out, padded)
            elif isinstance(phase, str):  # X-Trans bucket (pattern string)
                from raweditor_tpu.parallel.batch import (
                    batch_develop_xtrans_rgba,
                )

                if mesh is not None:
                    mosaics = jax.device_put(mosaics,
                                             batch_sharding(mesh))

                # Generic-CFA (X-Trans) nearest/smooth buckets stay on
                # the XLA path even with use_pallas: the kernel's 6×6
                # select-mask assembly costs more device time than
                # XLA's fused iota-select tiles (measured @24 MP:
                # nearest 3.63 ms kernel vs 2.51 XLA, smooth 6.05 vs
                # 4.76 — docs/performance.md "measured and rejected");
                # the XLA batch path emits the same 1.5 B/px YCbCr
                # planes. GRAD is the exception — XLA materializes its
                # 10+ composed stages and the fused kernel wins (8.0 ms
                # vs 11.6 = 1.45×).
                out = None
                pl_key = (mosaics.shape, "grad", phase, xla_output,
                          ex_on)
                # Extras-active batches stay on the fused lane: the
                # standalone post-pass kernel runs on the develop's
                # RGBA words (so the kernel emits words, and the
                # JPEG-plane conversion happens in the tail pass).
                if (pallas_ok and demosaic_method == "grad"
                        and not locals_on and not curve_on
                        and pl_key not in _pallas_failed):
                    from raweditor_tpu.ops.pallas_develop import (
                        pallas_batch_develop_rgba,
                        pallas_finish_extras_rgba,
                    )

                    try:
                        out = pallas_batch_develop_rgba(
                            mosaics, params, wbs, cms, whites, blacks,
                            matrix_transpose=matrix_transpose,
                            pattern=phase, demosaic="grad",
                            gamma=pallas_gamma,
                            output=("ycbcr420"
                                    if xla_output == "ycbcr420"
                                    and not ex_on else "rgba"),
                        )
                    except Exception as e:
                        out = None  # shape/VMEM unsupported → XLA path
                        _note_pallas_demotion(pl_key, e)
                    if out is not None and ex_on:
                        # OUTSIDE the develop guard: an extras failure
                        # must quarantine the batch (flush()'s normal
                        # policy), not demote the WORKING develop
                        # kernel for the shape (code-review r3).
                        out = _extras_post_batch(
                            out, padded, pallas_finish_extras_rgba,
                            xla_output)
                if out is None:
                    out = batch_develop_xtrans_rgba(
                        mosaics, params, wbs, cms, whites, blacks,
                        pattern=phase, matrix_transpose=matrix_transpose,
                        transfer=transfer,
                        demosaic_method=_generic_cfa_method(
                            demosaic_method),
                        output="rgba_words" if ex_on else xla_output,
                    )
                    if post_extras:
                        from raweditor_tpu.ops.pallas_develop import (
                            pallas_finish_extras_rgba,
                        )

                        out = _extras_post_batch(
                            out, padded, pallas_finish_extras_rgba,
                            xla_output)
                    elif ex_on:
                        out = _extras_words_gspmd(out, padded)
            elif mesh is None:
                out = None
                pl_key = (mosaics.shape, demosaic_method, phase,
                          xla_output, ex_on)
                if (pallas_ok and not locals_on and not curve_on
                        and pl_key not in _pallas_failed):
                    from raweditor_tpu.ops.pallas_develop import (
                        pallas_batch_develop_rgba,
                        pallas_finish_extras_rgba,
                    )

                    try:
                        out = pallas_batch_develop_rgba(
                            mosaics, params, wbs, cms, whites, blacks,
                            matrix_transpose=matrix_transpose,
                            cfa_phase=phase,
                            gamma=pallas_gamma,
                            demosaic=demosaic_method,
                            output=("ycbcr420"
                                    if xla_output == "ycbcr420"
                                    and not ex_on else "rgba"),
                        )
                    except Exception as e:
                        out = None  # unsupported shape/backend → XLA path
                        _note_pallas_demotion(pl_key, e)
                    if out is not None and ex_on:
                        # Finish extras as the fused post-pass over the
                        # RGBA words (per-image amounts; JPEG planes
                        # emitted directly on JPEG runs). OUTSIDE the
                        # develop guard: an extras failure quarantines
                        # the batch instead of demoting the working
                        # develop kernel (code-review r3).
                        out = _extras_post_batch(
                            out, padded, pallas_finish_extras_rgba,
                            xla_output)
                if out is None:
                    out = batch_develop_rgba(
                        mosaics, params, wbs, cms, whites, blacks,
                        matrix_transpose=matrix_transpose, cfa_phase=phase,
                        transfer=transfer, demosaic_method=demosaic_method,
                        output="rgba_words" if ex_on else xla_output,
                    )
                    if post_extras:
                        from raweditor_tpu.ops.pallas_develop import (
                            pallas_finish_extras_rgba,
                        )

                        out = _extras_post_batch(
                            out, padded, pallas_finish_extras_rgba,
                            xla_output)
            elif (demosaic_method == "grad" or ex_on or locals_on
                  or h_m % (2 * dict(mesh.shape).get("row", 1))):
                # grad's receptive field — and the finish extras'
                # stencils — exceed the shard_map path's fixed 2-row
                # halo (parallel/spatial.HALO_DEMOSAICS) — shard via
                # GSPMD like the X-Trans buckets: stage with the
                # batch sharding and let XLA insert whatever boundary
                # exchanges the stencils need (value-exact by
                # construction). Buckets whose height the row shards
                # can't divide (H % 2·rows ≠ 0) take this route too —
                # batch_develop_sharded would reject them and
                # quarantine every image of that camera
                # (code-review r3). Extras run in the words form so
                # the mesh route shares the mesh-less route's
                # post-quantize semantics.
                staged = jax.device_put(mosaics, batch_sharding(mesh))
                out = batch_develop_rgba(
                    staged, params, wbs, cms, whites, blacks,
                    matrix_transpose=matrix_transpose, cfa_phase=phase,
                    transfer=transfer, demosaic_method=demosaic_method,
                    output="rgba_words" if ex_on else xla_output,
                )
                if ex_on:
                    out = _extras_words_gspmd(out, padded)
            else:
                staged = jax.device_put(mosaics, batch_sharding(mesh))
                out = batch_develop_sharded(
                    staged, params, wbs, cms, mesh,
                    white_levels=whites, black_levels=blacks,
                    matrix_transpose=matrix_transpose, rgba=True,
                    cfa_phase=phase, transfer=transfer,
                    demosaic_method=demosaic_method,
                    output=xla_output,
                )
            h_, w_ = mosaics.shape[1], mosaics.shape[2]
            if geometry_on:
                # Uniform output-stage geometry, device-side before the
                # fetch (and before long_edge, matching the engine's
                # order). xla_output was forced to words above, so
                # ``out`` is never YCbCr planes here.
                if bits == 16:
                    from raweditor_tpu.ops.geometry import rotate_crop_u16

                    out = jax.vmap(
                        lambda x: rotate_crop_u16(
                            x, float(rotate), crop, lens=lens,
                            perspective=perspective))(out)
                else:
                    from raweditor_tpu.ops.geometry import (
                        rotate_crop_rgba_words_batch,
                    )

                    out = rotate_crop_rgba_words_batch(
                        out, float(rotate), crop, lens=lens,
                        perspective=perspective)
                h_, w_ = out.shape[1], out.shape[2]
            if long_edge:
                # Device-side long-edge resize (Lanczos3): only the
                # resized pixels cross the link, so a 2048 px export of
                # a 24 MP image fetches ~7% of the bytes. Never
                # upscales (ops/resize.long_edge_shape).
                from raweditor_tpu.ops.resize import (
                    long_edge_shape,
                    resize_rgb16,
                    resize_rgba_words,
                )

                oh, ow = long_edge_shape(h_, w_, long_edge)
                if (oh, ow) != (h_, w_):
                    if bits == 16:
                        out = resize_rgb16(out, ow, oh)
                    else:
                        out = resize_rgba_words(out, ow, oh)
                    h_, w_ = oh, ow
            if (jpeg_planes_ok and not isinstance(out, tuple)
                    and (chroma == "444"
                         or (h_ % 2 == 0 and w_ % 2 == 0))
                    and getattr(out, "ndim", 0) == 3):
                # Convert (+ subsample for 4:2:0) on device: one extra
                # HBM-bound pass, 2.67× less data over the wire for
                # '420', 1.33× for '444' (ops/jpeg.py).
                out = (_ycbcr444_jit() if chroma == "444"
                       else _ycbcr420_jit())(out)
            return out, t0

        def flush(batch: List[_Decoded], encode_pool: ThreadPoolExecutor):
            try:
                out, t0 = _flush_dispatch(batch)
            except Exception as e:  # device/compile failure: quarantine
                # the batch like any per-image failure instead of killing
                # a long run.
                for d in batch:
                    report.failed.append((d.job.raw_path, f"develop: {e}"))
                    _note_progress()
                return
            finally:
                # Release staging budget only now: until dispatch, the
                # staged buffers were the live copies (releasing at stack
                # time let the decode window transiently double the
                # budgeted HBM).
                for d in batch:
                    if d.staged is not None:
                        _stage_budget_release(d.staged_nbytes)
                        d.staged = None
                        d.staged_nbytes = 0
            inflight.append(
                (fetch_pool.submit(_fetch_batch, out, batch, t0), batch))
            drain_inflight(encode_pool, depth=1)
            if _arena_cap:
                # The batch's mosaics/planes were just freed; hand the
                # pages back instead of letting arenas retain them.
                trim_malloc()

        with ThreadPoolExecutor(decode_threads) as decode_pool, \
                ThreadPoolExecutor(encode_threads) as encode_pool, \
                ThreadPoolExecutor(1) as fetch_pool, \
                ThreadPoolExecutor(1) as upload_pool:
            batcher = _Batcher(batch_size)
            window = max(2 * batch_size, decode_threads * 2)
            pending: List[Tuple[Future, ExportJob]] = []
            job_iter = iter(jobs)

            def submit_next() -> bool:
                job = next(job_iter, None)
                if job is None:
                    return False
                pending.append(
                    (decode_pool.submit(
                        _decode_job, job, mode,
                        upload_pool if mesh is None else None,
                        color_space), job)
                )
                return True

            for _ in range(window):
                if not submit_next():
                    break

            while pending:
                fut, job = pending.pop(0)
                try:
                    decoded, decode_s, stage_s = fut.result()
                except Exception as e:
                    report.failed.append((job.raw_path, f"decode: {e}"))
                    _note_progress()
                else:
                    # Sum of worker time (can exceed wall clock with
                    # multiple decode threads — it's the host-CPU budget).
                    report.decode_seconds += decode_s
                    report.stage_seconds += stage_s
                    report.decode_megapixels += (
                        decoded.mosaic.shape[0] * decoded.mosaic.shape[1]
                        / 1e6)
                    full = batcher.add(decoded)
                    if full is not None:
                        flush(full, encode_pool)
                submit_next()

            for bucket in batcher.drain():
                flush(bucket, encode_pool)
            drain_inflight(encode_pool, depth=0)

            t0 = time.perf_counter()
            for fut, job in encode_futures:
                try:
                    fut.result()
                    report.succeeded += 1
                except Exception as e:
                    report.failed.append((job.raw_path, f"encode: {e}"))
                _note_progress()
            report.encode_seconds += time.perf_counter() - t0
            _note_progress(force=True)

    finally:
        # Always balance the run counter: an exception or
        # KeyboardInterrupt escaping this function must not leave
        # _stage_runs stuck >0 (that would disable the leaked-budget
        # self-healing in _stage_run_begin for the process lifetime).
        _stage_run_end()
    report.seconds = time.perf_counter() - t_start
    return report


def jobs_from_catalog(lib, out_dir: os.PathLike,
                      image_ids: Optional[Sequence[int]] = None,
                      ext: str = "jpg") -> List[ExportJob]:
    """Build export jobs from catalog rows + their stored edit params —
    the non-destructive edit replay (reference: main.rs:510-517)."""
    images = lib.get_all_images()
    if image_ids is not None:
        wanted = set(image_ids)
        images = [i for i in images if i.id in wanted]
    jobs = []
    taken = set()
    for img in images:
        if img.is_deleted():
            continue
        stem = os.path.splitext(img.filename)[0]
        # Distinct source files can share a stem (IMG_0001.NEF in two
        # folders); disambiguate with the catalog id so one export
        # never silently overwrites another (code-review r3).
        name = f"{stem}.{ext}"
        if name.lower() in taken:
            name = f"{stem}_{img.id}.{ext}"
        taken.add(name.lower())
        jobs.append(
            ExportJob(
                raw_path=img.path,
                out_path=os.path.join(os.fspath(out_dir), name),
                params=lib.load_edit_params(img.id),
                image_id=img.id,
            )
        )
    return jobs
