"""Interactive develop session for one image.

The TPU counterpart of the reference's ``RenderPipeline``
(reference: gpu/pipeline.rs:112-363): hold the decoded mosaic
device-resident (the analogue of the R16Uint texture upload,
reference: gpu/pipeline.rs:171-207), and serve preview / histogram /
full-res renders as fused jit launches. Where the reference creates a
whole wgpu device per image and re-reads back 5 MB per slider tick,
here a slider change is one kernel dispatch over the cached mosaic and
nothing recompiles.

``mode="parity"`` reproduces the shipped reference bit-for-bit
(identity color matrix, /4096 normalization, WGSL matrix transpose).
``mode="accurate"`` uses the real camera matrix, black/white levels,
and straight matrix math.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from raweditor_tpu.color import (PALLAS_GAMMA_BY_TRANSFER,
                                 pallas_gamma_for,
                                 transfer16_for)
from raweditor_tpu.ops.develop import (
    develop,
    develop_histogram,
    develop_preview,
    develop_rgba,
)
from raweditor_tpu.ops.cfa_generic import \
    generic_cfa_method as _generic_cfa_method
from raweditor_tpu.ops.sampling import histogram_shape, preview_shape
from raweditor_tpu.params import EditParams
from raweditor_tpu.raw.types import RawImage
from raweditor_tpu.utils.logging import get_logger

logger = get_logger("raweditor_tpu.engine")

MAX_PREVIEW_WIDTH = 1280  # (reference: gpu/pipeline.rs:125)
HISTOGRAM_WIDTH = 128  # (reference: gpu/pipeline.rs:131)

_YCBCR420_JIT = None


def _ycbcr420_jit():
    """Module-level jitted RGB→YCbCr 4:2:0 converter for preview_jpeg
    (the ops/highlights._make_jits convention): a fresh jax.jit wrapper
    per frame misses the C++ fast-path dispatch cache even though the
    trace cache hits — avoidable overhead on the interactive transport
    this method exists to optimize (advisor r4). Lazy so importing the
    engine never imports jax eagerly."""
    global _YCBCR420_JIT
    if _YCBCR420_JIT is None:
        import jax

        from raweditor_tpu.ops.jpeg import rgb_u8_to_ycbcr420

        _YCBCR420_JIT = jax.jit(rgb_u8_to_ycbcr420)
    return _YCBCR420_JIT


class DevelopEngine:
    """Device-resident develop session for a decoded RawImage."""

    def __init__(self, raw: RawImage, mode: str = "parity",
                 max_preview_width: int = MAX_PREVIEW_WIDTH,
                 histogram_width: int = HISTOGRAM_WIDTH,
                 use_pallas: bool = False,
                 fast_gamma: bool = False,
                 demosaic_method: str = "nearest",
                 transfer: str = "gamma22",
                 auto_orient: bool = False,
                 color_space: str = "srgb"):
        import jax

        from raweditor_tpu.utils import ensure_backend

        ensure_backend()  # idempotent; also enables the compile cache
        if mode not in ("parity", "accurate"):
            raise ValueError(f"unknown mode {mode!r}")
        # The as-constructed settings (pre-resolution), so a sibling
        # engine for another image can be built without hand-listing
        # fields (DevelopSession.open; a hand-maintained subset silently
        # dropped max_preview_width — code-review r3).
        self.ctor_kwargs = dict(
            mode=mode, max_preview_width=max_preview_width,
            histogram_width=histogram_width, use_pallas=use_pallas,
            fast_gamma=fast_gamma, demosaic_method=demosaic_method,
            transfer=transfer, auto_orient=auto_orient,
            color_space=color_space,
        )
        self.use_pallas = use_pallas
        # Wide-gamut output (beyond the reference, accurate mode):
        # Display P3 / Adobe RGB matrices + mandated transfer, with
        # the matching ICC profile embedded by every export path
        # (an untagged wide-gamut file renders WRONG everywhere).
        from raweditor_tpu.color import COLOR_SPACES, TRANSFER_BY_SPACE

        color_space = (color_space or "srgb").lower()
        if color_space not in COLOR_SPACES:
            raise ValueError(
                f"unknown color space {color_space!r}; expected one "
                f"of {COLOR_SPACES}")
        self.color_space = color_space
        if color_space in TRANSFER_BY_SPACE:
            transfer = TRANSFER_BY_SPACE[color_space]
        # Polynomial 1/2.2 gamma (two sqrts + degree-6 poly) instead of
        # the transcendental pow: ~17% faster develop, within 1 LSB of
        # the exact pow after u8 quantization (color.gamma22_poly_encode).
        # Rewriting the transfer here routes every path — preview, full,
        # X-Trans, LinearRaw, histogram — through the fast curve.
        self.fast_gamma = fast_gamma
        if fast_gamma and transfer == "gamma22":
            transfer = "gamma22_poly"
        elif fast_gamma and transfer == "srgb":
            # Accurate-mode analogue: exact linear segment + polynomial
            # pow branch (color.srgb_poly_encode), u8 paths only.
            transfer = "srgb_poly"
        # Quality upgrades beyond the reference (accurate-mode options):
        # bilinear demosaic and true sRGB transfer. Parity defaults.
        self.demosaic_method = demosaic_method
        self.transfer = transfer
        # Rotate host outputs by the EXIF orientation tag (beyond the
        # reference, which renders mosaics as stored).
        self.auto_orient = auto_orient
        self.xtrans_pattern = None  # set for 6x6 CFAs in accurate mode
        self.linear = raw.is_linear  # LinearRaw: already demosaiced
        self.raw = raw
        self.mode = mode
        self.width = raw.width
        self.height = raw.height
        self.preview_w, self.preview_h = preview_shape(
            raw.width, raw.height, max_preview_width
        )
        self.histogram_w, self.histogram_h = histogram_shape(
            raw.width, raw.height, histogram_width
        )
        # Host→HBM staging of the mosaic, once per image. Per-CFA-site
        # black levels (DNG 2x2 BlackLevel) are folded in here: subtract
        # each site's deviation from the mean black so the develop chain
        # keeps a single scalar black level (the residual error is the
        # site spread over the dynamic range, ≪ 1 output LSB).
        mosaic = raw.fold_site_blacks() if mode == "accurate" else raw.mosaic
        self.mosaic = jax.device_put(np.ascontiguousarray(mosaic))
        self.wb = raw.wb_rgb()
        from raweditor_tpu.color import cam_to_output_matrix

        self.cam_matrix = cam_to_output_matrix(
            raw.xyz_to_cam, mode=mode, color_space=color_space)
        self.matrix_transpose = mode == "parity"
        if mode == "parity":
            # The reference hardcodes everything (gpu/shaders.rs:110-125).
            self.white_level = 4096.0
            self.black_level = 0.0
            self.cfa_phase = (0, 0)
        else:
            self.white_level = float(raw.white_level)
            self.black_level = float(raw.black_level)
            if self.linear:
                self.cfa_phase = (0, 0)
            else:
                from raweditor_tpu.ops.cfa_generic import is_xtrans
                from raweditor_tpu.ops.demosaic import phase_of

                if is_xtrans(raw.cfa_pattern):
                    self.xtrans_pattern = raw.cfa_pattern
                    self.cfa_phase = (0, 0)
                else:
                    self.cfa_phase = phase_of(raw.cfa_pattern)
        # AOT preview/histogram executables (compile_preview).
        self._aot_preview = None
        self._aot_histogram = None
        # Background-syncer state for the pipelined slider mode
        # (preview_tick_pipelined); created lazily on first use.
        self._pipe = None
        # (amount, device mosaic) of the last highlight-recovery
        # reconstruction (_render_mosaic) — slider drags re-run the
        # one fused pass only when the amount changes.
        self._hl_cache = None

    def _render_mosaic(self, params: EditParams):
        """The mosaic the render paths develop: the device-resident
        original, or — when the highlight_recovery slider is active —
        the reconstructed one (ops/highlights.py), same shape/dtype,
        so every AOT/jit/Pallas develop program is oblivious. Clip
        detection uses the mode-resolved levels — the same convention
        the develop normalizes by (and the batch exporter gates by),
        so engine and exporter renders stay byte-identical; accurate
        mode therefore detects clipping at the sensor's real white."""
        amt = float(params.highlight_recovery)
        if amt == 0.0:
            return self.mosaic
        if self._hl_cache is not None and self._hl_cache[0] == amt:
            return self._hl_cache[1]
        from raweditor_tpu.ops.highlights import (
            _HL_JIT_LINEAR,
            _HL_JIT_MOSAIC,
        )

        if self.linear:
            m = _HL_JIT_LINEAR(self.mosaic, self.wb, amt,
                               self.white_level, self.black_level)
        else:
            m = _HL_JIT_MOSAIC(self.mosaic, self.wb, amt,
                               self.white_level, self.black_level,
                               cfa_phase=self.cfa_phase,
                               xtrans_pattern=self.xtrans_pattern)
        self._hl_cache = (amt, m)
        return m

    # -- render paths ----------------------------------------------------
    def _preview_program(self, mosaic, params: EditParams, zoom,
                         pan_x, pan_y, extras: bool = False):
        """The preview develop, parameterized on the mosaic so it can
        be AOT-compiled (compile_preview) or jit-cached identically.
        ``extras`` is the static finish-extras flag (sharpen/denoise,
        ops/extras.py) — the AOT executables are compiled without it,
        so extras-active params route through the jit cache instead
        (preview_device/preview_tick decide)."""
        if self.linear:
            from raweditor_tpu.ops.develop import develop_linear_preview

            return develop_linear_preview(
                mosaic, params, self.wb, self.cam_matrix,
                out_w=self.preview_w, out_h=self.preview_h,
                zoom=zoom, pan_x=pan_x, pan_y=pan_y,
                white_level=self.white_level,
                black_level=self.black_level,
                matrix_transpose=self.matrix_transpose,
                transfer=self.transfer, extras=extras,
            )
        if self.xtrans_pattern is not None:
            from raweditor_tpu.ops.develop import develop_xtrans_preview

            return develop_xtrans_preview(
                mosaic, params, self.wb, self.cam_matrix,
                out_w=self.preview_w, out_h=self.preview_h,
                zoom=zoom, pan_x=pan_x, pan_y=pan_y,
                white_level=self.white_level,
                black_level=self.black_level,
                pattern=self.xtrans_pattern,
                matrix_transpose=self.matrix_transpose,
                transfer=self.transfer, extras=extras,
            )
        return develop_preview(
            mosaic, params, self.wb, self.cam_matrix,
            out_w=self.preview_w, out_h=self.preview_h,
            zoom=zoom, pan_x=pan_x, pan_y=pan_y,
            white_level=self.white_level, black_level=self.black_level,
            matrix_transpose=self.matrix_transpose,
            transfer=self.transfer, cfa_phase=self.cfa_phase,
            extras=extras,
        )

    def _histogram_program(self, mosaic, params: EditParams, zoom,
                           pan_x, pan_y, extras: bool = False):
        if self.linear:
            from raweditor_tpu.ops.develop import develop_linear_histogram

            return develop_linear_histogram(
                mosaic, params, self.wb, self.cam_matrix,
                out_w=self.histogram_w, out_h=self.histogram_h,
                zoom=zoom, pan_x=pan_x, pan_y=pan_y,
                white_level=self.white_level,
                black_level=self.black_level,
                matrix_transpose=self.matrix_transpose,
                transfer=self.transfer, extras=extras,
            )
        if self.xtrans_pattern is not None:
            from raweditor_tpu.ops.develop import develop_xtrans_histogram

            return develop_xtrans_histogram(
                mosaic, params, self.wb, self.cam_matrix,
                out_w=self.histogram_w, out_h=self.histogram_h,
                zoom=zoom, pan_x=pan_x, pan_y=pan_y,
                white_level=self.white_level,
                black_level=self.black_level,
                pattern=self.xtrans_pattern,
                matrix_transpose=self.matrix_transpose,
                transfer=self.transfer, extras=extras,
            )
        return develop_histogram(
            mosaic, params, self.wb, self.cam_matrix,
            out_w=self.histogram_w, out_h=self.histogram_h,
            zoom=zoom, pan_x=pan_x, pan_y=pan_y,
            white_level=self.white_level,
            black_level=self.black_level,
            matrix_transpose=self.matrix_transpose,
            transfer=self.transfer, cfa_phase=self.cfa_phase,
            extras=extras,
        )

    @staticmethod
    def _float_params(params: EditParams) -> EditParams:
        """AOT executables are compiled for weak-f32 param leaves; an
        integer-valued EditParams (legal for the jit path) must not
        turn into an aval-mismatch TypeError at dispatch. Local masks
        are preserved (floated) — callers route locals-active params
        off the AOT lane, but the jit lanes reuse this for the same
        dtype discipline."""
        locals_ = tuple(
            m.replace(**{f: float(getattr(m, f))
                         for f in type(m).__dataclass_fields__
                         if f != "kind"})
            for m in params.locals)
        return EditParams(**{n: float(getattr(params, n))
                             for n in EditParams.field_names()},
                          locals=locals_,
                          point_curve=tuple(
                              (float(x), float(y))
                              for x, y in params.point_curve))

    def preview_device(self, params: EditParams, zoom: float = 1.0,
                       pan: Tuple[float, float] = (0.0, 0.0)):
        """Preview render, left on device (reference: gpu/pipeline.rs:442-465
        minus the synchronous readback). Dispatches through the AOT
        executable when compile_preview() has run."""
        ex = params.finish_extras_mode()
        if (self._aot_preview is not None and not ex
                and not params.locals and not params.point_curve):
            r, _ = self._aot_preview(self._render_mosaic(params),
                                     self._float_params(params),
                                     float(zoom),
                                     float(pan[0]), float(pan[1]))
            return r
        # Same dtype discipline as the AOT lane: an int-valued zoom
        # or params leaf would open a fresh jit cache entry (a
        # multi-minute compile over the tunnel; code-review r3).
        return self._preview_program(self._render_mosaic(params),
                                     self._float_params(params),
                                     float(zoom), float(pan[0]),
                                     float(pan[1]), extras=ex)

    def compile_preview(self):
        """AOT-compile the interactive preview + histogram programs at
        this image's shapes (``jit(...).lower().compile()``), so the
        slider hot path skips Python retracing and jit cache lookup —
        the discipline bench.py always used, now on the path sessions
        actually run. The preview executable additionally returns a
        scalar checksum so :meth:`preview_tick` can force a true sync
        with a single-byte host fetch (``block_until_ready`` has been
        observed optimistic on tunneled transports). Idempotent;
        returns self."""
        if self._aot_preview is not None:
            return self
        import jax
        import jax.numpy as jnp

        def _preview(mosaic, params, zoom, pan_x, pan_y):
            r = self._preview_program(mosaic, params, zoom, pan_x, pan_y)
            return r, jnp.max(r)

        def _hist(mosaic, params, zoom, pan_x, pan_y):
            return self._histogram_program(mosaic, params, zoom,
                                           pan_x, pan_y)

        p0 = EditParams()
        args = (self.mosaic, p0, 1.0, 0.0, 0.0)
        # Compile BOTH before assigning either: a failure on the
        # second compile must not leave the engine half-initialized
        # with the idempotence guard blocking the retry
        # (code-review r3).
        preview_exe = jax.jit(_preview).lower(*args).compile()
        hist_exe = jax.jit(_hist).lower(*args).compile()
        self._aot_preview = preview_exe
        self._aot_histogram = hist_exe
        return self

    def preview_tick(self, params: EditParams, zoom: float = 1.0,
                     pan: Tuple[float, float] = (0.0, 0.0)):
        """The slider hot path: device preview + TRUE sync. Compiles
        the AOT executables on first use (same one-off cost the jit
        cache would pay). Returns the device-resident preview after
        its checksum byte has arrived on the host — the render is
        provably finished, not just enqueued."""
        if (params.has_finish_extras() or params.locals
                or params.point_curve):
            # The AOT executables are compiled extras-free and
            # mask-free; the jit cache holds those variants (one extra
            # compile the first time a session enables them). Same
            # float discipline as the AOT lane — an int-valued leaf
            # would open a fresh multi-minute jit entry per tick.
            import jax.numpy as jnp

            r = self._preview_program(
                self._render_mosaic(params), self._float_params(params),
                float(zoom), float(pan[0]), float(pan[1]),
                extras=params.finish_extras_mode())
            np.asarray(jnp.max(r))  # same transport-proof sync
            return r
        self.compile_preview()
        r, s = self._aot_preview(self._render_mosaic(params), self._float_params(params),
                                 float(zoom),
                                 float(pan[0]), float(pan[1]))
        np.asarray(s)  # single-byte fetch = transport-proof sync
        return r

    def preview_tick_pipelined(self, params: EditParams,
                               zoom: float = 1.0,
                               pan: Tuple[float, float] = (0.0, 0.0),
                               depth: int = 2):
        """Steady-state slider mode: dispatch THIS tick and return the
        newest provably-finished frame, never blocking on transport.

        A checksum fetch costs a full transport round trip even when
        the render finished long ago (measured on the tunneled dev
        chip: rpc_floor 27.6 ms while the device takes 0.44 ms), so a
        depth-N in-flight queue cannot amortize a per-tick fetch — the
        first design did exactly that and measured no better than
        true-sync. Instead a background syncer thread retires frames
        with LATEST-WINS skipping: it always syncs the newest
        dispatched checksum; TPU streams execute in order, so that
        arrival proves every earlier dispatch completed too (the same
        argument bench.py's throughput sync uses). Per-tick caller
        cost is the dispatch alone (~0.7 ms here); finished frames
        appear at the transport's round-trip cadence — the standard
        interactive-renderer trade (frames lag the slider; undisplayed
        intermediates are skipped, not fetched).

        Returns the newest checksum-proven device-resident preview, or
        None while the first frame is still in flight. ``depth`` is
        accepted for API stability; latest-wins bounds in-flight syncs
        at one regardless. extras/locals/curve-active params run
        through the jit cache instead of the AOT executable (one extra
        compile the first time a session enables them) but PIPELINE
        THE SAME WAY — their checksum is dispatched, not fetched, so
        dragging a curve point or a local-mask slider costs the
        dispatch alone too, not a transport round trip per tick (r5;
        previously these variants fell back to true-sync and a curve
        drag measured the full ~30 ms RPC floor on tunneled
        transports)."""
        if (params.has_finish_extras() or params.locals
                or params.point_curve):
            import jax.numpy as jnp

            r = self._preview_program(
                self._render_mosaic(params), self._float_params(params),
                float(zoom), float(pan[0]), float(pan[1]),
                extras=params.finish_extras_mode())
            s = jnp.max(r)  # dispatched; the syncer fetches it
        else:
            self.compile_preview()
            r, s = self._aot_preview(self._render_mosaic(params),
                                     self._float_params(params),
                                     float(zoom),
                                     float(pan[0]), float(pan[1]))
        st = self._pipe_state()
        with st["lock"]:
            st["pending"] = (r, s)
            st["seq"] += 1
            st["wake"].notify_all()
        return st["completed"]

    def _pipe_state(self):
        """Lazily start the background syncer; returns its state dict."""
        st = self._pipe
        if st is not None:
            return st
        import threading

        lock = threading.Lock()
        st = {
            "lock": lock,
            "wake": threading.Condition(lock),
            "idle": threading.Condition(lock),
            "pending": None,   # newest dispatched, not yet synced
            "completed": None,  # newest checksum-proven frame
            "seq": 0,           # dispatch counter
            "synced_seq": 0,    # seq the syncer has proven through
            "stop": False,
        }

        def syncer():
            while True:
                with st["lock"]:
                    while st["pending"] is None and not st["stop"]:
                        st["wake"].wait()
                    if st["stop"]:
                        return
                    item, seq = st["pending"], st["seq"]
                    st["pending"] = None
                # Transport round trip OUTSIDE the lock: dispatches
                # keep landing (and superseding) while this one syncs.
                err = None
                try:
                    np.asarray(item[1])
                except Exception as e:  # noqa: BLE001 - surfaced at
                    # flush; a dead syncer would deadlock every later
                    # fetch command in `while synced_seq < seq: wait()`
                    err = e
                with st["lock"]:
                    if err is None:
                        st["completed"] = item[0]
                    else:
                        st["error"] = err
                    # Advance even on failure: the sequence is "dealt
                    # with" either way, and flush raises the recorded
                    # error instead of hanging.
                    st["synced_seq"] = max(st["synced_seq"], seq)
                    st["idle"].notify_all()

        t = threading.Thread(target=syncer, daemon=True,
                             name="raweditor-pipe-sync")
        st["thread"] = t
        self._pipe = st
        t.start()
        return st

    def flush_pipeline(self):
        """Wait until every dispatched pipelined tick is proven
        complete (the syncer has fetched a checksum at or after the
        newest dispatch — stream order covers the rest) and return the
        newest finished frame, or None if pipelining was never used.
        Fetch paths (frame/render/histogram) call this so a burst's
        tail is retired before a fresh frame is produced. A sync that
        FAILED (transport drop) is re-raised here — the command that
        fetches gets the error instead of a permanent hang."""
        st = self._pipe
        if st is None:
            return None
        with st["lock"]:
            while st["synced_seq"] < st["seq"]:
                st["idle"].wait()
            err = st.pop("error", None)
            if err is not None:
                raise RuntimeError(
                    "pipelined preview sync failed") from err
            return st["completed"]

    def close_pipeline(self):
        """Stop the background syncer (after proving the tail synced).
        Safe to call repeatedly; the next pipelined tick restarts it.
        A failed tail sync must not prevent the shutdown itself."""
        st = self._pipe
        if st is None:
            return
        try:
            self.flush_pipeline()
        except RuntimeError:
            pass  # the error was the transport's; the thread still stops
        with st["lock"]:
            st["stop"] = True
            st["wake"].notify_all()
        st["thread"].join(timeout=10.0)
        self._pipe = None

    def preview(self, params: EditParams, zoom: float = 1.0,
                pan: Tuple[float, float] = (0.0, 0.0)) -> np.ndarray:
        """(preview_h, preview_w, 3) u8 on host."""
        return np.asarray(self.preview_device(params, zoom, pan))

    def pick_wb(self, x: float, y: float,
                radius: float = 0.02) -> Tuple[float, float]:
        """White-balance picker: (temperature, tint) slider values that
        neutralize the patch at frame-normalized ``(x, y)`` (0–1 of
        the full sensor; a GUI converts its view coords).

        Every interactive RAW editor has the eyedropper; the headless
        form returns slider values instead of mutating state. The math
        works in the chain's own model — post-WB channel means of the
        patch (r, g, b) through the temp/tint stage
        (ops/develop.apply_edit_stack steps 2–2.5: r·(1+0.3t),
        b·(1−0.3t), g·(1+0.3u)) — solving r' = b' for t, then
        g' = r' for u, both clamped to the slider range:

            t = (b − r) / (0.3 · (r + b))
            u = ((1 + 0.3t) · r / g − 1) / 0.3

        Channel means come straight from the mosaic window (one small
        host fetch of the device-resident mosaic): per-CFA-site means,
        black-subtracted, times the camera WB gains. Raises ValueError
        when the patch is unusable (out of frame, clipped, or black).
        """
        h, w = self.height, self.width
        if not (0.0 <= x <= 1.0 and 0.0 <= y <= 1.0):
            raise ValueError("pick point must be inside 0..1")
        r_px = max(2, int(radius * max(h, w)))
        cy, cx = int(y * (h - 1)), int(x * (w - 1))
        y0, y1 = max(0, cy - r_px), min(h, cy + r_px + 1)
        x0, x1 = max(0, cx - r_px), min(w, cx + r_px + 1)
        win = np.asarray(self.mosaic[y0:y1, x0:x1], np.float32)
        black = float(self.black_level)
        white = float(self.white_level)
        lin = np.clip(win - black, 0.0, None) / max(white - black, 1.0)
        if self.linear:
            means = [float(lin[..., c].mean()) for c in range(3)]
        else:
            # Window-local channel masks from absolute site indices
            # (host-side numpy — no full-frame device mask fetch).
            yy, xx = np.mgrid[y0:y1, x0:x1]
            if self.xtrans_pattern is not None:
                from raweditor_tpu.ops.cfa_generic import channel_grid

                idx = channel_grid(self.xtrans_pattern)[yy % 6, xx % 6]
                masks = [idx == c for c in range(3)]
            else:
                py, px = self.cfa_phase
                ye = ((yy + py) % 2) == 0
                xe = ((xx + px) % 2) == 0
                is_r = ye & xe
                is_b = (~ye) & (~xe)
                masks = [is_r, ~(is_r | is_b), is_b]
            means = []
            for msk in masks:
                if not msk.any():
                    raise ValueError(
                        "patch too small for this CFA - pick elsewhere "
                        "or enlarge radius")
                means.append(float(lin[msk].mean()))
        if max(means) >= 0.98:
            raise ValueError("patch is clipped - pick a dimmer neutral")
        if max(means) <= 1e-4:
            raise ValueError("patch is black - pick a brighter neutral")
        wbv = np.asarray(self.wb, np.float32)
        r, g, b = (means[0] * float(wbv[0]), means[1] * float(wbv[1]),
                   means[2] * float(wbv[2]))
        t = (b - r) / (0.3 * max(r + b, 1e-6))
        t = float(np.clip(t, -1.0, 1.0))
        u = ((1.0 + 0.3 * t) * r / max(g, 1e-6) - 1.0) / 0.3
        u = float(np.clip(u, -1.0, 1.0))
        return t, u

    def newest_pipelined_frame(self):
        """The newest checksum-PROVEN device frame from the pipelined
        slider mode, or None (pipelining unused / nothing proven yet).
        Costs nothing device-side: the proof already happened on the
        background syncer. The frame lags the newest tick by the
        transport's round-trip cadence — the latest-wins trade."""
        st = self._pipe
        if st is None:
            return None
        with st["lock"]:
            return st["completed"]

    def preview_jpeg(self, params: EditParams, zoom: float = 1.0,
                     pan: Tuple[float, float] = (0.0, 0.0),
                     quality: int = 80,
                     frame=None) -> Tuple[bytes, int, int]:
        """Current preview as JFIF bytes → (data, width, height) — the
        remote-GUI frame transport. The colorspace conversion + 4:2:0
        subsample run ON DEVICE (ops/jpeg.rgb_u8_to_ycbcr420, same
        transform as the batch exporter's planes path), so the fetch
        is 1.5 B/px instead of 3, and the native JFIF encoder replaces
        PIL — on the bandwidth-starved tunnel the fetch halving is the
        difference that matters (preview_fetch_p50 ~190 ms there).
        Falls back to fetch-RGB + PIL when the native encoder is
        unavailable or the preview dims are odd. ``frame`` short-cuts
        the render with an already-proven device frame (the session's
        `frame latest`, via newest_pipelined_frame)."""
        from raweditor_tpu.native import get_rawkit

        rk = get_rawkit()
        dev = (frame if frame is not None
               else self.preview_device(params, zoom, pan))
        h, w = int(dev.shape[0]), int(dev.shape[1])
        if (rk is None or not hasattr(rk, "encode_jpeg_420")
                or h % 2 or w % 2):
            import io

            from PIL import Image

            img = np.asarray(dev)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG",
                                      quality=int(quality))
            return buf.getvalue(), w, h
        y, cb, cr = _ycbcr420_jit()(dev)
        y, cb, cr = np.asarray(y), np.asarray(cb), np.asarray(cr)
        data = rk.encode_jpeg_420(
            np.ascontiguousarray(y), np.ascontiguousarray(cb),
            np.ascontiguousarray(cr), w, h, int(quality), False)
        return data, w, h

    def full_device(self, params: EditParams):
        """Full-resolution develop, device-resident
        (reference: gpu/pipeline.rs:526-606). Extras-active params
        route through the words post-pass (full_rgba_device) and
        unpack on device, so full()/develop_tiers share the export
        paths' extras semantics and cost (the in-chain XLA form's
        stencil stages materialize through HBM; code-review r3)."""
        ex = params.finish_extras_mode()
        if ex:
            return self._words_to_rgb_device(
                self.full_rgba_device(params))
        if self.linear:
            from raweditor_tpu.ops.develop import develop_linear

            return develop_linear(
                self._render_mosaic(params), params, self.wb, self.cam_matrix,
                self.white_level, self.black_level,
                matrix_transpose=self.matrix_transpose,
                transfer=self.transfer, extras=ex,
            )
        if self.xtrans_pattern is not None:
            from raweditor_tpu.ops.develop import develop_xtrans

            return develop_xtrans(
                self._render_mosaic(params), params, self.wb, self.cam_matrix,
                self.white_level, self.black_level,
                pattern=self.xtrans_pattern,
                matrix_transpose=self.matrix_transpose,
                transfer=self.transfer,
                demosaic_method=_generic_cfa_method(self.demosaic_method),
                extras=ex,
            )
        return develop(
            self._render_mosaic(params), params, self.wb, self.cam_matrix,
            white_level=self.white_level, black_level=self.black_level,
            demosaic_method=self.demosaic_method,
            matrix_transpose=self.matrix_transpose,
            transfer=self.transfer, cfa_phase=self.cfa_phase, extras=ex,
        )

    def full(self, params: EditParams) -> np.ndarray:
        return np.asarray(self.full_device(params))

    @staticmethod
    def _words_to_rgb_device(words):
        """Packed-RGBA u32 → (H, W, 3) u8 on device (one elementwise
        pass)."""
        import jax.numpy as jnp

        return jnp.stack(
            [(words & 0xFF), ((words >> 8) & 0xFF),
             ((words >> 16) & 0xFF)], axis=-1).astype(jnp.uint8)

    @staticmethod
    def apply_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
        """Apply a TIFF orientation (1/3/6/8 rotations; mirrored values
        2/4/5/7 flip) to an (H, W[, C]) host array. Beyond the
        reference, which renders mosaics as stored."""
        if orientation in (2,):
            return img[:, ::-1]
        if orientation in (3,):
            return img[::-1, ::-1]
        if orientation in (4,):
            return img[::-1]
        if orientation in (5,):
            return np.rot90(img, k=-1)[:, ::-1]
        if orientation in (6,):
            return np.rot90(img, k=-1)
        if orientation in (7,):
            return np.rot90(img, k=1)[:, ::-1]
        if orientation in (8,):
            return np.rot90(img, k=1)
        return img

    def histogram(self, params: EditParams, zoom: float = 1.0,
                  pan: Tuple[float, float] = (0.0, 0.0)) -> np.ndarray:
        """(3, 256) int — the live-histogram path at 128 px
        (reference: gpu/pipeline.rs:615-736). Dispatches through the
        AOT executable when compile_preview() has run."""
        ex = params.finish_extras_mode()
        if (self._aot_histogram is not None and not ex
                and not params.locals
                and not params.point_curve):
            return np.asarray(self._aot_histogram(
                self._render_mosaic(params), self._float_params(params), float(zoom),
                float(pan[0]), float(pan[1])))
        return np.asarray(self._histogram_program(
            self._render_mosaic(params), self._float_params(params), float(zoom),
            float(pan[0]), float(pan[1]), extras=ex))

    def _maybe_extras_post(self, words, params: EditParams, ex):
        """Extras always ride the post-pass on the words paths — the
        fused kernel where it runs, the XLA words form otherwise — so
        default and --fast renders share one extras semantics (and
        the in-chain XLA stencil pathology is avoided: ~12.7 ms vs
        ~2.3 @24 MP). One tail for every XLA lane (code-review r3:
        the wiring was copy-pasted per branch)."""
        if not ex:
            return words
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        return self._extras_post(words, params,
                                 pallas_finish_extras_rgba)

    def _extras_post(self, words, params: EditParams, kernel):
        """Finish extras on packed words: clarity first as its own XLA
        pyramid pass (the whole-frame blur can't live in the banded
        kernel), then the fused post-pass kernel for the band-local
        extras — falling back to the XLA words form on kernel failure
        in its OWN memoized guard, so an extras-kernel problem (e.g. a
        VMEM profile the develop kernel doesn't have) never demotes
        extras-free renders off the working develop kernel
        (code-review r3)."""
        curve = (float(params.curve_shadows),
                 float(params.curve_darks),
                 float(params.curve_lights),
                 float(params.curve_highlights))
        haze = float(params.dehaze)
        if haze:
            from raweditor_tpu.ops.extras import apply_dehaze_words

            # Veil removal first, then local contrast — the plane
            # order of apply_finish_extras.
            words = apply_dehaze_words(words, haze)
        clar = float(params.clarity)
        if clar:
            from raweditor_tpu.ops.extras import apply_clarity_words

            words = apply_clarity_words(words, clar)
        mixer = (tuple(float(v) for v in params.mixer_values())
                 if params.has_mixer() else None)
        grading = (tuple(float(v) for v in params.grading_values())
                   if params.has_grading() else None)
        stencils = bool(float(params.sharpen) or float(params.denoise)
                        or any(curve) or float(params.vignette))

        def _grain_tail(out):
            # Film grain is the LAST stage on every route (it must
            # not be re-filtered by the banded stages).
            if float(params.grain):
                from raweditor_tpu.ops.extras import apply_grain_words

                out = apply_grain_words(out, float(params.grain),
                                        float(params.grain_size))
            return out

        if not stencils and mixer is None and grading is None:
            # dehaze/clarity/grain-only: skip the stencil kernel.
            return _grain_tail(words)
        if not getattr(self, "_pallas_extras_failed", False):
            try:
                return _grain_tail(
                    kernel(words, float(params.sharpen),
                           float(params.denoise), curve,
                           float(params.vignette), mixer=mixer,
                           grading=grading, stencils=stencils))
            except Exception as e:
                self._pallas_extras_failed = True
                logger.info(
                    "pallas finish-extras kernel unavailable for this "
                    "image (%s: %s); using the XLA words form",
                    type(e).__name__, str(e)[:120])
        from raweditor_tpu.ops.extras import finish_extras_rgba_words

        # Clarity was already applied above — amounts here cover the
        # band-local stages only.
        return _grain_tail(finish_extras_rgba_words(
            words, float(params.sharpen), float(params.denoise), curve,
            float(params.vignette), mixer=mixer, grading=grading,
            stencils=stencils))

    # -- export ----------------------------------------------------------
    def full_rgba_device(self, params: EditParams):
        """Full-res develop to packed RGBA u32 (H, W) — the fast output
        format; same bytes the reference reads back
        (reference: gpu/pipeline.rs:551). With ``use_pallas``, runs the
        hand-fused kernel (±1 LSB, see ops/pallas_develop.py) when the
        mosaic shape supports it."""
        ex = params.finish_extras_mode()
        if self.linear:
            from raweditor_tpu.ops.develop import develop_linear

            words = develop_linear(
                self._render_mosaic(params), params, self.wb, self.cam_matrix,
                self.white_level, self.black_level,
                matrix_transpose=self.matrix_transpose,
                transfer=self.transfer, rgba=True,
            )
            return self._maybe_extras_post(words, params, ex)
        if self.xtrans_pattern is not None:
            from raweditor_tpu.ops.develop import develop_xtrans

            # Generic-CFA (X-Trans) nearest/smooth stay on the XLA path
            # even with use_pallas: the kernel's 6×6 select-mask
            # assembly costs more device time than XLA's fused
            # iota-select tiles (measured @24 MP: nearest 3.63 ms
            # kernel vs 2.51 XLA, smooth 6.05 vs 4.76 —
            # docs/performance.md "measured and rejected"). GRAD is the
            # exception: its 10+ composed stages make XLA materialize
            # intermediates, and the fused kernel wins despite the
            # masks (8.0 ms vs 11.6 = 1.45×, kernel block_h capped at
            # 64 for VMEM).
            # Finish extras ride the fast lane as the fused
            # post-pass kernel over the develop's RGBA words
            # (pallas_finish_extras_rgba) — the XLA in-chain form
            # materializes every stencil stage (~12.7 ms @24 MP).
            if (self.use_pallas
                    and self.demosaic_method == "grad"
                    and self.transfer in PALLAS_GAMMA_BY_TRANSFER
                    and not params.locals
                    and not params.point_curve
                    and not getattr(self, "_pallas_grad_failed", False)):
                from raweditor_tpu.ops.pallas_develop import (
                    pallas_develop_rgba,
                )

                words = None
                try:
                    words = pallas_develop_rgba(
                        self._render_mosaic(params), params, self.wb, self.cam_matrix,
                        white_level=self.white_level,
                        black_level=self.black_level,
                        matrix_transpose=self.matrix_transpose,
                        pattern=self.xtrans_pattern, demosaic="grad",
                        gamma=pallas_gamma_for(self.transfer),
                    )
                except Exception as e:
                    # Unsupported shape/pattern OR a VMEM-overflow
                    # compile failure on very wide sensors → XLA path.
                    # Remember per engine (a failed Mosaic compile can
                    # take minutes over the tunnel — never retry it per
                    # slider tick) and say so once.
                    self._pallas_grad_failed = True
                    logger.info(
                        "pallas X-Trans grad kernel unavailable for "
                        "this image (%s: %s); using the XLA lane",
                        type(e).__name__, str(e)[:120])
                if words is not None:
                    # Extras OUTSIDE the develop guard: an extras
                    # failure must surface (or fall back inside
                    # _extras_post's own memo), never demote the
                    # WORKING develop kernel (code-review r3).
                    return self._maybe_extras_post(words, params, ex)
            words = develop_xtrans(
                self._render_mosaic(params), params, self.wb, self.cam_matrix,
                self.white_level, self.black_level,
                pattern=self.xtrans_pattern,
                matrix_transpose=self.matrix_transpose,
                transfer=self.transfer,
                demosaic_method=_generic_cfa_method(self.demosaic_method), rgba=True,
            )
            return self._maybe_extras_post(words, params, ex)
        if (self.use_pallas
                and self.demosaic_method in ("nearest", "bilinear",
                                             "malvar", "grad")
                and self.transfer in PALLAS_GAMMA_BY_TRANSFER
                and not params.locals
                and not params.point_curve
                and not getattr(self, "_pallas_failed", False)):
            from raweditor_tpu.ops.pallas_develop import (
                pallas_develop_rgba,
            )

            pwords = None
            try:
                pwords = pallas_develop_rgba(
                    self._render_mosaic(params), params, self.wb, self.cam_matrix,
                    white_level=self.white_level,
                    black_level=self.black_level,
                    matrix_transpose=self.matrix_transpose,
                    cfa_phase=self.cfa_phase,
                    gamma=pallas_gamma_for(self.transfer),
                    demosaic=self.demosaic_method,
                )
            except Exception as e:
                # Unsupported shape OR a non-ValueError kernel compile
                # failure (e.g. VMEM overflow on very wide sensors) →
                # XLA path. Memoized like the X-Trans lane above: a
                # failed Mosaic compile can take minutes over the
                # tunnel — never retry it per slider tick.
                self._pallas_failed = True
                logger.info(
                    "pallas develop kernel unavailable for this image "
                    "(%s: %s); using the XLA lane",
                    type(e).__name__, str(e)[:120])
            if pwords is not None:
                # See the X-Trans branch note: extras outside the
                # develop guard.
                return self._maybe_extras_post(pwords, params, ex)
        words = develop_rgba(
            self._render_mosaic(params), params, self.wb, self.cam_matrix,
            white_level=self.white_level, black_level=self.black_level,
            demosaic_method=self.demosaic_method,
            matrix_transpose=self.matrix_transpose,
            transfer=self.transfer, cfa_phase=self.cfa_phase,
        )
        return self._maybe_extras_post(words, params, ex)

    def export(self, path: os.PathLike, params: EditParams,
               quality: int = 95, long_edge: int = None,
               jpeg_optimize: bool = False,
               chroma: str = "420",
               jpeg_restart_rows: int = 0,
               rotate: float = 0.0, crop=None, lens=None,
               perspective=None) -> str:
        """Full-res develop → JPEG/PNG/TIFF by extension; RGBA→RGB strip
        for JPEG on the host like the reference
        (reference: main.rs:1744-1799, alpha strip at
        main.rs:1778-1781). A .tif/.tiff extension writes 16-bit RGB
        (beyond the reference; see raw/tiff_out.py). ``long_edge``
        Lanczos3-resizes on device before the fetch (never upscales,
        see ops/resize.long_edge_shape). ``jpeg_restart_rows`` > 0
        emits DRI/RSTn restart markers every that many MCU rows and
        encodes the independent segments across all host cores
        (byte-identical for any core count) — resilient streams +
        parallel single-image encode. ``rotate`` (degrees) straightens
        and ``crop`` ((left, top, width, height), or None for the
        automatic largest source-aspect rectangle) crops — both
        device-side on the developed image, in the STORED sensor
        frame (before EXIF auto-orientation; ops/geometry.py).
        ``lens`` = (k1, k2, ca_r, ca_b) composes radial distortion /
        lateral-CA correction into the same resample
        (ops/geometry.py module docstring for the model and sign
        conventions)."""
        from PIL import Image

        path = os.fspath(path)
        if chroma not in ("420", "444"):
            # Library callers bypass argparse's choices= guard; a
            # silently-mapped '422' would encode 4:2:0 under a
            # mislabeled contract (code-review r3).
            raise ValueError(
                f"chroma must be '420' or '444', got {chroma!r}")
        self._guard_geometry(rotate, crop)
        from raweditor_tpu.ops.geometry import _resolve_lens

        lens = _resolve_lens(lens)
        ext = os.path.splitext(path)[1].lower()
        if ext not in (".tif", ".tiff", ".jpg", ".jpeg", ".png"):
            # Same contract as the batch exporter's _encode_one:
            # writing JPEG bytes under an unrecognized name (.webp, no
            # extension) would report success with a mislabeled file.
            raise ValueError(
                f"unsupported export extension {ext!r} "
                "(use .jpg/.jpeg/.png/.tif/.tiff)")
        if ext in (".tif", ".tiff"):
            return self.export_tiff16(path, params, long_edge=long_edge,
                                      rotate=rotate, crop=crop,
                                      lens=lens,
                                      perspective=perspective)
        if ext in (".jpg", ".jpeg") and (
                not self.auto_orient or self.raw.orientation == 1):
            jpeg = self._export_jpeg_planes(path, params, quality,
                                            long_edge=long_edge,
                                            optimize=jpeg_optimize,
                                            chroma=chroma,
                                            restart_rows=jpeg_restart_rows,
                                            rotate=rotate, crop=crop,
                                            lens=lens,
                                            perspective=perspective)
            if jpeg is not None:
                return jpeg
        words_dev = self.full_rgba_device(params)
        if (rotate or crop is not None or lens is not None
                or perspective is not None):
            from raweditor_tpu.ops.geometry import rotate_crop_rgba_words

            words_dev = rotate_crop_rgba_words(
                words_dev, float(rotate), crop, lens=lens,
                perspective=perspective)
        if long_edge:
            from raweditor_tpu.ops.resize import (long_edge_shape,
                                                  resize_rgba_words)

            gh, gw = words_dev.shape
            oh, ow = long_edge_shape(gh, gw, long_edge)
            if (oh, ow) != (gh, gw):
                words_dev = resize_rgba_words(words_dev, ow, oh)
        words = np.ascontiguousarray(np.asarray(words_dev))
        if self.auto_orient and self.raw.orientation != 1:
            words = np.ascontiguousarray(
                self.apply_orientation(words, self.raw.orientation)
            )
        out_h, out_w = words.shape
        img = Image.frombuffer(
            "RGBA", (out_w, out_h), words.tobytes(), "raw", "RGBA", 0, 1,
        )
        exif = self._exif_bytes()
        from raweditor_tpu.pipeline.export import _atomic_write

        icc = self._icc_bytes()

        def write(tmp):
            ikw = {"icc_profile": icc} if icc else {}
            if ext == ".png":
                img.save(tmp, format="PNG", exif=exif, **ikw)
            else:
                # The flags survive this PIL fallback (auto-orient, odd
                # dims, native ext missing): 4:4:4, optimize, and restart
                # markers (PIL's restart_marker_rows is the same MCU-row
                # unit as the native encoder's restart_rows).
                kw = {"subsampling": 0} if chroma == "444" else {}
                if jpeg_restart_rows > 0:
                    kw["restart_marker_rows"] = int(jpeg_restart_rows)
                img.convert("RGB").save(tmp, format="JPEG",
                                        quality=quality, exif=exif,
                                        optimize=jpeg_optimize, **kw,
                                        **ikw)

        # Atomic like every other exporter: an interrupted run must not
        # leave a truncated file a skip_existing rerun would trust
        # (code-review r3).
        _atomic_write(path, write)
        return path

    def _icc_bytes(self):
        """The embedded ICC profile bytes for non-sRGB output (None
        for sRGB — consumers assume it, and the default export bytes
        stay unchanged)."""
        if self.color_space == "srgb":
            return None
        from raweditor_tpu.icc import profile_bytes

        return profile_bytes(self.color_space)

    def _guard_geometry(self, rotate, crop) -> None:
        """Geometry applies in the STORED sensor frame; with
        auto-orient on a rotated shot the user's rectangle would land
        on the wrong region of the upright picture — reject rather
        than silently miscrop (code-review r3; one definition for the
        export paths)."""
        if ((rotate or crop is not None) and self.auto_orient
                and self.raw.orientation != 1):
            raise ValueError(
                "rotate/crop with auto_orient on a rotated shot "
                f"(orientation {self.raw.orientation}) is not "
                "supported: geometry applies in the stored sensor "
                "frame — disable auto_orient or crop in stored "
                "coordinates")

    def _exif_bytes(self) -> bytes:
        """Export metadata: camera make/model + the orientation tag
        (1 when auto_orient already rotated the pixels, the stored
        orientation otherwise so viewers rotate — the reference writes
        no metadata at all, reference: main.rs:1765-1791)."""
        from raweditor_tpu.raw.exif import build_exif

        orientation = 1 if self.auto_orient else self.raw.orientation
        return build_exif(self.raw.camera_make, self.raw.camera_model,
                          orientation)

    def _export_jpeg_planes(self, path: os.PathLike, params: EditParams,
                            quality: int, long_edge: int = None,
                            optimize: bool = False,
                            chroma: str = "420",
                            restart_rows: int = 0,
                            rotate: float = 0.0, crop=None, lens=None,
                            perspective=None):
        """JPEG export via device YCbCr planes + the native JFIF
        encoder (the batch exporter's transport-optimized path,
        ops/jpeg.py): 1.5 bytes/pixel fetched instead of 4 (chroma
        '420'; '444' keeps full-res chroma at 3 B/px) and no host
        colorspace pass. Returns None when unavailable (native ext
        missing, odd output dimensions in 4:2:0 mode) — the caller
        falls back to PIL."""
        from raweditor_tpu.native import get_rawkit

        rk = get_rawkit()
        geo_h, geo_w = self.height, self.width
        if rotate or crop is not None:
            from raweditor_tpu.ops.geometry import _resolve_geometry

            geo_w, geo_h = _resolve_geometry(
                self.height, self.width, float(rotate), crop)[:2]
        out_h, out_w = geo_h, geo_w
        if long_edge:
            from raweditor_tpu.ops.resize import long_edge_shape

            out_h, out_w = long_edge_shape(geo_h, geo_w, long_edge)
        full_chroma = chroma == "444"
        encode_name = "encode_jpeg_444" if full_chroma else "encode_jpeg_420"
        if (rk is None or not hasattr(rk, encode_name)
                or (not full_chroma and (out_h % 2 or out_w % 2))):
            return None
        words_dev = self.full_rgba_device(params)
        if (rotate or crop is not None or lens is not None
                or perspective is not None):
            from raweditor_tpu.ops.geometry import rotate_crop_rgba_words

            words_dev = rotate_crop_rgba_words(
                words_dev, float(rotate), crop, lens=lens,
                perspective=perspective)
        if (out_h, out_w) != (geo_h, geo_w):
            from raweditor_tpu.ops.resize import resize_rgba_words

            words_dev = resize_rgba_words(words_dev, out_w, out_h)
        # Process-wide jitted converters (export.py): per-engine jit
        # objects re-traced the same program for every opened image.
        from raweditor_tpu.pipeline.export import (_ycbcr420_jit,
                                                   _ycbcr444_jit)

        conv = _ycbcr444_jit() if full_chroma else _ycbcr420_jit()
        y, cb, cr = conv(words_dev)
        data = getattr(rk, encode_name)(
            np.ascontiguousarray(np.asarray(y)),
            np.ascontiguousarray(np.asarray(cb)),
            np.ascontiguousarray(np.asarray(cr)),
            out_w, out_h, quality, optimize,
            max(0, int(restart_rows)), 0)  # threads=0: all host cores
        from raweditor_tpu.raw.exif import splice_exif

        data = splice_exif(data, self._exif_bytes())
        icc = self._icc_bytes()
        if icc:
            from raweditor_tpu.icc import splice_icc_jpeg

            data = splice_icc_jpeg(data, icc)
        path = os.fspath(path)
        from raweditor_tpu.pipeline.export import _atomic_write

        def write(tmp):
            with open(tmp, "wb") as f:
                f.write(data)

        _atomic_write(path, write)
        return path

    def export_tiff16(self, path: os.PathLike, params: EditParams,
                      long_edge: int = None, rotate: float = 0.0,
                      crop=None, lens=None, perspective=None) -> str:
        """Full-res develop at 16 bits/channel → uncompressed RGB TIFF.
        The polynomial fast gamma is u8-accuracy (~6 LSBs of u16), so
        16-bit output always uses the exact transfer."""
        self._guard_geometry(rotate, crop)
        from raweditor_tpu.ops.develop import develop_u16
        from raweditor_tpu.raw.tiff_out import write_tiff16

        transfer = transfer16_for(self.transfer)
        ex = params.finish_extras_mode()

        if self.linear:
            from raweditor_tpu.ops.develop import develop_linear

            rgb = develop_linear(
                self._render_mosaic(params), params, self.wb, self.cam_matrix,
                self.white_level, self.black_level,
                matrix_transpose=self.matrix_transpose,
                transfer=transfer, bits=16, extras=ex,
            )
        elif self.xtrans_pattern is not None:
            from raweditor_tpu.ops.develop import develop_xtrans

            rgb = develop_xtrans(
                self._render_mosaic(params), params, self.wb, self.cam_matrix,
                self.white_level, self.black_level,
                pattern=self.xtrans_pattern,
                matrix_transpose=self.matrix_transpose,
                transfer=transfer,
                demosaic_method=_generic_cfa_method(self.demosaic_method),
                bits=16, extras=ex,
            )
        else:
            rgb = develop_u16(
                self._render_mosaic(params), params, self.wb, self.cam_matrix,
                white_level=self.white_level,
                black_level=self.black_level,
                demosaic_method=self.demosaic_method,
                matrix_transpose=self.matrix_transpose,
                transfer=transfer, cfa_phase=self.cfa_phase, extras=ex,
            )
        # Stay device-resident through geometry + resize; ONE host
        # fetch at the end (the old per-stage np.asarray ping-ponged
        # ~144 MB of extra transfers at 24 MP over a link the docs
        # describe as minutes-slow; code-review r3).
        if (rotate or crop is not None or lens is not None
                or perspective is not None):
            from raweditor_tpu.ops.geometry import rotate_crop_u16

            rgb = rotate_crop_u16(rgb, float(rotate), crop, lens=lens,
                                  perspective=perspective)
        if long_edge:
            from raweditor_tpu.ops.resize import (long_edge_shape,
                                                  resize_rgb16)

            oh, ow = long_edge_shape(rgb.shape[0], rgb.shape[1],
                                     long_edge)
            if (oh, ow) != tuple(rgb.shape[:2]):
                rgb = resize_rgb16(rgb, ow, oh)
        rgb = np.asarray(rgb)
        if self.auto_orient and self.raw.orientation != 1:
            rgb = np.ascontiguousarray(
                self.apply_orientation(rgb, self.raw.orientation)
            )
        from raweditor_tpu.pipeline.export import _atomic_write
        from raweditor_tpu.raw.exif import SOFTWARE

        path = os.fspath(path)
        _atomic_write(path, lambda tmp: write_tiff16(
            tmp, rgb, make=self.raw.camera_make,
            model=self.raw.camera_model,
            orientation=1 if self.auto_orient else self.raw.orientation,
            software=SOFTWARE, icc=self._icc_bytes()))
        return path

    def develop_tiers(self, params: EditParams,
                      widths=(256, 384, 1280)):
        """Preview tiers of the *developed* image, resized on device
        (XLA lanczos3) — tiers that reflect the current edits, unlike
        the reference's camera-JPEG tiers. Returns host u8 arrays."""
        from raweditor_tpu.ops.resize import develop_tiers as _tiers

        full = self.full_device(params)
        return [np.asarray(t) for t in _tiers(full, widths)]

    # -- convenience -----------------------------------------------------
    @classmethod
    def open(cls, path: os.PathLike, mode: str = "parity",
             **kwargs) -> "DevelopEngine":
        from raweditor_tpu.raw.decode import decode_raw

        return cls(decode_raw(path), mode=mode, **kwargs)

    def before_after(self, params: EditParams, zoom: float = 1.0,
                     pan: Tuple[float, float] = (0.0, 0.0)):
        """(before, after) previews — the reference's before/after toggle
        renders defaults vs current params (reference: main.rs:1507-1515)."""
        return (
            self.preview(EditParams(), zoom, pan),
            self.preview(params, zoom, pan),
        )
