"""Interactive develop session driver (headless).

The reference's develop tab is a GUI loop: slider tick → persist params
to SQLite → uniform update → re-render preview → histogram
(reference: main.rs:597-717, 1492-1697). This is the same loop over a
stdin/stdout line protocol, so an interactive frontend (or a latency
harness) can drive the engine without linking a GUI:

    set <slider> <value>     update one slider (persists when --db)
    open <id|path>           switch to another image (replays its edits)
    prefetch <id|path>       decode + upload the next image in the
                             background so the following `open` is
                             instant (one slot, latest wins)
    zoom <z> | pan <x> <y>   view transform (clamped like the UI)
    render <path>            write current preview PNG
    frame [quality] [latest] current preview as inline base64 JPEG
                             (remote clients of the TCP service);
                             `latest` returns the newest PROVEN
                             pipelined frame with zero device wait
                             (lags the newest tick; "lagged": true)
    preset <name|list>       apply a saved develop preset / list them
    auto [levels] [contrast] [tone] apply auto-adjust suggestions
    checkpoint | undo | history   freeze the current edits row /
                             revert to the previous row / list rows
    rate [0-5] [pick|reject|none] star/flag the current image in the
                             catalog (culling from the develop view);
                             bare `rate` reads both back
    full <path> [long-edge]  full-resolution export (optional device
                             Lanczos3 resize to this long edge)
    histogram                print (3,256) JSON histogram
    wb <x> <y>               white-balance eyedropper: neutralize the
                             patch at frame-normalized (x, y) via the
                             temperature/tint sliders
    before <path>            preview with default params (before view)
    reset                    defaults (deletes stored edits when --db)
    stats                    latency percentiles for this session
    quit

Every ``set`` re-renders the preview to measure slider→frame latency,
the BASELINE p50/p95 metric.
"""

from __future__ import annotations

import json
import math
import sys
from typing import Optional

from raweditor_tpu.params import EditParams
from raweditor_tpu.pipeline.engine import DevelopEngine
from raweditor_tpu.utils.config import Config
from raweditor_tpu.utils.timing import LatencyStats


class DevelopSession:
    def __init__(self, engine: Optional[DevelopEngine], library=None,
                 image_id: Optional[int] = None,
                 config: Optional[Config] = None,
                 engine_defaults: Optional[dict] = None):
        # ``engine=None`` is the image-less shell the TCP service
        # starts connections with; the first `open` builds the engine
        # from ``engine_defaults``.
        self.engine = engine
        self.library = library
        self.image_id = image_id
        self.config = config or Config()
        self._engine_defaults = engine_defaults or {}
        self.params = EditParams()
        if library is not None and image_id is not None:
            # Replay stored edits (reference: main.rs:510-517).
            self.params = library.load_edit_params(image_id)
        self.zoom = 1.0
        self.pan = (0.0, 0.0)
        self.latency = LatencyStats()
        # After a checkpoint the latest edits row is frozen; the next
        # slider tick starts a new working row instead of updating it.
        # A REPLAYED image's newest stored row may be a checkpoint
        # from a previous process (we can't tell from here) — treat it
        # as frozen so the first tick APPENDS instead of destroying
        # checkpoint history, exactly like open() (code-review r3:
        # the constructor path overwrote it).
        self._frozen = image_id is not None

    # -- commands --------------------------------------------------------
    def set_slider(self, name: str, value: float) -> dict:
        if name not in EditParams.field_names():
            raise ValueError(f"unknown slider {name!r}")
        value = float(value)
        if not math.isfinite(value):
            # A NaN here would poison the develop chain and persist an
            # unrepresentable value into the edit store.
            raise ValueError(f"{name} must be finite, got {value}")
        self.params = self.params.replace(**{name: value})
        self._persist_params()
        ms = self._timed_tick()
        return {"ok": True, "slider": name, "value": float(value),
                "render_ms": round(ms, 3)}

    def local_cmd(self, *args) -> dict:
        """Local-adjustment masks (ops/local_adjust.py):
        ``local list`` / ``local add <kind> [K=V ...]`` /
        ``local set <index> <field> <value>`` / ``local del <index>``
        / ``local clear``. Mask geometry/deltas re-render and persist
        like any slider tick."""
        from raweditor_tpu.ops.local_adjust import (
            _DATA_FIELDS,
            LocalAdjust,
        )

        op = args[0] if args else "list"
        if op == "list":
            return {"ok": True,
                    "locals": [m.to_dict() for m in self.params.locals]}
        if op == "clear":
            self.params = self.params.replace(locals=())
            self._persist_params()
            ms = self._timed_tick()
            return {"ok": True, "locals": [],
                    "render_ms": round(ms, 3)}
        if op == "add":
            if len(args) < 2:
                raise ValueError("usage: local add <kind> [K=V ...]")
            data = {"kind": args[1]}
            for part in args[2:]:
                k, eq, v = part.partition("=")
                if not eq:
                    raise ValueError(f"expected K=V, got {part!r}")
                data[k] = float(v)
            mask = LocalAdjust.from_dict(data)
            self.params = self.params.replace(
                locals=tuple(self.params.locals) + (mask,))
            self._persist_params()
            ms = self._timed_tick()
            return {"ok": True, "index": len(self.params.locals) - 1,
                    "mask": mask.to_dict(), "render_ms": round(ms, 3)}
        if op in ("set", "del"):
            if len(args) < (4 if op == "set" else 2):
                raise ValueError(
                    "usage: local set <index> <field> <value> | "
                    "local del <index>")
            idx = int(args[1])
            masks = list(self.params.locals)
            if not (0 <= idx < len(masks)):
                raise ValueError(
                    f"no local adjustment at index {idx} "
                    f"({len(masks)} defined)")
            if op == "del":
                masks.pop(idx)
            else:
                field = args[2]
                if field not in _DATA_FIELDS:
                    raise ValueError(
                        f"unknown mask field {field!r} "
                        f"(one of {_DATA_FIELDS})")
                value = float(args[3])
                if not math.isfinite(value):
                    raise ValueError(f"{field} must be finite, got "
                                     f"{value}")
                masks[idx] = masks[idx].replace(**{field: value})
            self.params = self.params.replace(locals=tuple(masks))
            self._persist_params()
            ms = self._timed_tick()
            out = {"ok": True, "locals": [m.to_dict()
                                          for m in self.params.locals],
                   "render_ms": round(ms, 3)}
            return out
        raise ValueError(
            f"unknown local op {op!r} (list|add|set|del|clear)")

    def curve_cmd(self, *args) -> dict:
        """Point tone curve (ops/curve.py): ``curve list`` /
        ``curve set x1 y1 x2 y2 ...`` / ``curve clear``. ``set``
        replaces the whole control-point list (the natural protocol
        for a curve widget dragging points); coordinates validate
        through ops.curve.validate_points."""
        from raweditor_tpu.ops.curve import validate_points

        op = args[0] if args else "list"
        if op == "list":
            return {"ok": True,
                    "points": [[float(x), float(y)]
                               for x, y in self.params.point_curve]}
        if op == "clear":
            self.params = self.params.replace(point_curve=())
        elif op == "set":
            coords = [float(v) for v in args[1:]]
            if not coords or len(coords) % 2:
                raise ValueError(
                    "usage: curve set x1 y1 x2 y2 ... (pairs)")
            pts = validate_points(list(zip(coords[0::2], coords[1::2])))
            self.params = self.params.replace(point_curve=pts)
        else:
            raise ValueError(
                f"unknown curve op {op!r} (list|set|clear)")
        self._persist_params()
        ms = self._timed_tick()
        return {"ok": True,
                "points": [[float(x), float(y)]
                           for x, y in self.params.point_curve],
                "render_ms": round(ms, 3)}

    def pick_wb(self, x: float, y: float) -> dict:
        """White-balance eyedropper: sample the patch at
        frame-normalized (x, y), set the temperature/tint sliders that
        neutralize it (engine.pick_wb), persist, and re-render — the
        click-a-gray-card workflow, headless."""
        if not (math.isfinite(x) and math.isfinite(y)):
            raise ValueError("wb point must be finite")
        t, u = self.engine.pick_wb(x, y)
        self.params = self.params.replace(temperature=t, tint=u)
        self._persist_params()
        ms = self._timed_tick()
        return {"ok": True, "temperature": round(t, 4),
                "tint": round(u, 4), "render_ms": round(ms, 3)}

    def _persist_params(self) -> None:
        """Persist on every tick, like the reference
        (reference: main.rs:1095-1106). A frozen (checkpointed) row is
        never updated — the first tick after a checkpoint appends.
        One definition for set/auto/preset (code-review r3)."""
        if self.library is not None and self.image_id is not None:
            self.library.save_edit_params(self.image_id, self.params,
                                          append=self._frozen)
            self._frozen = False

    def _timed_tick(self) -> float:
        """Render the preview and record slider→frame latency — on
        SUCCESS only (a context-managed measure() recorded
        time-to-exception into the headline p50/p95 under the TCP
        service's broad error handling; code-review r3). preview_tick
        = AOT dispatch + checksum-byte sync: the render is provably
        finished when the timer stops. First tick compiles the AOT
        executables (one-off). Returns milliseconds.

        With config.session_pipeline_depth > 0 the tick runs in the
        pipelined steady-state mode instead: up to N renders stay in
        flight and each tick retires the one N behind it, so the
        recorded latency is the amortized per-frame cost rather than
        a full transport round trip per tick (frames lag the slider
        by N ticks — flushed before any fetch, see _flush_pipeline)."""
        import time

        t0 = time.perf_counter()
        depth = int(getattr(self.config, "session_pipeline_depth", 0))
        if depth > 0:
            self.engine.preview_tick_pipelined(self.params, self.zoom,
                                               self.pan, depth=depth)
        else:
            self.engine.preview_tick(self.params, self.zoom, self.pan)
        dt = time.perf_counter() - t0
        self.latency.record(dt)
        return dt * 1000.0

    def _flush_pipeline(self) -> None:
        """Retire any in-flight pipelined ticks before a fetch-side
        command produces a frame, so bursts don't leave stragglers
        holding device buffers."""
        if self.engine is not None:
            self.engine.flush_pipeline()

    def set_zoom(self, zoom: float) -> dict:
        # NaN passes min/max clamps unchanged (comparisons are False)
        # and would poison every later render AND emit RFC-invalid
        # JSON — reject like set_slider does (code-review r3).
        if not math.isfinite(zoom):
            raise ValueError("zoom must be finite")
        self.zoom = min(max(zoom, self.config.zoom_min),
                        self.config.zoom_max)
        return {"ok": True, "zoom": self.zoom}

    def set_pan(self, x: float, y: float) -> dict:
        if not (math.isfinite(x) and math.isfinite(y)):
            raise ValueError("pan must be finite")
        self.pan = (x, y)
        return {"ok": True, "pan": list(self.pan)}

    def render(self, path: str, params: Optional[EditParams] = None) -> dict:
        from PIL import Image

        self._flush_pipeline()

        img = self.engine.preview(params or self.params, self.zoom,
                                  self.pan)
        Image.fromarray(img).save(path)
        return {"ok": True, "path": path,
                "size": [img.shape[1], img.shape[0]]}

    def frame(self, quality: int = 80,
              params: Optional[EditParams] = None,
              latest: bool = False) -> dict:
        """Current preview as an inline base64 JPEG — the transport
        for remote GUI clients of the TCP service (``render`` writes
        to the SERVER's filesystem, which a remote client can't see).
        ~100 KB at quality 80 vs 2.7 MB of raw preview RGB. The
        colorspace + 4:2:0 subsample run on device and the native
        encoder produces the bytes (engine.preview_jpeg) — the fetch
        is 1.5 B/px instead of 3 on bandwidth-starved transports.

        ``frame <q> latest`` is the pipelined-mode companion: return
        the newest already-PROVEN frame without flushing or rendering
        — zero device wait, so a GUI can tick sliders at dispatch
        cost and poll frames at its own cadence (the returned frame
        lags the newest tick by the transport round trip; ``lagged``
        in the response says so). Falls back to the synchronous path
        when nothing is proven yet. Measured on the tunneled dev
        chip: saves the flush round trip (~24 ms of a 241 ms frame;
        the remainder is the 1.5 B/px plane fetch + encode, which
        both paths pay) — the win scales with transport latency, the
        fetch with transport bandwidth."""
        import base64

        if not 1 <= int(quality) <= 100:
            raise ValueError("quality must be 1..100")
        dev = self.engine.newest_pipelined_frame() if latest else None
        if dev is None:
            self._flush_pipeline()
            data, w, h = self.engine.preview_jpeg(
                params or self.params, self.zoom, self.pan,
                quality=int(quality))
            lagged = False
        else:
            data, w, h = self.engine.preview_jpeg(
                params or self.params, self.zoom, self.pan,
                quality=int(quality), frame=dev)
            lagged = True
        return {"ok": True, "size": [w, h],
                "quality": int(quality), "bytes": len(data),
                "lagged": lagged,
                "jpeg_base64": base64.b64encode(data).decode("ascii")}

    def full(self, path: str, long_edge: int = 0) -> dict:
        self._flush_pipeline()
        return {"ok": True,
                "path": self.engine.export(
                    path, self.params,
                    long_edge=int(long_edge) or None)}

    def histogram(self) -> dict:
        self._flush_pipeline()
        hist = self.engine.histogram(self.params, self.zoom, self.pan)
        return {"ok": True, "r": hist[0].tolist(), "g": hist[1].tolist(),
                "b": hist[2].tolist()}

    def checkpoint(self) -> dict:
        """Freeze the current params as a history entry (undo target).
        Beyond the reference, whose 'history' was one upserted row."""
        if self.library is None or self.image_id is None:
            return {"ok": False, "error": "no catalog attached"}
        self.library.save_edit_params(self.image_id, self.params)
        self._frozen = True
        n = len(self.library.edit_history(self.image_id))
        return {"ok": True, "checkpoints": n}

    def undo(self) -> dict:
        if self.library is None or self.image_id is None:
            return {"ok": False, "error": "no catalog attached"}
        self.params = self.library.undo_edit(self.image_id)
        # The restored row is a checkpoint: the next tick must append a
        # fresh working row, not overwrite it.
        self._frozen = True
        return {"ok": True, "params": json.loads(self.params.to_json())}

    def history(self) -> dict:
        if self.library is None or self.image_id is None:
            return {"ok": False, "error": "no catalog attached"}
        entries = self.library.edit_history(self.image_id)
        return {"ok": True,
                "history": [json.loads(p.to_json()) for p in entries]}

    def reset(self) -> dict:
        self.params = EditParams()
        if self.library is not None and self.image_id is not None:
            # (reference: main.rs:697-717)
            self.library.delete_edits(self.image_id)
        return {"ok": True, "reset": True}

    def auto(self, *options: str) -> dict:
        """Apply the auto-adjust suggestion (exposure + WB; pass
        'levels'/'contrast'/'tone' tokens for the extra corrections)."""
        from raweditor_tpu.pipeline.auto import suggest_auto

        bad = set(options) - {"levels", "contrast", "tone"}
        if bad:
            return {"ok": False,
                    "error": f"usage: auto [levels] [contrast] [tone]"}
        self.params = suggest_auto(
            self.engine, self.params,
            include_levels="levels" in options,
            include_contrast="contrast" in options,
            include_tone="tone" in options,
        )
        self._persist_params()
        return {"ok": True, "params": json.loads(self.params.to_json())}

    def open(self, target: str) -> dict:
        """Switch the session to another image — the reference's
        develop-tab image selection (reference: main.rs:497-527):
        decode, replay its stored edits, reset the view transform.
        ``target`` is a catalog image id (with --db) or a file path."""
        try:
            path, image_id = self._resolve_target(target)
        except ValueError as e:
            return {"ok": False, "error": str(e)}
        eng = self.engine
        kwargs = self._engine_kwargs()
        new_engine = self._take_prefetched(path, kwargs)
        if new_engine is None:
            try:
                new_engine = DevelopEngine.open(path, **kwargs)
            except Exception as e:  # quarantine, stay on current image
                return {"ok": False, "error": f"decode: {e}"}
        if eng is not None:
            # Retire the outgoing engine's pipelined-syncer thread and
            # its device-resident frames — a long serve session
            # switching images must not leak one parked thread plus
            # HBM buffers per open (code-review r4).
            try:
                eng.close_pipeline()
            except Exception:  # noqa: BLE001 - a wedged tail sync
                pass           # must not block the image switch
        self.engine = new_engine
        self.image_id = image_id
        self.params = (self.library.load_edit_params(image_id)
                       if self.library is not None and image_id is not None
                       else EditParams())
        self.zoom = 1.0
        self.pan = (0.0, 0.0)
        # The image's newest stored row may be a frozen checkpoint (we
        # can't tell from here): treat it as frozen so the first tick
        # APPENDS instead of overwriting checkpoint history.
        self._frozen = image_id is not None
        return {"ok": True, "path": path, "image_id": image_id,
                "size": [self.engine.width, self.engine.height],
                "params": json.loads(self.params.to_json())}

    def _resolve_target(self, target: str):
        """(path, image_id) for an `open`/`prefetch` target — a
        catalog image id (with --db) or a file path. Raises ValueError
        with the user-facing message."""
        import os

        path = target
        image_id = None
        if self.library is not None and target.isdigit():
            image_id = int(target)
            row = self.library.get_image(image_id)
            if row is None:
                raise ValueError(f"no catalog image {image_id}")
            path = row.path
        if not os.path.exists(path):
            raise ValueError(f"no such file: {path}")
        return path, image_id

    def _engine_kwargs(self) -> dict:
        """The next engine's constructor settings: the current
        engine's as-constructed kwargs (preview/histogram sizes and
        the pre-resolution transfer carry over, so fast_gamma
        re-resolves identically), or the server defaults for an
        image-less shell."""
        if self.engine is not None:
            return dict(self.engine.ctor_kwargs)
        return dict(getattr(self, "_engine_defaults", {}) or {})

    def prefetch(self, target: str) -> dict:
        """Decode + device-upload the NEXT image on a background
        thread so a following ``open`` is instant — the filmstrip
        pre-load every interactive editor does (the reference decodes
        synchronously on selection, its "slow 3-second operation",
        reference: main.rs:580). One slot, latest wins; the engine is
        built with the same settings ``open`` would use and is only
        consumed if those settings still match at open time. Decode
        errors are deferred: ``open`` falls back to its synchronous
        path and reports them normally."""
        import threading

        try:
            path, _ = self._resolve_target(target)
        except ValueError as e:
            return {"ok": False, "error": str(e)}
        slot = getattr(self, "_prefetch", None)
        if slot is not None and slot[0] == path \
                and (slot[1].is_alive() or "engine" in slot[2]):
            return {"ok": True, "path": path, "pending": True}
        kwargs = self._engine_kwargs()
        box = {}

        def work():
            try:
                box["engine"] = DevelopEngine.open(path, **kwargs)
            except Exception as e:  # noqa: BLE001 - deferred to open()
                box["error"] = f"{type(e).__name__}: {e}"

        th = threading.Thread(target=work, daemon=True,
                              name="raweditor-prefetch")
        self._prefetch = (path, th, box, kwargs)
        th.start()
        return {"ok": True, "path": path, "pending": True}

    def _take_prefetched(self, path: str, kwargs: dict):
        """Consume the prefetch slot if it holds ``path`` built with
        ``kwargs``; returns the engine or None. Waits for an in-flight
        prefetch of the right path (it started earlier, so this is
        still faster than re-decoding)."""
        slot = getattr(self, "_prefetch", None)
        if slot is None or slot[0] != path or slot[3] != kwargs:
            return None
        self._prefetch = None
        slot[1].join(timeout=120.0)
        if slot[1].is_alive():  # wedged decode: fall back
            return None
        return slot[2].get("engine")  # None on recorded error → fall back

    def preset(self, name: str = "list") -> dict:
        """Apply a saved develop preset on top of the current params
        (sparse compose, raweditor_tpu/presets.py) and re-render;
        ``preset list`` enumerates what's available."""
        from raweditor_tpu import presets as _presets

        if name == "list":
            return {"ok": True, "presets": _presets.list_presets()}
        try:
            self.params = _presets.apply_preset(self.params, name)
        except (KeyError, ValueError) as e:
            return {"ok": False, "error": str(e)}
        self._persist_params()
        ms = self._timed_tick()
        return {"ok": True, "preset": name,
                "params": json.loads(self.params.to_json()),
                "render_ms": round(ms, 3)}

    def rate(self, *args) -> dict:
        """Culling from the develop view (beyond the reference):
        ``rate <0-5>`` stars and/or ``rate pick|reject|none`` the
        CURRENT image; ``rate`` alone reads back both. Requires a
        catalog-attached session (the rating lives in the catalog's
        side table, shared with the CLI `rate`/`list --min-rating`
        workflow)."""
        if self.library is None or self.image_id is None:
            return {"ok": False, "error": "no catalog attached"}
        rating = flag = None
        for a in args:
            if a in self.library.FLAGS:
                flag = a
            else:
                try:
                    rating = int(a)
                except ValueError:
                    return {"ok": False,
                            "error": f"usage: rate [0-5] "
                                     f"[{'|'.join(self.library.FLAGS)}]"}
        if rating is not None or flag is not None:
            self.library.set_rating(self.image_id, rating=rating,
                                    flag=flag)
        cur_rating, cur_flag = self.library.get_rating(self.image_id)
        return {"ok": True, "image_id": self.image_id,
                "rating": cur_rating, "flag": cur_flag}

    def stats(self) -> dict:
        return {"ok": True, "latency": self.latency.summary()}

    def close(self) -> None:
        """Session teardown: retire the engine's pipelined-syncer
        thread and its device-resident frames. Without this, each
        long-lived serve connection (or a `quit` REPL) left the daemon
        syncer parked and the last frames referenced until GC — only
        the `open` image-switch path retired it (advisor r4).
        Best-effort like open()'s: a wedged tail sync must not block
        shutdown."""
        self._prefetch = None  # drop any pre-loaded engine with it
        if self.engine is not None:
            try:
                self.engine.close_pipeline()
            except Exception:  # noqa: BLE001 - transport error on the
                pass           # tail sync; the thread still stops

    # -- line protocol ---------------------------------------------------
    def handle(self, line: str) -> Optional[dict]:
        parts = line.strip().split()
        if not parts:
            return None
        cmd, args = parts[0], parts[1:]
        if cmd == "quit":
            return None
        # Arity check up front so a missing operand reads as usage help,
        # not a bare IndexError message.
        min_args = {"set": 2, "zoom": 1, "pan": 2, "render": 1, "full": 1,
                    "before": 1, "open": 1, "prefetch": 1, "wb": 2}
        usage = {"set": "set <slider> <value>", "zoom": "zoom <factor>",
                 "pan": "pan <x> <y>", "render": "render <path>",
                 "full": "full <path> [long-edge]",
                 "before": "before <path>",
                 "open": "open <image-id|path>",
                 "prefetch": "prefetch <image-id|path>",
                 "wb": "wb <x> <y>  (frame-normalized 0..1)"}
        if len(args) < min_args.get(cmd, 0):
            return {"ok": False, "error": f"usage: {usage[cmd]}"}
        try:
            if cmd == "set":
                return self.set_slider(args[0], float(args[1]))
            if cmd == "zoom":
                return self.set_zoom(float(args[0]))
            if cmd == "pan":
                return self.set_pan(float(args[0]), float(args[1]))
            if cmd == "render":
                return self.render(args[0])
            if cmd == "frame":
                latest = "latest" in args
                nums = [a for a in args if a != "latest"]
                return self.frame(int(nums[0]) if nums else 80,
                                  latest=latest)
            if cmd == "full":
                return self.full(args[0],
                                 int(args[1]) if len(args) > 1 else 0)
            if cmd == "histogram":
                return self.histogram()
            if cmd == "wb":
                return self.pick_wb(float(args[0]), float(args[1]))
            if cmd == "before":
                return self.render(args[0], EditParams())
            if cmd == "reset":
                return self.reset()
            if cmd == "checkpoint":
                return self.checkpoint()
            if cmd == "undo":
                return self.undo()
            if cmd == "history":
                return self.history()
            if cmd == "auto":
                return self.auto(*args)
            if cmd == "preset":
                if len(args) > 1:
                    return {"ok": False,
                            "error": "usage: preset <name|list>"}
                return self.preset(*args)
            if cmd == "open":
                return self.open(args[0])
            if cmd == "prefetch":
                return self.prefetch(args[0])
            if cmd == "rate":
                return self.rate(*args)
            if cmd == "local":
                return self.local_cmd(*args)
            if cmd == "curve":
                return self.curve_cmd(*args)
            if cmd == "stats":
                return self.stats()
            return {"ok": False, "error": f"unknown command {cmd!r}"}
        except (IndexError, ValueError, OSError, RuntimeError) as e:
            # OSError covers filesystem failures from render/full/frame
            # targets (bad directory, permissions) — a typo'd path must
            # error the command, not kill the session (code-review r3).
            # RuntimeError covers a failed pipelined tail sync
            # (engine.flush_pipeline re-raises a transport drop): the
            # fetch command reports it and the session lives — the
            # syncer restarts on the next tick (r5; the TCP service
            # already survived this via its broad handler, the REPL
            # died with a traceback).
            return {"ok": False, "error": str(e)}

    def repl(self, stdin=None, stdout=None) -> None:
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        try:
            for line in stdin:
                # First-token match like the TCP service (serve.py): a
                # "quit" with trailing tokens must exit, not be
                # swallowed with no response (a synchronous client
                # would deadlock).
                if line.split() and line.split()[0] == "quit":
                    break
                result = self.handle(line)
                if result is not None:
                    stdout.write(json.dumps(result) + "\n")
                    stdout.flush()
        finally:
            self.close()
