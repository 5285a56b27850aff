"""Interactive develop-session driver tests."""

import io
import json

import numpy as np
import pytest

from raweditor_tpu.catalog import Library
from raweditor_tpu.params import EditParams
from raweditor_tpu.pipeline.engine import DevelopEngine
from raweditor_tpu.pipeline.session import DevelopSession
from raweditor_tpu.raw.synth import write_synthetic_raw


@pytest.fixture
def session(tmp_path, rng, monkeypatch):
    # Sandbox: protocol commands like ``render exposure`` resolve
    # CWD-relative output paths, so keep the CWD inside tmp_path — the
    # fuzz test must never drop files into the repo root.
    monkeypatch.chdir(tmp_path)
    path = tmp_path / "a.nef"
    write_synthetic_raw(
        path, rng.integers(0, 4096, size=(24, 32), dtype=np.uint16)
    )
    lib = Library(tmp_path / "cat.db")
    image_id = lib.import_image(str(path), "a.nef")
    eng = DevelopEngine.open(path)
    yield DevelopSession(eng, lib, image_id), lib, image_id
    lib.close()


def test_set_persists_and_measures(session):
    s, lib, image_id = session
    out = s.set_slider("exposure", 1.5)
    assert out["ok"] and out["render_ms"] > 0
    # Persisted on every tick (reference: main.rs:1095-1106).
    assert lib.load_edit_params(image_id).exposure == 1.5
    assert s.stats()["latency"]["count"] == 1


def test_unknown_slider(session):
    s, _, _ = session
    out = s.handle("set bogus 1.0")
    assert not out["ok"]


def test_zoom_clamped(session):
    s, _, _ = session
    assert s.set_zoom(50.0)["zoom"] == 10.0  # reference: main.rs:803
    assert s.set_zoom(0.01)["zoom"] == 0.1


def test_non_finite_view_rejected(session):
    """NaN passes min/max clamps unchanged and would poison every
    later render and emit RFC-invalid JSON (code-review r3)."""
    s, _, _ = session
    for line in ("zoom nan", "zoom inf", "pan nan 0", "pan 0 -inf"):
        out = s.handle(line)
        assert not out["ok"], line
    assert s.zoom == 1.0 and s.pan == (0.0, 0.0)
    out = s.handle("render p.png")  # view transform still healthy
    assert out["ok"]


def test_bad_output_path_errors_without_killing_repl(session):
    """A typo'd render directory must error the command, not escape
    handle() and crash the REPL (code-review r3)."""
    import io
    import json as _json

    s, _, _ = session
    out = s.handle("render /no/such/dir/deep/p.png")
    assert out is not None and not out["ok"]
    # Through the REPL loop too: the session survives to answer the
    # next command, and 'quit now' exits instead of being swallowed.
    stdin = io.StringIO("render /no/such/dir/deep/p.png\n"
                        "zoom 2\nquit now\nzoom 4\n")
    stdout = io.StringIO()
    s.repl(stdin, stdout)
    lines = [_json.loads(x) for x in stdout.getvalue().splitlines()]
    assert len(lines) == 2  # error + zoom ack; nothing after quit
    assert not lines[0]["ok"] and lines[1]["zoom"] == 2.0


def test_render_and_before(session, tmp_path):
    s, _, _ = session
    s.set_slider("exposure", 2.0)
    after = s.render(str(tmp_path / "after.png"))
    before = s.handle(f"before {tmp_path / 'before.png'}")
    assert after["ok"] and before["ok"]
    from PIL import Image

    a = np.asarray(Image.open(tmp_path / "after.png"))
    b = np.asarray(Image.open(tmp_path / "before.png"))
    assert (a != b).any()


def test_frame_inline_jpeg(session):
    """`frame [quality]` returns the preview as base64 JPEG — the
    remote-client transport (render writes to the server's disk)."""
    import base64
    import io

    from PIL import Image

    s, _, _ = session
    s.set_slider("exposure", 1.0)
    out = s.handle("frame")
    assert out["ok"] and out["quality"] == 80
    jpeg = base64.b64decode(out["jpeg_base64"])
    assert out["bytes"] == len(jpeg)
    with Image.open(io.BytesIO(jpeg)) as im:
        assert [im.width, im.height] == out["size"]
    # The frame is the CURRENT render, not a cache: decoded pixels
    # must match PIL's q80 encode of the same preview. (The bytes come
    # from the native encoder via device-side 4:2:0 planes since r4 —
    # engine.preview_jpeg — so byte-equality with PIL no longer holds;
    # on this noise fixture both encoders sit ~24 mean-abs from the
    # raw render (4:2:0 chroma on noise), within ~1.5 of each other.)
    ref = s.engine.preview(s.params, s.zoom, s.pan)
    buf = io.BytesIO()
    Image.fromarray(ref).save(buf, format="JPEG", quality=80)
    with Image.open(buf) as im:
        pil_px = np.asarray(im.convert("RGB"), np.float32)
    with Image.open(io.BytesIO(jpeg)) as im:
        got = np.asarray(im.convert("RGB"), np.float32)
    assert np.abs(got - pil_px).mean() < 3.0
    # ...and tracks param changes (a stale frame would still pass the
    # tolerance check against its own old render).
    s.set_slider("exposure", -1.5)
    out2 = s.handle("frame")
    jpeg2 = base64.b64decode(out2["jpeg_base64"])
    assert jpeg2 != jpeg
    # lower quality → smaller payload
    small = s.handle("frame 30")
    assert small["ok"] and small["bytes"] < out2["bytes"]
    assert not s.handle("frame 0")["ok"]


def test_reset_deletes_edits(session):
    s, lib, image_id = session
    s.set_slider("contrast", 9.0)
    assert lib.has_edits(image_id)
    s.reset()
    assert not lib.has_edits(image_id)
    assert s.params == EditParams()


def test_repl_protocol(session, tmp_path):
    s, _, _ = session
    stdin = io.StringIO(
        "set exposure 1.0\n"
        "zoom 2.0\n"
        "pan 0.1 -0.1\n"
        "histogram\n"
        "stats\n"
        "garbage command\n"
        "quit\n"
    )
    stdout = io.StringIO()
    s.repl(stdin, stdout)
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert len(lines) == 6
    assert lines[0]["slider"] == "exposure"
    assert lines[3]["ok"] and len(lines[3]["r"]) == 256
    assert lines[4]["latency"]["count"] >= 1
    assert not lines[5]["ok"]


def test_checkpoint_undo_history(session):
    s, lib, image_id = session
    s.set_slider("exposure", 1.0)
    assert s.checkpoint()["checkpoints"] >= 1
    s.set_slider("exposure", 2.0)
    s.checkpoint()
    out = s.history()
    assert [e["exposure"] for e in out["history"]][-2:] == [1.0, 2.0]
    undone = s.undo()
    assert undone["params"]["exposure"] == 1.0
    assert s.params.exposure == 1.0


def test_missing_operand_reports_usage(session):
    sess, _, _ = session
    out = sess.handle("render")
    assert out == {"ok": False, "error": "usage: render <path>"}
    out = sess.handle("set exposure")
    assert out == {"ok": False, "error": "usage: set <slider> <value>"}


def test_protocol_fuzz_never_crashes(session, rng):
    """Random garbage lines must always produce a JSON-able dict (or
    None), never an uncaught exception."""
    sess, _, _ = session
    words = ["set", "zoom", "pan", "render", "full", "histogram",
             "auto", "undo", "checkpoint", "exposure", "bogus",
             "1.5", "-999", "nan", "inf", "", "\x00", "𝕏", "--", "0x10"]
    for _ in range(300):
        n = int(rng.integers(0, 5))
        line = " ".join(words[int(rng.integers(0, len(words)))]
                        for _ in range(n))
        out = sess.handle(line)
        assert out is None or isinstance(out, dict)
        if isinstance(out, dict):
            json.dumps(out)


def test_open_switches_image(session, tmp_path, rng):
    """The reference develop tab switches images; the session's `open`
    swaps engines, replays the new image's stored edits, and resets
    the view (reference: main.rs:497-527)."""
    s, lib, image_id = session
    other = tmp_path / "b.nef"
    write_synthetic_raw(
        other, rng.integers(0, 4096, size=(16, 20), dtype=np.uint16))
    other_id = lib.import_image(str(other), "b.nef")
    lib.save_edit_params(other_id, EditParams(exposure=0.7))

    s.set_zoom(2.0)
    out = s.handle(f"open {other_id}")
    assert out["ok"] and out["size"] == [20, 16]
    assert s.image_id == other_id
    assert s.params.exposure == 0.7  # stored edits replayed
    assert s.zoom == 1.0 and s.pan == (0.0, 0.0)
    # Slider ticks persist against the NEW image now.
    s.set_slider("contrast", 10.0)
    assert lib.load_edit_params(other_id).contrast == 10.0

    # Bad targets keep the session on the current image.
    bad = s.handle("open 9999")
    assert not bad["ok"] and s.image_id == other_id
    bad = s.handle(f"open {tmp_path / 'missing.nef'}")
    assert not bad["ok"]
    # Open by plain path (no catalog id): edits start from defaults.
    out = s.handle(f"open {tmp_path / 'a.nef'}")
    assert out["ok"] and out["image_id"] is None
    assert s.params == EditParams()


def test_open_preserves_checkpoint_history(session, tmp_path, rng):
    """Re-opening an image must not let the next slider tick overwrite
    its newest (possibly checkpointed) edits row — regression for the
    frozen-flag reset found in review."""
    s, lib, image_id = session
    s.set_slider("exposure", 1.0)
    s.checkpoint()
    other = tmp_path / "c.nef"
    write_synthetic_raw(
        other, rng.integers(0, 4096, size=(16, 20), dtype=np.uint16))
    other_id = lib.import_image(str(other), "c.nef")
    s.handle(f"open {other_id}")
    s.handle(f"open {image_id}")  # back to the checkpointed image
    s.set_slider("exposure", 3.0)
    history = lib.edit_history(image_id)
    assert [p.exposure for p in history] == [1.0, 3.0]  # both rows live


def test_non_finite_slider_rejected(session):
    sess, lib, image_id = session
    for bad in ("nan", "inf", "-inf"):
        out = sess.handle(f"set exposure {bad}")
        assert out["ok"] is False and "finite" in out["error"]
    # Nothing persisted, params unchanged.
    assert float(sess.params.exposure) == 0.0


def test_auto_with_levels_and_contrast_tokens(session):
    sess, _, _ = session
    out = sess.handle("auto levels contrast")
    assert out["ok"] is True
    out = sess.handle("auto bogus")
    assert out["ok"] is False and "usage" in out["error"]


# -- pipelined slider mode (engine.preview_tick_pipelined) ---------------

def _pipelined_session(tmp_path, rng, depth):
    from raweditor_tpu.utils.config import Config

    path = tmp_path / "p.nef"
    write_synthetic_raw(
        path, rng.integers(0, 4096, size=(24, 32), dtype=np.uint16)
    )
    eng = DevelopEngine.open(path)
    return eng, DevelopSession(
        eng, None, None, config=Config(session_pipeline_depth=depth))


def test_pipelined_frames_match_true_sync(tmp_path, rng):
    """Latest-wins pipeline: the first tick returns None (nothing
    proven yet); flush waits for the tail and returns a frame
    bit-identical to a true-sync render of the NEWEST params (stream
    order proves the intermediates; their frames are skipped, not
    fetched)."""
    eng, _ = _pipelined_session(tmp_path, rng, 2)
    values = [0.1, 0.4, 0.7, 1.0, 1.3]
    first = eng.preview_tick_pipelined(EditParams(exposure=values[0]))
    assert first is None
    for v in values[1:]:
        frame = eng.preview_tick_pipelined(EditParams(exposure=v))
        # Any returned frame is a checksum-proven earlier render
        # (possibly None early in the burst) — device-resident u8.
        if frame is not None:
            assert np.asarray(frame).dtype == np.uint8
    last = eng.flush_pipeline()
    want = np.asarray(eng.preview_tick(EditParams(exposure=values[-1])))
    np.testing.assert_array_equal(np.asarray(last), want)
    # After a flush the syncer is idle; another flush is a no-op that
    # still returns the newest proven frame.
    np.testing.assert_array_equal(np.asarray(eng.flush_pipeline()), want)
    eng.close_pipeline()
    assert eng._pipe is None
    # A tick after close restarts the syncer transparently.
    eng.preview_tick_pipelined(EditParams(exposure=0.6))
    got = eng.flush_pipeline()
    want = np.asarray(eng.preview_tick(EditParams(exposure=0.6)))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_pipelined_session_ticks_and_fetches(tmp_path, rng):
    """The session path: sliders tick pipelined, and a fetch command
    (frame) flushes stragglers before producing the current frame."""
    eng, sess = _pipelined_session(tmp_path, rng, 2)
    for i in range(6):
        out = sess.set_slider("exposure", 0.1 * i)
        assert out["ok"]
    assert sess.stats()["latency"]["count"] == 6
    out = sess.frame(quality=80)
    assert out["ok"] and out["bytes"] > 0
    st = eng._pipe
    assert st is not None and st["synced_seq"] == st["seq"]  # flushed


def test_pipelined_extras_locals_curve_pipeline_too(tmp_path, rng):
    """extras/locals/curve-active params run through the jit cache,
    not the AOT executable — but since r5 they PIPELINE the same way
    (checksum dispatched, fetched by the syncer): a curve/mask drag
    costs the dispatch alone, not a transport round trip per tick.
    Flushed frames must be bit-identical to the true-sync render."""
    from raweditor_tpu.ops.curve import validate_points

    eng, _ = _pipelined_session(tmp_path, rng, 2)
    variants = [
        EditParams(sharpen=50.0),
        EditParams(point_curve=validate_points(
            [(0.0, 0.0), (0.5, 0.62), (1.0, 1.0)])),
    ]
    for p in variants:
        first = eng.preview_tick_pipelined(p, depth=2)
        assert eng._pipe is not None  # went through the syncer
        got = np.asarray(eng.flush_pipeline())
        want = np.asarray(eng.preview_tick(p))
        np.testing.assert_array_equal(got, want)
        eng.close_pipeline()


def test_quit_closes_pipeline(tmp_path, rng):
    """Session shutdown must retire the background syncer thread —
    a `quit` previously left it parked (with the last device frames
    referenced) until the engine was GC'd; only the `open`
    image-switch path closed it (advisor r4)."""
    import io

    eng, sess = _pipelined_session(tmp_path, rng, 2)
    out = io.StringIO()
    sess.repl(stdin=io.StringIO("set exposure 0.5\nquit\n"), stdout=out)
    assert eng._pipe is None
    # close() is idempotent and safe without an engine.
    sess.close()
    DevelopSession(None, None, None).close()


def test_pipeline_depth_validated():
    from raweditor_tpu.utils.config import Config

    with pytest.raises(ValueError):
        Config(session_pipeline_depth=-1).validate()
    with pytest.raises(ValueError):
        Config(session_pipeline_depth=9).validate()
    Config(session_pipeline_depth=2).validate()


def test_rate_from_develop_view(session):
    """`rate` stars/flags the current image in the catalog — the
    culling verb GUIs need from the develop view."""
    sess, lib, image_id = session
    out = sess.handle("rate")
    assert out == {"ok": True, "image_id": image_id,
                   "rating": 0, "flag": "none"}
    out = sess.handle("rate 4 pick")
    assert out["ok"] and out["rating"] == 4 and out["flag"] == "pick"
    assert lib.get_rating(image_id) == (4, "pick")
    out = sess.handle("rate reject")
    assert out["rating"] == 4 and out["flag"] == "reject"
    assert sess.handle("rate 9")["ok"] is False   # range via library
    assert sess.handle("rate banana")["ok"] is False
    # catalog-less sessions say so
    no_cat = DevelopSession(sess.engine, None, None)
    assert no_cat.handle("rate 3")["ok"] is False


def test_prefetch_makes_open_instant(tmp_path, rng, monkeypatch):
    """`prefetch <target>` decodes + uploads on a background thread;
    the following `open` consumes the ready engine instead of calling
    DevelopEngine.open again — and behaves identically."""
    import time

    paths = []
    for name in ("a.nef", "b.nef"):
        p = tmp_path / name
        write_synthetic_raw(
            p, rng.integers(0, 4096, size=(24, 32), dtype=np.uint16))
        paths.append(str(p))
    eng = DevelopEngine.open(paths[0])
    sess = DevelopSession(eng, None, None)
    calls = {"n": 0}
    real_open = DevelopEngine.open

    def counting_open(path, **kw):
        calls["n"] += 1
        return real_open(path, **kw)

    monkeypatch.setattr(DevelopEngine, "open", staticmethod(counting_open))
    out = sess.prefetch(paths[1])
    assert out["ok"] and out["pending"]
    # idempotent while pending/ready for the same path
    assert sess.prefetch(paths[1])["ok"]
    for _ in range(200):  # let the background decode finish
        slot = sess._prefetch
        if slot is not None and not slot[1].is_alive():
            break
        time.sleep(0.05)
    assert calls["n"] == 1  # one background build (second prefetch no-op)
    out = sess.open(paths[1])
    assert out["ok"] and out["path"] == paths[1]
    assert calls["n"] == 1  # open consumed the prefetched engine
    assert sess._prefetch is None
    # the consumed engine works end to end
    assert sess.set_slider("exposure", 0.4)["ok"]
    # a later open without prefetch decodes normally
    out = sess.open(paths[0])
    assert out["ok"] and calls["n"] == 2
    sess.close()


def test_prefetch_error_defers_to_open(tmp_path, rng):
    """A corrupt prefetch target records its error; `open` falls back
    to the synchronous path and reports the decode failure normally.
    A missing target errors immediately."""
    path = tmp_path / "junk.nef"
    path.write_bytes(b"not raw" * 64)
    good = tmp_path / "g.nef"
    write_synthetic_raw(
        good, rng.integers(0, 4096, size=(24, 32), dtype=np.uint16))
    sess = DevelopSession(DevelopEngine.open(str(good)), None, None)
    assert sess.prefetch(str(tmp_path / "nope.nef"))["ok"] is False
    out = sess.prefetch(str(path))
    assert out["ok"]
    out = sess.open(str(path))
    assert out["ok"] is False and "decode" in out["error"]
    # session stays on the previous image and keeps working
    assert sess.set_slider("exposure", 0.2)["ok"]
    sess.close()


def test_frame_latest_returns_proven_frame_without_flush(tmp_path, rng):
    """`frame <q> latest`: the newest checksum-proven pipelined frame,
    no flush, marked lagged — the GUI polling transport. Before any
    proof it falls back to the synchronous path (lagged false)."""
    eng, sess = _pipelined_session(tmp_path, rng, 2)
    out = sess.handle("frame 80 latest")
    assert out["ok"] and out["lagged"] is False  # nothing proven yet
    for i in range(5):
        sess.set_slider("exposure", 0.1 * i)
    eng.flush_pipeline()  # prove the tail so a frame exists
    sess.set_slider("exposure", 0.9)  # newest tick is now in flight
    out = sess.handle("frame 80 latest")
    assert out["ok"] and out["lagged"] is True
    assert out["bytes"] > 0
    st = eng._pipe
    # latest must NOT have flushed the in-flight tick itself (the
    # syncer may or may not have retired it yet; the command must not
    # block on it) — just assert the session still works after.
    assert sess.handle("frame 80")["ok"]  # sync path still fine
    sess.close()


def test_failed_tail_sync_errors_command_not_session(tmp_path, rng):
    """A transport drop surfaces as the fetch command's error (the
    syncer recorded it; flush re-raises RuntimeError) — the REPL must
    answer {"ok": false} and keep serving, like the TCP service."""
    eng, sess = _pipelined_session(tmp_path, rng, 2)
    sess.set_slider("exposure", 0.4)
    eng.flush_pipeline()
    st = eng._pipe
    with st["lock"]:
        st["error"] = RuntimeError("transport dropped")
    out = sess.handle("histogram")
    assert out["ok"] is False and "pipelined preview sync" in out["error"]
    # The error was consumed; the session keeps working.
    out = sess.set_slider("exposure", 0.5)
    assert out["ok"]
    assert sess.handle("histogram")["ok"]
    sess.close()


def test_pipeline_default_on(tmp_path, rng):
    """The latest-wins pipelined slider mode is the DEFAULT session
    path (VERDICT r4 item 3): a no-config session ticks through the
    background syncer, and --no-pipeline (depth 0) restores per-tick
    true sync."""
    from raweditor_tpu.utils.config import Config

    assert Config().session_pipeline_depth >= 1
    path = tmp_path / "d.nef"
    write_synthetic_raw(
        path, rng.integers(0, 4096, size=(24, 32), dtype=np.uint16))
    eng = DevelopEngine.open(path)
    sess = DevelopSession(eng, None, None)  # default config
    sess.set_slider("exposure", 0.4)
    assert eng._pipe is not None  # ticks went through the syncer
    sess.close()
    assert eng._pipe is None
    # The CLI escape hatch maps to depth 0 → true-sync, no syncer.
    import argparse

    from raweditor_tpu.cli.service import _session_config

    cfg = _session_config(argparse.Namespace(no_pipeline=True))
    assert cfg.session_pipeline_depth == 0
    eng2 = DevelopEngine.open(path)
    sess2 = DevelopSession(eng2, None, None, config=cfg)
    sess2.set_slider("exposure", 0.4)
    assert eng2._pipe is None


# -- white-balance eyedropper (engine.pick_wb + `wb` command) ------------

def _cast_nef(tmp_path, rng, r_scale=0.8, b_scale=1.15):
    """A flat mid-gray scene whose develop carries a known cast: the
    file's WB gains are (2, 1, 1.4) but the sensor values are scaled
    so the result is warm/cool shifted."""
    from raweditor_tpu.raw.synth import write_synthetic_raw

    h, w = 48, 64
    m = np.zeros((h, w), np.uint16)
    yy, xx = np.mgrid[0:h, 0:w]
    is_r = (yy % 2 == 0) & (xx % 2 == 0)
    is_b = (yy % 2 == 1) & (xx % 2 == 1)
    is_g = ~(is_r | is_b)
    white = 4095
    m[is_r] = int(0.25 * r_scale * white)
    m[is_g] = int(0.5 * white)
    m[is_b] = int(0.35 * b_scale * white)
    path = tmp_path / "cast.nef"
    write_synthetic_raw(path, m, wb_neutral=(0.5, 1.0, 1.0 / 1.4))
    return path


def test_pick_wb_neutralizes_patch(tmp_path, rng):
    from raweditor_tpu.params import EditParams as EP

    path = _cast_nef(tmp_path, rng)
    eng = DevelopEngine.open(path, mode="accurate",
                             demosaic_method="malvar", transfer="srgb")
    t, u = eng.pick_wb(0.5, 0.5)
    assert -1.0 <= t <= 1.0 and -1.0 <= u <= 1.0
    before = eng.preview(EP()).astype(int)[8:-8, 8:-8]
    after = eng.preview(EP(temperature=t, tint=u)).astype(int)[8:-8, 8:-8]
    gap = lambda img: (abs(img[..., 0] - img[..., 1]).mean()
                       + abs(img[..., 2] - img[..., 1]).mean())
    assert gap(before) > 5      # the cast exists
    assert gap(after) < gap(before) / 3  # and the pick removes most


def test_pick_wb_rejects_bad_patches(tmp_path, rng):
    from raweditor_tpu.raw.synth import write_synthetic_raw

    clipped = np.full((24, 32), 4095, np.uint16)
    p1 = tmp_path / "clip.nef"
    write_synthetic_raw(p1, clipped)
    eng = DevelopEngine.open(p1, mode="accurate")
    with pytest.raises(ValueError, match="clipped"):
        eng.pick_wb(0.5, 0.5)
    black = np.zeros((24, 32), np.uint16)
    p2 = tmp_path / "black.nef"
    write_synthetic_raw(p2, black)
    eng2 = DevelopEngine.open(p2, mode="accurate")
    with pytest.raises(ValueError, match="black"):
        eng2.pick_wb(0.5, 0.5)
    with pytest.raises(ValueError, match="0..1"):
        eng2.pick_wb(1.5, 0.5)


def test_wb_command_protocol(session):
    s, lib, image_id = session
    out = s.handle("wb 0.5 0.5")
    if out["ok"]:
        assert "temperature" in out and "tint" in out
        # persisted like any slider tick
        stored = lib.load_edit_params(image_id)
        assert float(stored.temperature) == pytest.approx(
            out["temperature"], abs=1e-3)
    else:
        # the random fixture's patch may be rejected (clipped/black) -
        # the protocol must answer with a usable error either way
        assert "error" in out
    assert not s.handle("wb 0.5")["ok"]   # usage error
    assert not s.handle("wb nan 0.5")["ok"]


def test_pipelined_sync_failure_surfaces_not_hangs(tmp_path, rng):
    """A transport error inside the background syncer must surface at
    the next flush as an error — the first implementation's thread
    died silently and flush_pipeline blocked forever (code-review r4)."""
    eng, _ = _pipelined_session(tmp_path, rng, 2)
    eng.preview_tick_pipelined(EditParams(exposure=0.2))
    eng.flush_pipeline()

    class _Poison:
        def __array__(self, *a, **k):
            raise RuntimeError("transport dropped")

    st = eng._pipe
    with st["lock"]:
        st["pending"] = (None, _Poison())
        st["seq"] += 1
        st["wake"].notify_all()
    with pytest.raises(RuntimeError, match="pipelined preview sync"):
        eng.flush_pipeline()
    # the syncer survives: later ticks and flushes work again
    eng.preview_tick_pipelined(EditParams(exposure=0.4))
    assert eng.flush_pipeline() is not None
    eng.close_pipeline()


def test_open_closes_previous_pipeline(tmp_path, rng):
    """Image switches must retire the outgoing engine's syncer thread
    (a long serve session would otherwise leak one per open)."""
    eng, sess = _pipelined_session(tmp_path, rng, 2)
    sess.set_slider("exposure", 0.5)
    assert eng._pipe is not None
    other = tmp_path / "other.nef"
    write_synthetic_raw(
        other, rng.integers(0, 4096, size=(24, 32), dtype=np.uint16))
    out = sess.open(str(other))
    assert out["ok"]
    assert eng._pipe is None  # old engine's syncer stopped
    assert sess.engine is not eng


def test_recovery_only_params_stay_on_hot_paths(tmp_path, rng):
    """highlight_recovery is NOT a finish extra: recovery-only params
    must keep the AOT + pipelined hot paths (code-review r4 — the
    _EXTRA_FIELDS membership had kicked them onto true-sync)."""
    p = EditParams(highlight_recovery=50.0)
    assert not p.has_finish_extras()
    assert p.finish_extras_mode() is False
    eng, _ = _pipelined_session(tmp_path, rng, 2)
    first = eng.preview_tick_pipelined(p)
    assert first is None  # pipelined path taken (extras would return
    # a finished frame immediately via the true-sync fallback)
    eng.flush_pipeline()
    eng.close_pipeline()
