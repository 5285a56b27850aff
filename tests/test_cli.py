"""CLI smoke tests (in-process main() for speed; JAX stays on the CPU
test backend)."""

import json

import numpy as np
import pytest
from PIL import Image

from raweditor_tpu.cli import main
from raweditor_tpu.raw.synth import write_synthetic_raw


@pytest.fixture
def photos(tmp_path, rng):
    d = tmp_path / "photos"
    d.mkdir()
    for i in range(2):
        write_synthetic_raw(
            d / f"s{i}.nef",
            rng.integers(0, 4096, size=(24, 32), dtype=np.uint16),
        )
    return d


def run(capsys, *argv):
    code = main([str(a) for a in argv])
    out = capsys.readouterr().out
    return code, out


def test_synth_info(tmp_path, capsys):
    path = tmp_path / "x.dng"
    code, _ = run(capsys, "synth", path, "--width", 48, "--height", 32)
    assert code == 0 and path.exists()
    code, out = run(capsys, "info", path)
    meta = json.loads(out)
    assert meta["width"] == 48 and meta["height"] == 32
    assert meta["cfa_pattern"] == "RGGB"


def test_import_list_edit_export(tmp_path, capsys, photos):
    db = tmp_path / "cat.db"
    code, out = run(capsys, "--db", db, "import", photos,
                    "--cache-dir", tmp_path / "cache")
    assert code == 0
    stats = json.loads(out)
    assert stats["imported"] == 2 and stats["cached"] == 2

    code, out = run(capsys, "--db", db, "list")
    assert code == 0
    assert "s0.nef" in out and "cached" in out

    code, out = run(capsys, "--db", db, "edit", "1", "--exposure", "1.5")
    assert code == 0
    assert json.loads(out)["exposure"] == 1.5

    code, out = run(capsys, "--db", db, "export",
                    "-o", tmp_path / "out", "--ext", "png",
                    "--batch-size", "2")
    assert code == 0
    report = json.loads(out)
    assert report["succeeded"] == 2
    assert (tmp_path / "out" / "s0.png").exists()


def test_export_catalog_applies_slider_overrides(tmp_path, capsys,
                                                 photos):
    """CLI sliders on catalog exports compose over each image's stored
    edits instead of being silently dropped (code-review r3). PNG is
    lossless, so an effective override changes the bytes."""
    db = tmp_path / "cat.db"
    run(capsys, "--db", db, "import", photos, "--no-tiers")
    code, _ = run(capsys, "--db", db, "export", "-o", tmp_path / "a",
                  "--ext", "png", "--ids", "1")
    assert code == 0
    code, _ = run(capsys, "--db", db, "export", "-o", tmp_path / "b",
                  "--ext", "png", "--ids", "1", "--exposure", "2.0")
    assert code == 0
    assert (tmp_path / "a" / "s0.png").read_bytes() != \
        (tmp_path / "b" / "s0.png").read_bytes()


def test_develop_file_and_catalog_id(tmp_path, capsys, photos):
    db = tmp_path / "cat.db"
    run(capsys, "--db", db, "import", photos, "--no-tiers")
    run(capsys, "--db", db, "edit", "1", "--exposure", "2.0")

    out_a = tmp_path / "direct.png"
    code, _ = run(capsys, "develop", photos / "s0.nef", "-o", out_a,
                  "--exposure", "2.0")
    assert code == 0

    # Catalog id resolves the stored edits; same file, same params →
    # identical pixels.
    with open(db, "rb"):
        pass
    import sqlite3

    with sqlite3.connect(db) as conn:
        path_of_1 = conn.execute(
            "SELECT path FROM images WHERE id = 1"
        ).fetchone()[0]
    out_b = tmp_path / "via_id.png"
    code, _ = run(capsys, "--db", db, "develop", "1", "-o", out_b)
    assert code == 0
    if path_of_1.endswith("s0.nef"):
        a = np.asarray(Image.open(out_a))
        b = np.asarray(Image.open(out_b))
        assert (a == b).all()


def test_develop_preview_zoom(tmp_path, capsys, photos):
    out = tmp_path / "prev.png"
    code, _ = run(capsys, "develop", photos / "s0.nef", "-o", out,
                  "--preview", "--zoom", "2.0")
    assert code == 0
    with Image.open(out) as im:
        assert im.size == (32, 24)


def test_histogram_command(tmp_path, capsys, photos):
    code, out = run(capsys, "histogram", photos / "s0.nef")
    assert code == 0
    hist = json.loads(out)
    assert len(hist["r"]) == 256


def test_edit_reset(tmp_path, capsys, photos):
    db = tmp_path / "cat.db"
    run(capsys, "--db", db, "import", photos, "--no-tiers")
    run(capsys, "--db", db, "edit", "1", "--contrast", "5")
    code, out = run(capsys, "--db", db, "edit", "1", "--reset")
    assert code == 0 and json.loads(out)["reset"]


def test_export_failure_exit_code(tmp_path, capsys):
    code, out = run(capsys, "export", "-o", tmp_path / "out",
                    "--files", tmp_path / "nope.nef")
    assert code == 1
    assert json.loads(out)["failed"] == 1


def test_export_auto_brightens_dark_image(tmp_path, capsys, rng):
    """export --auto: the per-image measurement pass must lift a dark
    scene (auto-exposure targets the highlight percentile); composition
    matches the `auto` subcommand's suggest_auto-on-top-of-params."""
    import numpy as np
    from PIL import Image

    from raweditor_tpu.raw.synth import write_synthetic_raw

    dark = tmp_path / "dark.nef"
    write_synthetic_raw(
        dark, rng.integers(0, 300, size=(48, 64), dtype=np.uint16),
        compression="nikon")
    code, _ = run(capsys, "export", "-o", tmp_path / "plain",
                  "--files", dark, "--decode-threads", "1")
    assert code == 0
    code, _ = run(capsys, "export", "-o", tmp_path / "auto",
                  "--files", dark, "--decode-threads", "1",
                  "--auto", "--auto-levels")
    assert code == 0
    plain = np.asarray(Image.open(tmp_path / "plain" / "dark.jpg"))
    boosted = np.asarray(Image.open(tmp_path / "auto" / "dark.jpg"))
    assert boosted.mean() > plain.mean() + 10


def test_export_auto_extras_require_auto(tmp_path, capsys, photos):
    """--auto-levels/-contrast/-tone refine the --auto pass; alone they
    must error rather than silently enabling full auto (help text says
    'with --auto')."""
    import pytest

    with pytest.raises(SystemExit, match="--auto"):
        run(capsys, "export", "-o", tmp_path / "x",
            "--files", photos / "s0.nef", "--auto-levels")


def test_histogram_ascii(tmp_path, capsys, photos):
    code, out = run(capsys, "histogram", photos / "s0.nef", "--ascii")
    assert code == 0
    assert "R:" in out and "G:" in out and "B:" in out and "255" in out


def test_develop_fast_kernel(tmp_path, capsys, photos):
    out = tmp_path / "fast.png"
    code, _ = run(capsys, "develop", photos / "s0.nef", "-o", out, "--fast",
                  "--exposure", "0.5")
    assert code == 0 and out.exists()


def test_session_path_with_db_attaches(tmp_path, photos, monkeypatch):
    """`session <path> --db` auto-imports/attaches so checkpoint/undo
    persist (observed live: they reported 'no catalog attached')."""
    import io
    import sys

    from raweditor_tpu.cli import cmd_session

    class A:
        input = str(photos / "s0.nef")
        db = str(tmp_path / "cat.db")
        mode = "parity"
        fast = False

    stdin = io.StringIO("set exposure 1.0\ncheckpoint\nhistory\nquit\n")
    monkeypatch.setattr(sys, "stdin", stdin)
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    assert cmd_session(A()) == 0
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    assert lines[1]["ok"] and lines[1]["checkpoints"] == 1
    assert lines[2]["ok"] and len(lines[2]["history"]) == 1
    # Re-running attaches to the same catalog row (no duplicate import).
    import sqlite3

    with sqlite3.connect(tmp_path / "cat.db") as conn:
        n = conn.execute("SELECT COUNT(*) FROM images").fetchone()[0]
    assert n == 1


def test_auto_command(tmp_path, capsys, rng):
    """`auto <id>` stores histogram-driven suggestions in the catalog."""
    d = tmp_path / "p"
    d.mkdir()
    dark = rng.integers(0, 200, size=(32, 32), dtype=np.uint16)
    write_synthetic_raw(d / "dark.nef", dark)
    db = tmp_path / "cat.db"
    run(capsys, "--db", db, "import", d, "--no-tiers")

    code, out = run(capsys, "--db", db, "auto", "1", "--dry-run")
    assert code == 0
    assert json.loads(out)["exposure"] > 1.0

    # Dry run must not persist.
    import sqlite3

    with sqlite3.connect(db) as conn:
        assert conn.execute("SELECT COUNT(*) FROM edits").fetchone()[0] == 0

    code, out = run(capsys, "--db", db, "auto", "1")
    assert code == 0
    with sqlite3.connect(db) as conn:
        assert conn.execute("SELECT COUNT(*) FROM edits").fetchone()[0] == 1


def test_warmup_command(capsys):
    from raweditor_tpu.cli import main

    rc = main(["warmup", "--width", "64", "--height", "48"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["width"] == 64
    names = [c["program"] for c in out["compiled"]]
    assert "develop_rgba" in names and "develop_preview" in names


def test_histogram_zoom_pan_flags(tmp_path, rng, capsys):
    from raweditor_tpu.cli import main
    from raweditor_tpu.raw.synth import write_synthetic_raw

    path = tmp_path / "h.dng"
    # Left half dark, right half bright: panning changes the histogram.
    mosaic = np.zeros((48, 64), np.uint16)
    mosaic[:, 32:] = 4000
    write_synthetic_raw(path, mosaic)
    main(["histogram", str(path), "--zoom", "2"])
    left = json.loads(capsys.readouterr().out.strip())
    main(["histogram", str(path), "--zoom", "2", "--pan-x", "0.5"])
    right = json.loads(capsys.readouterr().out.strip())
    assert left != right


def test_export_min_rating_filter(tmp_path, rng, capsys):
    from raweditor_tpu.catalog import Library
    from raweditor_tpu.cli import main
    from raweditor_tpu.raw.synth import write_synthetic_raw

    for i in range(3):
        write_synthetic_raw(
            tmp_path / f"e{i}.nef",
            rng.integers(0, 4096, size=(16, 24), dtype=np.uint16))
    db = str(tmp_path / "cat.db")
    main(["--db", db, "import", str(tmp_path), "--no-tiers"])
    capsys.readouterr()
    with Library(db) as lib:
        ids = [img.id for img in lib.get_all_images()]
        lib.set_rating(ids[0], rating=5)
    out_dir = tmp_path / "out"
    rc = main(["--db", db, "export", "-o", str(out_dir),
               "--ext", "png", "--min-rating", "3"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip())
    assert report["succeeded"] == 1
    assert len(list(out_dir.glob("*.png"))) == 1


def test_list_json_output(tmp_path, rng, capsys):
    from raweditor_tpu.cli import main
    from raweditor_tpu.raw.synth import write_synthetic_raw

    write_synthetic_raw(
        tmp_path / "j.nef",
        rng.integers(0, 4096, size=(16, 24), dtype=np.uint16))
    db = str(tmp_path / "cat.db")
    main(["--db", db, "import", str(tmp_path), "--no-tiers"])
    capsys.readouterr()
    main(["--db", db, "list", "--json"])
    rows = [json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()]
    assert rows and rows[0]["filename"] == "j.nef"
    assert rows[0]["rating"] == 0 and rows[0]["flag"] == "none"


def test_info_save_preview(tmp_path, rng, capsys):
    import io

    from PIL import Image

    from raweditor_tpu.cli import main
    from raweditor_tpu.raw.synth import write_synthetic_raw

    buf = io.BytesIO()
    Image.new("RGB", (32, 24), (90, 60, 30)).save(buf, format="JPEG")
    path = tmp_path / "p.nef"
    write_synthetic_raw(
        path, rng.integers(0, 4096, size=(16, 24), dtype=np.uint16),
        preview_jpeg=buf.getvalue())
    out = tmp_path / "prev.jpg"
    rc = main(["info", str(path), "--save-preview", str(out)])
    assert rc == 0
    assert Image.open(out).size == (32, 24)


def test_cli_reference_doc_current():
    """docs/cli.md must match the current parser — regenerate with
    raweditor_tpu.cli.generate_cli_reference() when flags change."""
    import pathlib

    from raweditor_tpu.cli import generate_cli_reference

    doc = pathlib.Path(__file__).parent.parent / "docs" / "cli.md"
    assert doc.read_text() == generate_cli_reference(), (
        "docs/cli.md is stale; regenerate via "
        "python -c 'from raweditor_tpu.cli import generate_cli_reference;"
        " open(\"docs/cli.md\",\"w\").write(generate_cli_reference())'"
    )


def test_verify_command(tmp_path, rng, capsys):
    from raweditor_tpu.cli import main
    from raweditor_tpu.raw.synth import write_synthetic_raw

    path = tmp_path / "v.nef"
    write_synthetic_raw(
        path, rng.integers(0, 4096, size=(16, 24), dtype=np.uint16))
    db = str(tmp_path / "cat.db")
    main(["--db", db, "import", str(tmp_path), "--no-tiers"])
    capsys.readouterr()
    path.unlink()  # simulate the RAW disappearing
    main(["--db", db, "verify"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["tombstoned"] == 1 and out["images"] == 1


def test_edit_query_mode(tmp_path, rng, capsys):
    """'edit <id>' with no slider flags prints stored params without
    writing a new edits row."""
    from raweditor_tpu.catalog import Library
    from raweditor_tpu.cli import main
    from raweditor_tpu.raw.synth import write_synthetic_raw

    write_synthetic_raw(
        tmp_path / "q.nef",
        rng.integers(0, 4096, size=(16, 24), dtype=np.uint16))
    db = str(tmp_path / "cat.db")
    main(["--db", db, "import", str(tmp_path), "--no-tiers"])
    capsys.readouterr()
    main(["--db", db, "edit", "1", "--exposure", "0.7"])
    capsys.readouterr()
    main(["--db", db, "edit", "1"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["exposure"] == 0.7
    with Library(db) as lib:
        assert len(lib.edit_history(1)) == 1  # query didn't write


def test_histogram_accepts_catalog_id(tmp_path, rng, capsys):
    from raweditor_tpu.cli import main
    from raweditor_tpu.raw.synth import write_synthetic_raw

    write_synthetic_raw(
        tmp_path / "h2.nef",
        rng.integers(0, 4096, size=(16, 24), dtype=np.uint16))
    db = str(tmp_path / "cat.db")
    main(["--db", db, "import", str(tmp_path), "--no-tiers"])
    capsys.readouterr()
    rc = main(["--db", db, "histogram", "1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert len(out["r"]) == 256


def test_doctor_healthy(tmp_path, capsys, photos):
    """doctor: JSON report with every core check; native + backend ok
    on the test box; xlat warn (no tables here) keeps exit code 0."""
    db = str(tmp_path / "cat.db")
    main(["--db", db, "import", str(photos), "--no-tiers"])
    capsys.readouterr()
    code, out = run(capsys, "--db", db, "doctor", "--probe")
    assert code == 0
    rep = json.loads(out.strip())
    by = {c["check"]: c for c in rep["checks"]}
    assert by["native"]["status"] == "ok"
    assert by["jpeg_simd"]["status"] == "ok"
    assert by["backend"]["status"] == "ok"
    assert by["catalog"]["status"] == "ok" and "2 images" in \
        by["catalog"]["detail"]
    assert by["nikon_xlat"]["status"] == "warn"
    assert "round trip" in by["probe"]["detail"]
    assert rep["status"] == "warn"


def test_doctor_malloc_arena_check(capsys, monkeypatch):
    """Long export runs retain RSS via default glibc arenas
    (docs/bench_r04_session1/4.json). The exporter now caps arenas
    in-process (utils/memory.py), so doctor reports ok unless that is
    disabled AND MALLOC_ARENA_MAX is unset."""
    monkeypatch.delenv("MALLOC_ARENA_MAX", raising=False)
    monkeypatch.delenv("RAWEDITOR_TPU_MALLOC_ARENA_CAP", raising=False)
    _, out = run(capsys, "doctor")
    by = {c["check"]: c for c in json.loads(out.strip())["checks"]}
    # glibc in CI: the in-process cap is available and on by default.
    assert by["malloc_arenas"]["status"] == "ok"
    assert "in-process" in by["malloc_arenas"]["detail"]
    monkeypatch.setenv("RAWEDITOR_TPU_MALLOC_ARENA_CAP", "0")
    _, out = run(capsys, "doctor")
    by = {c["check"]: c for c in json.loads(out.strip())["checks"]}
    assert by["malloc_arenas"]["status"] == "warn"
    monkeypatch.setenv("MALLOC_ARENA_MAX", "1")
    _, out = run(capsys, "doctor")
    by = {c["check"]: c for c in json.loads(out.strip())["checks"]}
    assert by["malloc_arenas"]["status"] == "ok"


def test_doctor_stale_native_fails(capsys, monkeypatch):
    """A loaded extension missing current bindings must be a hard fail
    (exit 1) — the committed-.so-went-stale case."""
    class _Stale:
        scan_jpeg_spans = staticmethod(lambda b: [])

    import raweditor_tpu.cli as cli_mod
    import raweditor_tpu.native as nat

    monkeypatch.setattr(nat, "get_rawkit", lambda: _Stale())
    code, out = run(capsys, "doctor")
    rep = json.loads(out.strip())
    by = {c["check"]: c for c in rep["checks"]}
    assert code == 1 and rep["status"] == "fail"
    assert by["native"]["status"] == "fail"
    assert "decode_ljpeg" in by["native"]["detail"]


class TestCliReviewRegressions:
    def test_empty_files_list_errors(self, tmp_path):
        from raweditor_tpu.cli import main

        with pytest.raises(SystemExit):
            main(["export", "-o", str(tmp_path / "o"), "--files"])

    def test_files_stem_collision_disambiguated(self, tmp_path, rng):
        from raweditor_tpu.cli import main
        from raweditor_tpu.raw.synth import write_synthetic_raw

        a = tmp_path / "a"
        b = tmp_path / "b"
        a.mkdir(), b.mkdir()
        for d in (a, b):
            write_synthetic_raw(
                str(d / "IMG.dng"),
                rng.integers(0, 4095, (64, 96)).astype(np.uint16))
        out = tmp_path / "out"
        assert main(["export", "-o", str(out), "--ext", "png",
                     "--files", str(a / "IMG.dng"),
                     str(b / "IMG.dng")]) == 0
        assert len(list(out.glob("*.png"))) == 2  # no clobber

    def test_preview_rejects_export_only_flags(self, tmp_path, rng):
        from raweditor_tpu.cli import main
        from raweditor_tpu.raw.synth import write_synthetic_raw

        raw = tmp_path / "p.dng"
        write_synthetic_raw(
            str(raw), rng.integers(0, 4095, (64, 96)).astype(np.uint16))
        with pytest.raises(SystemExit):
            main(["develop", str(raw), "-o", str(tmp_path / "x.png"),
                  "--preview", "--rotate", "5"])
        with pytest.raises(SystemExit):
            main(["develop", str(raw), "-o", str(tmp_path / "x.png"),
                  "--zoom", "2"])  # zoom without --preview

    def test_corrupt_input_is_usage_error(self, tmp_path):
        from raweditor_tpu.cli import main

        bad = tmp_path / "bad.nef"
        bad.write_bytes(b"II*\0garbage")
        with pytest.raises(SystemExit):
            main(["develop", str(bad), "-o", str(tmp_path / "x.jpg")])

    def test_rate_query_missing_id_errors(self, tmp_path):
        from raweditor_tpu.cli import main

        with pytest.raises(SystemExit):
            main(["--db", str(tmp_path / "c.db"), "rate", "424242"])

    def test_histogram_width_validated(self):
        from raweditor_tpu.cli import render_ascii_histogram

        with pytest.raises(ValueError):
            render_ascii_histogram(np.zeros((3, 256)), width=60)

    def test_native_symbol_list_is_shared(self):
        from raweditor_tpu.native import REQUIRED_EXPORTS

        assert "encode_jpeg_420" in REQUIRED_EXPORTS
        assert "decode_radc" in REQUIRED_EXPORTS


def test_export_env_config_overrides_reach_export(tmp_path, capsys,
                                                  photos, monkeypatch):
    """RAWEDITOR_TPU_<FIELD> env overrides must reach the CLI export —
    they were silently ignored behind hardcoded argparse defaults
    (code-review r3). Explicit flags still win over the environment."""
    import raweditor_tpu.pipeline.export as ex

    captured = {}
    real = ex.run_batch_export

    def spy(jobs, **kw):
        captured.update(kw)
        return real(jobs, **kw)

    monkeypatch.setattr(ex, "run_batch_export", spy)
    monkeypatch.setenv("RAWEDITOR_TPU_BATCH_SIZE", "3")
    monkeypatch.setenv("RAWEDITOR_TPU_DECODE_THREADS", "2")
    monkeypatch.setenv("RAWEDITOR_TPU_ENCODE_THREADS", "2")
    monkeypatch.setenv("RAWEDITOR_TPU_JPEG_QUALITY", "77")
    monkeypatch.setenv("RAWEDITOR_TPU_MODE", "accurate")
    monkeypatch.setenv("RAWEDITOR_TPU_USE_PALLAS_KERNEL", "1")
    code, _ = run(capsys, "export", "--files", photos / "s0.nef",
                  "-o", tmp_path / "out")
    assert code == 0
    assert captured["batch_size"] == 3
    assert captured["decode_threads"] == 2
    assert captured["encode_threads"] == 2
    assert captured["quality"] == 77
    assert captured["mode"] == "accurate"
    assert captured["use_pallas"] is True
    captured.clear()
    code, _ = run(capsys, "export", "--files", photos / "s0.nef",
                  "-o", tmp_path / "out2", "--batch-size", "1",
                  "--quality", "90")
    assert code == 0
    assert captured["batch_size"] == 1
    assert captured["quality"] == 90


def test_tier_widths_env_config(tmp_path, photos, monkeypatch):
    """RAWEDITOR_TPU_TIER_* env config resizes newly generated tiers
    (stored cache paths keep their widths; code-review r3)."""
    from PIL import Image

    from raweditor_tpu.pipeline.tiers import generate_tiers

    monkeypatch.setenv("RAWEDITOR_TPU_TIER_THUMB", "64")
    monkeypatch.setenv("RAWEDITOR_TPU_TIER_INSTANT", "96")
    monkeypatch.setenv("RAWEDITOR_TPU_TIER_WORKING", "128")
    thumb, instant, working = generate_tiers(
        str(photos / "s0.nef"), 1, cache_dir=tmp_path)
    for path, w in ((thumb, 64), (instant, 96), (working, 128)):
        with Image.open(path) as im:
            assert im.width == w
