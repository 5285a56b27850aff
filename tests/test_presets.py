"""Develop presets (raweditor_tpu/presets.py) — named sparse
EditParams bundles, beyond the reference."""

import json

import numpy as np
import pytest

from raweditor_tpu.params import EditParams


@pytest.fixture(autouse=True)
def _preset_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("RAWEDITOR_TPU_PRESETS_DIR",
                       str(tmp_path / "presets"))
    yield


class TestStore:
    def test_round_trip_sparse(self):
        from raweditor_tpu import presets

        p = EditParams(exposure=0.4, sharpen=55.0)
        path = presets.save_preset("warm", p)
        data = json.loads(open(path).read())
        assert data == {"exposure": 0.4, "sharpen": 55.0}  # sparse
        assert presets.load_preset("warm") == data
        assert presets.list_presets() == ["warm"]
        presets.delete_preset("warm")
        assert presets.list_presets() == []

    def test_sparse_compose(self):
        from raweditor_tpu import presets

        presets.save_preset("look", EditParams(contrast=20.0))
        base = EditParams(exposure=1.0, contrast=-5.0)
        out = presets.apply_preset(base, "look")
        # Preset fields replace; unmentioned fields survive.
        assert out.contrast == 20.0 and out.exposure == 1.0

    def test_empty_preset_rejected(self):
        from raweditor_tpu import presets

        with pytest.raises(ValueError):
            presets.save_preset("noop", EditParams())

    def test_bad_names_rejected(self):
        from raweditor_tpu import presets

        for name in ("../evil", ".hidden", "a/b", "", "x" * 80):
            with pytest.raises(ValueError):
                presets.save_preset(name, EditParams(exposure=1.0))

    def test_unknown_field_rejected(self, tmp_path):
        from raweditor_tpu import presets

        d = presets.presets_dir()
        d.mkdir(parents=True, exist_ok=True)
        (d / "bad.json").write_text('{"bogus": 1.0}')
        with pytest.raises(ValueError):
            presets.load_preset("bad")

    def test_missing_is_keyerror(self):
        from raweditor_tpu import presets

        with pytest.raises(KeyError):
            presets.load_preset("nope")
        with pytest.raises(KeyError):
            presets.delete_preset("nope")


class TestIntegration:
    @pytest.fixture
    def raw_path(self, tmp_path, rng):
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "p.dng"
        write_synthetic_raw(
            str(path), rng.integers(0, 4095, (64, 96)).astype(np.uint16))
        return str(path)

    def test_cli_save_show_develop(self, raw_path, tmp_path, capsys):
        from PIL import Image

        from raweditor_tpu.cli import main

        assert main(["preset", "save", "warm", "--temperature", "0.2",
                     "--sharpen", "40"]) == 0
        assert main(["preset", "show", "warm"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out == {"sharpen": 40.0, "temperature": 0.2}
        a = tmp_path / "a.png"
        b = tmp_path / "b.png"
        c = tmp_path / "c.png"
        assert main(["develop", raw_path, "-o", str(a),
                     "--preset", "warm"]) == 0
        # Explicit flag overrides the preset field.
        assert main(["develop", raw_path, "-o", str(b),
                     "--preset", "warm", "--sharpen", "0"]) == 0
        assert main(["develop", raw_path, "-o", str(c)]) == 0
        ia, ib, ic = (np.asarray(Image.open(x)) for x in (a, b, c))
        assert (ia != ic).any() and (ia != ib).any()

    def test_cli_missing_preset_usage_error(self, raw_path, tmp_path):
        from raweditor_tpu.cli import main

        with pytest.raises(SystemExit):
            main(["develop", raw_path, "-o", str(tmp_path / "x.png"),
                  "--preset", "nope"])

    def test_session_preset(self, raw_path):
        from raweditor_tpu import presets
        from raweditor_tpu.pipeline.session import DevelopSession

        presets.save_preset("punch", EditParams(clarity=30.0,
                                                contrast=10.0))
        from raweditor_tpu.pipeline.engine import DevelopEngine

        s = DevelopSession(DevelopEngine.open(raw_path))
        r = s.handle("preset list")
        assert r["ok"] and r["presets"] == ["punch"]
        r = s.handle("preset punch")
        assert r["ok"] and r["params"]["contrast"] == 10.0
        assert float(s.params.clarity) == 30.0
        r = s.handle("preset nope")
        assert not r["ok"]

    def test_export_with_preset(self, raw_path, tmp_path):
        from PIL import Image

        from raweditor_tpu import presets
        from raweditor_tpu.cli import main

        presets.save_preset("pop", EditParams(saturation=30.0))
        out = tmp_path / "exp"
        assert main(["export", "-o", str(out), "--files", raw_path,
                     "--ext", "png", "--preset", "pop"]) == 0
        plain = tmp_path / "plain"
        assert main(["export", "-o", str(plain), "--files", raw_path,
                     "--ext", "png"]) == 0
        a = np.asarray(Image.open(next(out.glob("*.png"))))
        b = np.asarray(Image.open(next(plain.glob("*.png"))))
        assert (a != b).any()


class TestReviewRegressions:
    def test_nan_and_nonnumeric_rejected(self):
        from raweditor_tpu import presets

        d = presets.presets_dir()
        d.mkdir(parents=True, exist_ok=True)
        (d / "nan.json").write_text('{"exposure": NaN}')
        (d / "lst.json").write_text('{"exposure": [1, 2]}')
        (d / "nul.json").write_text('{"exposure": null}')
        (d / "boo.json").write_text('{"exposure": true}')
        for name in ("nan", "lst", "nul", "boo"):
            with pytest.raises(ValueError):
                presets.load_preset(name)

    def test_session_preset_arity(self, tmp_path, rng):
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.pipeline.session import DevelopSession
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "a.dng"
        write_synthetic_raw(
            str(path), rng.integers(0, 4095, (64, 96)).astype(np.uint16))
        s = DevelopSession(DevelopEngine.open(str(path)))
        r = s.handle("preset warm extra")
        assert not r["ok"] and "usage" in r["error"]

    def test_mesh_extras_matches_solo_with_clarity(self, tmp_path, rng):
        """The mesh words-form extras must compose clarity EXACTLY
        like the mesh-less route (separate requantizing pass), so
        mesh-vs-solo stays byte-equal on the CPU backend even with
        clarity active (code-review r3: the inline-clarity form
        diverged by 1 LSB)."""
        from PIL import Image

        from raweditor_tpu.parallel.mesh import batch_row_mesh
        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )
        from raweditor_tpu.raw.synth import write_synthetic_raw

        raw = tmp_path / "m.dng"
        yy, xx = np.mgrid[0:64, 0:96]
        write_synthetic_raw(
            str(raw),
            (700 + 1400 * np.sin(xx / 4.0) ** 2).astype(np.uint16))
        p = EditParams(clarity=60.0, sharpen=50.0)
        solo = tmp_path / "solo.png"
        rep = run_batch_export([ExportJob(str(raw), str(solo), p)],
                               batch_size=1)
        assert rep.succeeded == 1
        mesh = batch_row_mesh(8, row=4)
        meshed = tmp_path / "mesh.png"
        rep = run_batch_export([ExportJob(str(raw), str(meshed), p)],
                               mesh=mesh, batch_size=1)
        assert rep.succeeded == 1
        a = np.asarray(Image.open(solo))
        b = np.asarray(Image.open(meshed))
        assert (a == b).all()

    def test_mesh_extras_linear_and_xtrans(self, tmp_path, rng):
        """Linear-DNG and X-Trans mesh buckets use the words-form
        extras too (they were left in-chain when the mesh-less route
        switched; code-review r3)."""
        from PIL import Image

        from raweditor_tpu.parallel.mesh import batch_row_mesh
        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )
        from raweditor_tpu.raw.synth import (
            write_synthetic_linear_dng,
        )

        raw = tmp_path / "lin.dng"
        rgb = rng.integers(0, 4095, (64, 96, 3)).astype(np.uint16)
        write_synthetic_linear_dng(str(raw), rgb)
        p = EditParams(sharpen=70.0)
        solo = tmp_path / "lsolo.png"
        rep = run_batch_export([ExportJob(str(raw), str(solo), p)],
                               batch_size=1, mode="accurate")
        assert rep.succeeded == 1, rep.failed
        mesh = batch_row_mesh(8, row=2)
        meshed = tmp_path / "lmesh.png"
        rep = run_batch_export([ExportJob(str(raw), str(meshed), p)],
                               mesh=mesh, batch_size=1, mode="accurate")
        assert rep.succeeded == 1, rep.failed
        a = np.asarray(Image.open(solo))
        b = np.asarray(Image.open(meshed))
        assert (a == b).all()


def test_mesh_indivisible_height_routes_gspmd(tmp_path, rng):
    """A camera height the row shards can't divide must develop via
    the GSPMD route, not quarantine the whole run (code-review r3)."""
    from raweditor_tpu.parallel.mesh import batch_row_mesh
    from raweditor_tpu.pipeline.export import ExportJob, run_batch_export
    from raweditor_tpu.raw.synth import write_synthetic_raw

    raw = tmp_path / "odd.dng"
    # H=60: 60 % (2*4) = 4 — indivisible by the row=4 mesh.
    write_synthetic_raw(
        str(raw), rng.integers(0, 4095, (60, 96)).astype(np.uint16))
    mesh = batch_row_mesh(8, row=4)
    rep = run_batch_export(
        [ExportJob(str(raw), str(tmp_path / "o.png"))],
        mesh=mesh, batch_size=1)
    assert rep.succeeded == 1 and not rep.failed, rep.failed


class TestSessionReviewRegressions:
    def test_checkpoint_survives_process_restart(self, tmp_path, rng):
        """A new DevelopSession on a catalog image must not overwrite
        the previous session's checkpoint row on its first tick
        (code-review r3: the constructor left _frozen=False)."""
        from raweditor_tpu.catalog import Library
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.pipeline.session import DevelopSession
        from raweditor_tpu.raw.synth import write_synthetic_raw

        raw = tmp_path / "c.dng"
        write_synthetic_raw(
            str(raw), rng.integers(0, 4095, (64, 96)).astype(np.uint16))
        lib = Library(str(tmp_path / "cat.db"))
        img_id = lib.import_image(str(raw), "c.dng")

        s1 = DevelopSession(DevelopEngine.open(str(raw)), lib, img_id)
        s1.handle("set exposure 1.0")
        s1.handle("checkpoint")
        # "process restart": a fresh session object on the same image.
        s2 = DevelopSession(DevelopEngine.open(str(raw)), lib, img_id)
        s2.handle("set exposure 2.0")
        hist = s2.history()["history"]
        assert len(hist) >= 2  # the checkpoint row survived
        lib.close()

    def test_reserved_name_and_list_filtering(self, tmp_path):
        from raweditor_tpu import presets

        with pytest.raises(ValueError):
            presets.save_preset("list", EditParams(exposure=1.0))
        d = presets.presets_dir()
        d.mkdir(parents=True, exist_ok=True)
        (d / "My Look.json").write_text("{}")      # invalid name
        (d / "sub.json").mkdir()                    # directory
        presets.save_preset("ok", EditParams(exposure=1.0))
        assert presets.list_presets() == ["ok"]

    def test_unreadable_preset_is_valueerror(self, tmp_path):
        from raweditor_tpu import presets

        d = presets.presets_dir()
        d.mkdir(parents=True, exist_ok=True)
        (d / "dirpreset.json").mkdir()
        with pytest.raises(ValueError):
            presets.load_preset("dirpreset")

    def test_serve_preset_list_without_image(self, tmp_path):
        import socket

        from raweditor_tpu import presets
        from raweditor_tpu.pipeline.serve import DevelopServer

        presets.save_preset("tcp-look", EditParams(contrast=5.0))
        srv = DevelopServer()
        srv.serve_background()
        host, port = srv.address
        with socket.create_connection((host, port), timeout=10) as s:
            f = s.makefile("rwb")
            greeting = json.loads(f.readline())
            assert "preset" in greeting["commands"]
            f.write(b"preset list\n")
            f.flush()
            resp = json.loads(f.readline())
            assert resp["ok"] and "tcp-look" in resp["presets"]
        srv.shutdown()
