"""Dehaze (ops/extras.apply_dehaze): scattering-model semantics,
static gating, and pipeline integration (engine + batch exporter)."""

import numpy as np
import pytest

from raweditor_tpu.ops.extras import (
    apply_dehaze,
    apply_dehaze_words,
    planes_to_words,
    words_to_planes,
)
from raweditor_tpu.params import EditParams


def _hazy_planes(rng, h=64, w=96):
    """A low-contrast scene lifted toward a warm veil — the input
    dehaze exists for."""
    base = rng.random((h, w), dtype=np.float32)
    return ((0.55 + 0.25 * base).astype(np.float32),
            (0.52 + 0.25 * base).astype(np.float32),
            (0.50 + 0.25 * base).astype(np.float32))


def _apply(planes, amount):
    return tuple(np.asarray(c) for c in apply_dehaze(*planes, amount))


def test_identity_at_zero():
    rng = np.random.default_rng(0)
    planes = _hazy_planes(rng)
    out = _apply(planes, 0.0)
    for a, b in zip(out, planes):
        np.testing.assert_array_equal(a, b)


def test_positive_expands_contrast():
    """Removing the veil restores contrast: the std of every channel
    grows substantially, and more slider means more restoration."""
    rng = np.random.default_rng(1)
    planes = _hazy_planes(rng)
    mid = _apply(planes, 40.0)
    strong = _apply(planes, 90.0)
    for c_in, c_mid, c_str in zip(planes, mid, strong):
        assert c_mid.std() > 1.3 * c_in.std()
        assert c_str.std() > c_mid.std()


def test_negative_adds_the_veil():
    """Negative amounts fade toward the veil color: contrast drops."""
    rng = np.random.default_rng(2)
    planes = _hazy_planes(rng)
    out = _apply(planes, -80.0)
    for c_in, c_out in zip(planes, out):
        assert c_out.std() < 0.75 * c_in.std()


def test_clear_darks_untouched():
    """dk → 0 regions (deep blacks) have t → 1: positive dehaze
    leaves them (nearly) alone — the transform targets the veil, not
    the whole tonal range."""
    rng = np.random.default_rng(3)
    r, g, b = _hazy_planes(rng)
    r[:8, :8] = g[:8, :8] = b[:8, :8] = 0.0
    out = _apply((r, g, b), 80.0)
    for c in out:
        np.testing.assert_allclose(c[:8, :8], 0.0, atol=1e-6)


def test_per_image_amounts_batched():
    rng = np.random.default_rng(4)
    r, g, b = _hazy_planes(rng)
    rb, gb, bb = (np.stack([c, c]) for c in (r, g, b))
    amt = np.float32([80.0, 0.0])[:, None, None]
    out = tuple(np.asarray(c) for c in apply_dehaze(rb, gb, bb, amt))
    for c_out, c_in in zip(out, (r, g, b)):
        assert (c_out[0] != c_in).any()
        np.testing.assert_array_equal(c_out[1], c_in)


def test_words_form_matches_planes_form():
    rng = np.random.default_rng(5)
    r, g, b = _hazy_planes(rng, 24, 32)
    words = np.asarray(planes_to_words(*(c for c in (r, g, b))))
    got = np.asarray(apply_dehaze_words(words, 70.0))
    ru, gu, bu = words_to_planes(words)
    want = np.asarray(planes_to_words(*apply_dehaze(ru, gu, bu, 70.0)))
    np.testing.assert_array_equal(got, want)


def test_finish_extras_mode_is_full():
    """Dehaze shares clarity's whole-frame gating: the 'full' part."""
    assert EditParams(dehaze=50.0).finish_extras_mode() == "full"
    assert EditParams(dehaze=50.0, sat_red=10.0).finish_extras_mode() \
        == "full+mixer"
    assert EditParams().finish_extras_mode() is False


# -- develop / pipeline integration ------------------------------------------

IDENTITY = np.eye(3, dtype=np.float32)
WB_DAYLIGHT = np.array([2.07, 1.0, 1.32], dtype=np.float32)


def test_develop_dehaze_runs_and_differs():
    from raweditor_tpu.ops.develop import develop

    rng = np.random.default_rng(11)
    mosaic = (2000 + rng.integers(0, 800, (32, 48))).astype(np.uint16)
    p = EditParams(dehaze=80.0)
    a = np.asarray(develop(mosaic, EditParams(), WB_DAYLIGHT, IDENTITY))
    b = np.asarray(develop(mosaic, p, WB_DAYLIGHT, IDENTITY,
                           extras=p.finish_extras_mode()))
    assert np.abs(a.astype(int) - b.astype(int)).max() > 3


class TestDehazePipeline:
    @pytest.fixture
    def raw_path(self, tmp_path, rng):
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "x.dng"
        # Lifted, compressed mosaic -> a hazy-looking develop.
        mosaic = (1500 + rng.integers(0, 1200, (64, 96))).astype(
            np.uint16)
        write_synthetic_raw(str(path), mosaic)
        return str(path)

    def test_engine_full_applies_dehaze(self, raw_path):
        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate")
        base = np.asarray(eng.full(EditParams())).astype(int)
        out = np.asarray(eng.full(EditParams(dehaze=80.0))).astype(int)
        assert np.abs(base - out).max() > 3
        # And the order contract: dehaze composes with clarity.
        both = np.asarray(
            eng.full(EditParams(dehaze=80.0, clarity=40.0))).astype(int)
        assert np.abs(both - out).max() > 0

    def test_batch_export_dehaze_mesh_matches_solo(self, tmp_path,
                                                   rng):
        from raweditor_tpu.parallel.mesh import batch_row_mesh
        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )
        from raweditor_tpu.raw.synth import write_synthetic_raw

        paths = []
        for i in range(2):
            path = tmp_path / f"m{i}.dng"
            mosaic = (1500 + rng.integers(0, 1200, (64, 96))).astype(
                np.uint16)
            write_synthetic_raw(str(path), mosaic)
            paths.append(str(path))
        plist = [EditParams(dehaze=70.0),
                 EditParams(sharpen=50.0)]  # one hazy, one plain

        jobs_a = [ExportJob(pth, str(tmp_path / f"solo{i}.png"),
                            plist[i])
                  for i, pth in enumerate(paths)]
        rep = run_batch_export(jobs_a, mesh=None, batch_size=2)
        assert rep.succeeded == 2 and not rep.failed

        mesh = batch_row_mesh(8, row=4)
        jobs_b = [ExportJob(pth, str(tmp_path / f"mesh{i}.png"),
                            plist[i])
                  for i, pth in enumerate(paths)]
        rep = run_batch_export(jobs_b, mesh=mesh, batch_size=2)
        assert rep.succeeded == 2 and not rep.failed
        from PIL import Image

        for i in range(2):
            a = np.asarray(Image.open(tmp_path / f"solo{i}.png"))
            b = np.asarray(Image.open(tmp_path / f"mesh{i}.png"))
            assert (a == b).all()

    def test_batch_export_dehaze_differs_from_plain(self, tmp_path,
                                                    rng):
        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "m.dng"
        mosaic = (1500 + rng.integers(0, 1200, (64, 96))).astype(
            np.uint16)
        write_synthetic_raw(str(path), mosaic)
        rep = run_batch_export(
            [ExportJob(str(path), str(tmp_path / "dh.png"),
                       EditParams(dehaze=80.0)),
             ExportJob(str(path), str(tmp_path / "plain.png"),
                       EditParams())],
            mesh=None, batch_size=2)
        assert rep.succeeded == 2 and not rep.failed
        from PIL import Image

        a = np.asarray(Image.open(tmp_path / "dh.png"))
        b = np.asarray(Image.open(tmp_path / "plain.png"))
        assert (a != b).any()
