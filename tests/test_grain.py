"""Film grain (ops/extras.apply_grain): determinism, semantics,
gating, and pipeline integration."""

import numpy as np
import pytest

from raweditor_tpu.ops.extras import (
    apply_grain,
    apply_grain_words,
    planes_to_words,
    words_to_planes,
)
from raweditor_tpu.params import EditParams


def _planes(rng, h=48, w=64, lo=0.3, span=0.4):
    return tuple((lo + span * rng.random((h, w))).astype(np.float32)
                 for _ in range(3))


def _apply(planes, amount, size=0.0):
    return tuple(np.asarray(c)
                 for c in apply_grain(*planes, amount, size))


def test_identity_at_zero_amount():
    rng = np.random.default_rng(0)
    planes = _planes(rng)
    out = _apply(planes, 0.0, 70.0)  # size alone is inert
    for a, b in zip(out, planes):
        np.testing.assert_array_equal(a, b)


def test_deterministic():
    """Same edit -> same bytes: the noise field is a fixed-key
    jax.random normal, so exports are reproducible."""
    rng = np.random.default_rng(1)
    planes = _planes(rng)
    a = _apply(planes, 60.0, 30.0)
    b = _apply(planes, 60.0, 30.0)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert (a[0] != planes[0]).any()


def test_monochrome_grain():
    """One offset shared by all channels (no chroma speckle) wherever
    the gamut clamp didn't engage."""
    rng = np.random.default_rng(2)
    planes = _planes(rng)
    out = _apply(planes, 80.0)
    d = [a - c for a, c in zip(out, planes)]
    unclipped = np.ones_like(planes[0], bool)
    for a in out:
        unclipped &= (a > 0.0) & (a < 1.0)
    assert unclipped.mean() > 0.9
    assert np.abs((d[0] - d[1])[unclipped]).max() < 1e-6
    assert np.abs((d[0] - d[2])[unclipped]).max() < 1e-6


def test_midtone_weighting_pins_extremes():
    """Pure black and pure white take no grain (w = sqrt(4y(1-y)))."""
    z = np.zeros((16, 16), np.float32)
    o = np.ones((16, 16), np.float32)
    for c in _apply((z, z, z), 100.0):
        np.testing.assert_array_equal(c, z)
    for c in _apply((o, o, o), 100.0):
        np.testing.assert_array_equal(c, o)


def test_size_coarsens_the_grain():
    """grain_size blends the upsampled octave: adjacent-pixel noise
    differences shrink (spatial correlation grows)."""
    rng = np.random.default_rng(3)
    planes = _planes(rng)
    fine = _apply(planes, 100.0, 0.0)[0] - planes[0]
    coarse = _apply(planes, 100.0, 100.0)[0] - planes[0]
    assert (np.abs(np.diff(coarse, axis=1)).mean()
            < 0.7 * np.abs(np.diff(fine, axis=1)).mean())


def test_per_image_amounts_batched():
    rng = np.random.default_rng(4)
    r, g, b = _planes(rng)
    rb, gb, bb = (np.stack([c, c]) for c in (r, g, b))
    amt = np.float32([80.0, 0.0])[:, None, None]
    sz = np.float32([20.0, 0.0])[:, None, None]
    out = tuple(np.asarray(c)
                for c in apply_grain(rb, gb, bb, amt, sz))
    for c_out, c_in in zip(out, (r, g, b)):
        assert (c_out[0] != c_in).any()
        np.testing.assert_array_equal(c_out[1], c_in)


def test_words_form_matches_planes_form():
    rng = np.random.default_rng(5)
    planes = _planes(rng, 24, 32)
    words = np.asarray(planes_to_words(*planes))
    got = np.asarray(apply_grain_words(words, 70.0, 40.0))
    want = np.asarray(planes_to_words(
        *apply_grain(*words_to_planes(words), 70.0, 40.0)))
    np.testing.assert_array_equal(got, want)


def test_finish_extras_mode_parts():
    assert EditParams(grain=40.0).finish_extras_mode() == "grain"
    assert EditParams(grain_size=50.0).finish_extras_mode() is False
    assert EditParams(grain=40.0, sharpen=10.0).finish_extras_mode() \
        == "base+grain"
    assert EditParams(grain=40.0, dehaze=5.0,
                      sat_red=5.0).finish_extras_mode() \
        == "full+mixer+grain"


def test_develop_grain_runs_and_differs():
    from raweditor_tpu.ops.develop import develop

    rng = np.random.default_rng(11)
    mosaic = (1000 + rng.integers(0, 2000, (32, 48))).astype(np.uint16)
    wb = np.array([2.07, 1.0, 1.32], np.float32)
    eye = np.eye(3, dtype=np.float32)
    p = EditParams(grain=80.0, grain_size=30.0)
    a = np.asarray(develop(mosaic, EditParams(), wb, eye))
    b = np.asarray(develop(mosaic, p, wb, eye,
                           extras=p.finish_extras_mode()))
    assert np.abs(a.astype(int) - b.astype(int)).max() > 2


class TestGrainPipeline:
    @pytest.fixture
    def raw_path(self, tmp_path, rng):
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "x.dng"
        mosaic = (800 + rng.integers(0, 2400, (64, 96))).astype(
            np.uint16)
        write_synthetic_raw(str(path), mosaic)
        return str(path)

    def test_engine_full_applies_grain(self, raw_path):
        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate")
        base = np.asarray(eng.full(EditParams())).astype(int)
        out = np.asarray(
            eng.full(EditParams(grain=80.0))).astype(int)
        assert np.abs(base - out).max() > 2
        # Grain composes with the banded kernel stages too.
        both = np.asarray(eng.full(
            EditParams(grain=80.0, sharpen=40.0))).astype(int)
        assert np.abs(both - out).max() > 0

    def test_batch_export_grain_mesh_matches_solo(self, tmp_path, rng):
        from raweditor_tpu.parallel.mesh import batch_row_mesh
        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )
        from raweditor_tpu.raw.synth import write_synthetic_raw

        paths = []
        for i in range(2):
            path = tmp_path / f"m{i}.dng"
            mosaic = (800 + rng.integers(0, 2400, (64, 96))).astype(
                np.uint16)
            write_synthetic_raw(str(path), mosaic)
            paths.append(str(path))
        plist = [EditParams(grain=70.0, grain_size=40.0),
                 EditParams(sharpen=50.0)]

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

    def test_batch_export_grain_jpeg_runs(self, tmp_path, rng):
        """Grain forces the RGBA kernel output and converts to JPEG
        planes after — the whole lane must still produce a JPEG."""
        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "m.dng"
        mosaic = (800 + rng.integers(0, 2400, (64, 96))).astype(
            np.uint16)
        write_synthetic_raw(str(path), mosaic)
        rep = run_batch_export(
            [ExportJob(str(path), str(tmp_path / "g.jpg"),
                       EditParams(grain=60.0)),
             ExportJob(str(path), str(tmp_path / "p.jpg"),
                       EditParams())],
            mesh=None, batch_size=2)
        assert rep.succeeded == 2 and not rep.failed
        from PIL import Image

        a = np.asarray(Image.open(tmp_path / "g.jpg").convert("RGB"))
        b = np.asarray(Image.open(tmp_path / "p.jpg").convert("RGB"))
        assert a.shape == b.shape and (a != b).any()
