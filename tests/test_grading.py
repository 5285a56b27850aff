"""Color grading / split toning (ops/grading.py) — reference parity,
semantics, and pipeline integration.

The correctness oracle is an INDEPENDENT per-pixel NumPy/colorsys
implementation (float64, library HSV conversion for the wheel tints)
of the documented math — same discipline as tests/oracle.py for the
develop chain and tests/test_mixer.py for the HSL mixer."""

import colorsys

import numpy as np
import pytest

from raweditor_tpu.ops.grading import (
    BALANCE_PER_UNIT,
    GRADE_ORDER,
    STRENGTH,
    apply_color_grading,
)
from raweditor_tpu.params import GRADE_FIELDS, EditParams

_LUMA = np.array([0.2126, 0.7152, 0.0722])


def _grading_ref_pixel(r, g, b, grading):
    """Per-pixel float64 reference using colorsys for the wheel
    tints (independent of the op's branch-free triangle formula)."""
    sh_h, sh_s, m_h, m_s, hi_h, hi_s, bal = grading
    y = float(_LUMA @ (r, g, b))
    t = min(max(y + bal * BALANCE_PER_UNIT, 0.0), 1.0)
    weights = ((1.0 - t) ** 2, 2.0 * t * (1.0 - t), t * t)
    off = np.zeros(3)
    for w, hue, sat in zip(weights,
                           (sh_h, m_h, hi_h), (sh_s, m_s, hi_s)):
        tint = np.array(colorsys.hsv_to_rgb((hue % 360.0) / 360.0,
                                            1.0, 1.0))
        off += w * (sat * STRENGTH / 100.0) * (tint - _LUMA @ tint)
    u = min(max(8.0 * min(y, 1.0 - y), 0.0), 1.0)
    p = u * u * (3.0 - 2.0 * u)
    return [min(max(c + p * o, 0.0), 1.0)
            for c, o in zip((r, g, b), off)]


def _grading_ref(rgb, grading):
    out = np.empty_like(rgb, dtype=np.float64)
    for i in range(rgb.shape[0]):
        for j in range(rgb.shape[1]):
            out[i, j] = _grading_ref_pixel(*rgb[i, j].tolist(), grading)
    return out


def _apply(rgb, grading):
    r, g, b = (np.asarray(rgb[..., k], np.float32) for k in range(3))
    ro, go, bo = apply_color_grading(
        r, g, b, [np.float32(v) for v in grading])
    return np.stack([np.asarray(ro), np.asarray(go), np.asarray(bo)],
                    axis=-1)


def _rand_rgb(rng, h=13, w=17):
    return rng.random((h, w, 3), dtype=np.float64).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_independent_reference(seed):
    rng = np.random.default_rng(seed)
    rgb = _rand_rgb(rng)
    grading = (rng.random() * 360.0, rng.random() * 100.0,
               rng.random() * 360.0, rng.random() * 100.0,
               rng.random() * 360.0, rng.random() * 100.0,
               rng.random() * 200.0 - 100.0)
    got = _apply(rgb, grading)
    want = _grading_ref(rgb.astype(np.float64), grading)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_identity_at_zero_saturations():
    """Zero wheel saturations make the offset EXACTLY zero — hue and
    balance values are irrelevant — so the op is a bit-exact
    passthrough for in-range inputs."""
    rng = np.random.default_rng(3)
    rgb = _rand_rgb(rng)
    got = _apply(rgb, (120.0, 0.0, 45.0, 0.0, 300.0, 0.0, 80.0))
    np.testing.assert_array_equal(got, rgb)


def test_endpoints_stay_pinned():
    """Pure black and pure white are untinted (the split-toning
    contract): the pin is exactly 0 at y == 0 and y == 1."""
    rgb = np.zeros((2, 2, 3), np.float32)
    rgb[1] = 1.0
    got = _apply(rgb, (30.0, 100.0, 180.0, 100.0, 220.0, 100.0, 0.0))
    np.testing.assert_array_equal(got, rgb)


def test_luma_preserved_where_unclipped():
    """The tints are zero-luma directions: Rec.709 luma is unchanged
    wherever the gamut clamp didn't engage (mid-range input, moderate
    saturation)."""
    rng = np.random.default_rng(4)
    rgb = (0.35 + 0.3 * rng.random((9, 9, 3))).astype(np.float32)
    got = _apply(rgb, (30.0, 25.0, 140.0, 20.0, 220.0, 25.0, 10.0))
    assert np.abs(got - rgb).max() > 1e-3  # the effect is real
    y0 = rgb.astype(np.float64) @ _LUMA
    y1 = got.astype(np.float64) @ _LUMA
    np.testing.assert_allclose(y1, y0, atol=2e-6)


def test_shadow_wheel_targets_shadows():
    """A warm shadow tint moves a dark pixel far more than a bright
    one (quadratic crossfade weights)."""
    dark = np.full((1, 1, 3), 0.15, np.float32)
    bright = np.full((1, 1, 3), 0.85, np.float32)
    grading = (30.0, 100.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    d_shift = np.abs(_apply(dark, grading) - dark).max()
    b_shift = np.abs(_apply(bright, grading) - bright).max()
    assert d_shift > 4.0 * max(b_shift, 1e-9)


def test_balance_shifts_the_crossover():
    """Positive balance extends the highlight tint's reach: a midtone
    pixel picks up more of the highlight wheel with balance +100 than
    with 0."""
    mid = np.full((1, 1, 3), 0.5, np.float32)
    base = (0.0, 0.0, 0.0, 0.0, 220.0, 80.0, 0.0)
    plus = (0.0, 0.0, 0.0, 0.0, 220.0, 80.0, 100.0)
    s0 = np.abs(_apply(mid, base) - mid).max()
    s1 = np.abs(_apply(mid, plus) - mid).max()
    assert s1 > 1.5 * s0 > 0.0


def test_grade_field_order_matches_grade_order():
    assert GRADE_FIELDS == tuple(f"grade_{n}" for n in GRADE_ORDER)
    p = EditParams(grade_mid_hue=77.0, grade_high_sat=33.0)
    vals = p.grading_values()
    assert vals[GRADE_ORDER.index("mid_hue")] == 77.0
    assert vals[GRADE_ORDER.index("high_sat")] == 33.0


def test_finish_extras_modes():
    assert EditParams(grade_shadow_sat=40.0).finish_extras_mode() \
        == "grading"
    # Hue or balance alone tint nothing: statically off.
    assert EditParams(grade_shadow_hue=120.0).finish_extras_mode() \
        is False
    assert EditParams(grade_balance=50.0).finish_extras_mode() is False
    assert EditParams(grade_high_sat=10.0,
                      sharpen=20.0).finish_extras_mode() == \
        "base+grading"
    assert EditParams(grade_high_sat=10.0, clarity=20.0,
                      sat_red=5.0).finish_extras_mode() == \
        "full+mixer+grading"
    assert EditParams(grade_mid_sat=10.0,
                      hue_blue=30.0).finish_extras_mode() == \
        "mixer+grading"


def test_params_json_roundtrip_sparse():
    p = EditParams(grade_shadow_hue=40.0, grade_shadow_sat=60.0,
                   grade_balance=-25.0)
    q = EditParams.from_json(p.to_json())
    assert q == p
    # Default-valued grading fields never appear: an unedited develop
    # serializes to the reference's exact 10-field schema.
    import json

    assert set(json.loads(EditParams().to_json())) == {
        "exposure", "contrast", "highlights", "shadows", "whites",
        "blacks", "vibrance", "saturation", "temperature", "tint"}
    blob = json.loads(p.to_json())
    assert blob["grade_shadow_hue"] == 40.0
    assert "grade_mid_sat" not in blob


# -- develop integration ------------------------------------------------------

IDENTITY = np.eye(3, dtype=np.float32)
WB_DAYLIGHT = np.array([2.07, 1.0, 1.32], dtype=np.float32)


def _tiny_mosaic(seed=11, h=32, w=48):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4095, (h, w)).astype(np.uint16)


def test_develop_grading_zero_is_bitexact_default():
    from raweditor_tpu.ops.develop import develop

    mosaic = _tiny_mosaic()
    p = EditParams(grade_mid_hue=90.0)  # inert: zero saturation
    assert p.finish_extras_mode() is False
    a = np.asarray(develop(mosaic, p, WB_DAYLIGHT, IDENTITY,
                           extras=p.finish_extras_mode()))
    b = np.asarray(develop(mosaic, EditParams(), WB_DAYLIGHT, IDENTITY))
    np.testing.assert_array_equal(a, b)


def test_develop_with_grading_matches_inchain_reference():
    """develop(..., extras="grading") == the chain's own internals
    with grading applied on the encoded planes (exact — same graph
    modulo the op's placement)."""
    import jax.numpy as jnp

    from raweditor_tpu.color import encoder_for
    from raweditor_tpu.ops import demosaic as _demosaic
    from raweditor_tpu.ops.develop import (
        _normalize,
        apply_edit_stack,
        develop,
    )

    mosaic = _tiny_mosaic()
    p = EditParams(grade_shadow_hue=30.0, grade_shadow_sat=70.0,
                   grade_high_hue=220.0, grade_high_sat=50.0,
                   grade_balance=20.0)
    assert p.finish_extras_mode() == "grading"
    got = np.asarray(develop(mosaic, p, WB_DAYLIGHT, IDENTITY,
                             extras=p.finish_extras_mode()))

    norm = _normalize(mosaic, 4096.0, 0.0)
    r, g, b = _demosaic.demosaic(norm, "nearest", (0, 0))
    r, g, b = apply_edit_stack(r, g, b, p, WB_DAYLIGHT, IDENTITY, True)
    enc = encoder_for("gamma22")
    r, g, b = (jnp.minimum(enc(c), jnp.float32(1.0)) for c in (r, g, b))
    r, g, b = apply_color_grading(r, g, b, p.grading_values())

    def q(c):
        return np.asarray(
            jnp.floor(c * jnp.float32(255.0) + jnp.float32(0.5)).astype(
                jnp.uint8))

    want = np.stack([q(r), q(g), q(b)], axis=-1)
    np.testing.assert_array_equal(got, want)


def test_develop_base_plus_grading_runs_and_differs():
    from raweditor_tpu.ops.develop import develop

    mosaic = _tiny_mosaic()
    base = EditParams(sharpen=40.0)
    both = EditParams(sharpen=40.0, grade_shadow_hue=30.0,
                      grade_shadow_sat=100.0, grade_high_hue=220.0,
                      grade_high_sat=100.0)
    assert both.finish_extras_mode() == "base+grading"
    a = np.asarray(develop(mosaic, base, WB_DAYLIGHT, IDENTITY,
                           extras=base.finish_extras_mode()))
    b = np.asarray(develop(mosaic, both, WB_DAYLIGHT, IDENTITY,
                           extras=both.finish_extras_mode()))
    assert np.abs(a.astype(int) - b.astype(int)).max() > 3


def test_words_form_matches_planes_form():
    from raweditor_tpu.ops.extras import (
        finish_extras_rgba_words,
        planes_to_words,
        words_to_planes,
    )

    rng = np.random.default_rng(7)
    words = rng.integers(0, 2**24, (24, 32), dtype=np.uint64).astype(
        np.uint32) | np.uint32(0xFF000000)
    grading = tuple(np.float32(v) for v in
                    (300.0, 45.0, 60.0, 20.0, 200.0, 70.0, -30.0))
    got = np.asarray(finish_extras_rgba_words(
        words, 0.0, 0.0, grading=grading, stencils=False))
    r, g, b = words_to_planes(words)
    r, g, b = apply_color_grading(r, g, b, grading)
    want = np.asarray(planes_to_words(r, g, b))
    np.testing.assert_array_equal(got, want)


# -- Pallas post-pass kernel (interpret mode, CPU backend) -------------------


class TestPallasGrading:
    def _words(self, rng, shape):
        return (rng.integers(0, 2**24, shape).astype(np.uint32)
                | np.uint32(0xFF000000))

    def _diff(self, a, b):
        return int(np.abs(a.view(np.uint8).astype(int)
                          - b.view(np.uint8).astype(int)).max())

    @pytest.mark.parametrize("shape", [(96, 128), (50, 70)])
    def test_grading_only_matches_reference(self, rng, shape):
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import finish_extras_rgba_words
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        words = self._words(rng, shape)
        grading = np.float32([25.0, 80.0, 150.0, 30.0, 230.0, 60.0,
                              40.0])
        ref = np.asarray(finish_extras_rgba_words(
            jnp.asarray(words), 0.0, 0.0, grading=tuple(grading),
            stencils=False))
        got = np.asarray(pallas_finish_extras_rgba(
            jnp.asarray(words), grading=grading, stencils=False,
            interpret=True))
        assert self._diff(ref, got) <= 1

    def test_grading_plus_stencils_matches_reference(self, rng):
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import finish_extras_rgba_words
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        words = self._words(rng, (96, 128))
        grading = np.float32([25.0, 80.0, 150.0, 30.0, 230.0, 60.0,
                              -40.0])
        ref = np.asarray(finish_extras_rgba_words(
            jnp.asarray(words), 70.0, 40.0, (10.0, -5.0, 5.0, -10.0),
            20.0, grading=tuple(grading)))
        got = np.asarray(pallas_finish_extras_rgba(
            jnp.asarray(words), 70.0, 40.0, (10.0, -5.0, 5.0, -10.0),
            20.0, grading=grading, interpret=True))
        assert self._diff(ref, got) <= 1

    def test_grading_plus_mixer_matches_reference(self, rng):
        """Both pointwise heads active: the grading columns sit after
        the mixer block in the kernel's scalar table."""
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import finish_extras_rgba_words
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        words = self._words(rng, (96, 128))
        mixer = (rng.random(24) * 200.0 - 100.0).astype(np.float32)
        grading = np.float32([25.0, 80.0, 150.0, 30.0, 230.0, 60.0,
                              40.0])
        ref = np.asarray(finish_extras_rgba_words(
            jnp.asarray(words), 0.0, 0.0, mixer=tuple(mixer),
            grading=tuple(grading), stencils=False))
        got = np.asarray(pallas_finish_extras_rgba(
            jnp.asarray(words), mixer=mixer, grading=grading,
            stencils=False, interpret=True))
        assert self._diff(ref, got) <= 1

    def test_per_image_grading_amounts(self, rng):
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import finish_extras_rgba_words
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        words = self._words(rng, (2, 96, 128))
        grd = np.zeros((2, 7), np.float32)
        grd[0] = (30.0, 100.0, 0.0, 0.0, 0.0, 0.0, 0.0)   # warm shadows
        grd[1] = (0.0, 0.0, 0.0, 0.0, 220.0, 100.0, 50.0)  # cool highs
        got = np.asarray(pallas_finish_extras_rgba(
            jnp.asarray(words), grading=grd, stencils=False,
            interpret=True))
        for i in range(2):
            ref = np.asarray(finish_extras_rgba_words(
                jnp.asarray(words[i]), 0.0, 0.0,
                grading=tuple(grd[i]), stencils=False))
            assert self._diff(ref, got[i]) <= 1


# -- pipeline integration (engine + batch exporter, CPU backend) -------------


class TestGradingPipeline:
    @pytest.fixture
    def raw_path(self, tmp_path, rng):
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "x.dng"
        mosaic = rng.integers(0, 4095, (64, 96)).astype(np.uint16)
        write_synthetic_raw(str(path), mosaic)
        return str(path)

    def test_engine_full_applies_grading(self, raw_path):
        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate")
        p = EditParams(grade_shadow_hue=30.0, grade_shadow_sat=100.0,
                       grade_high_hue=220.0, grade_high_sat=100.0)
        base = np.asarray(eng.full(EditParams())).astype(int)
        graded = np.asarray(eng.full(p)).astype(int)
        assert np.abs(base - graded).max() > 3

    def test_preview_applies_grading(self, raw_path):
        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate")
        p = EditParams(grade_mid_hue=140.0, grade_mid_sat=90.0)
        a = np.asarray(eng.preview(EditParams()))
        b = np.asarray(eng.preview(p))
        assert (a != b).any()

    def test_batch_export_grading_mesh_matches_solo(self, tmp_path,
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
            mosaic = rng.integers(0, 4095, (64, 96)).astype(np.uint16)
            write_synthetic_raw(str(path), mosaic)
            paths.append(str(path))
        # One grading-only image, one grading+mixer+stencil image: the
        # flush resolves to "base+mixer+grading" and each image keeps
        # its own amounts.
        plist = [EditParams(grade_shadow_hue=30.0,
                            grade_shadow_sat=80.0),
                 EditParams(sharpen=80.0, hue_green=50.0,
                            grade_high_hue=220.0, grade_high_sat=60.0,
                            grade_balance=-30.0)]

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

    def test_batch_export_grading_differs_from_plain(self, tmp_path,
                                                     rng):
        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "m.dng"
        mosaic = rng.integers(0, 4095, (64, 96)).astype(np.uint16)
        write_synthetic_raw(str(path), mosaic)
        p = EditParams(grade_shadow_hue=30.0, grade_shadow_sat=100.0,
                       grade_high_hue=220.0, grade_high_sat=100.0)
        rep = run_batch_export(
            [ExportJob(str(path), str(tmp_path / "grade.png"), p),
             ExportJob(str(path), str(tmp_path / "plain.png"),
                       EditParams())],
            mesh=None, batch_size=2)
        assert rep.succeeded == 2 and not rep.failed
        from PIL import Image

        a = np.asarray(Image.open(tmp_path / "grade.png"))
        b = np.asarray(Image.open(tmp_path / "plain.png"))
        assert (a != b).any()
