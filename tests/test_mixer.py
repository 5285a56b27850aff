"""HSL color mixer (ops/mixer.py) — reference parity, semantics, and
pipeline integration.

The correctness oracle is an INDEPENDENT per-pixel NumPy/colorsys
implementation (float64, library HSV conversions) of the documented
math — same discipline as tests/oracle.py for the develop chain."""

import colorsys

import numpy as np
import pytest

from raweditor_tpu.ops.mixer import (
    BAND_CENTERS,
    BAND_NAMES,
    HUE_DEG_PER_UNIT,
    LUM_EXP2_PER_UNIT,
    SAT_PER_UNIT,
    apply_hsl_mixer,
)
from raweditor_tpu.params import MIXER_FIELDS, EditParams


def _interp_ref(h_deg, knots):
    """Circular piecewise-linear interpolation via np.interp over the
    extended knot list (independent of the op's segment-select form)."""
    xs = list(BAND_CENTERS) + [360.0]
    vals = list(knots) + [knots[0]]
    return np.interp(h_deg, xs, vals)


def _mixer_ref_pixel(r, g, b, mixer):
    """Per-pixel float64 reference using colorsys for both HSV legs."""
    hue_k, sat_k, lum_k = mixer[0:8], mixer[8:16], mixer[16:24]
    h, s, v = colorsys.rgb_to_hsv(r, g, b)
    c = v * s
    h_deg = h * 360.0
    dh = _interp_ref(h_deg, hue_k) * HUE_DEG_PER_UNIT
    fs = max(1.0 + _interp_ref(h_deg, sat_k) * SAT_PER_UNIT, 0.0)
    fl = 2.0 ** (_interp_ref(h_deg, lum_k) * LUM_EXP2_PER_UNIT)
    h2 = ((h_deg + dh) % 360.0) / 360.0
    v2 = min(max(v * fl, 0.0), 1.0)
    c2 = min(min(max(c * fs, 0.0), 1.0), v2)
    s2 = 0.0 if v2 <= 0.0 else c2 / v2
    nr, ng, nb = colorsys.hsv_to_rgb(h2, s2, v2)
    t = min(max(c * 5.0, 0.0), 1.0)
    w = t * t * (3.0 - 2.0 * t)
    out = [min(max(o + w * (n - o), 0.0), 1.0)
           for o, n in zip((r, g, b), (nr, ng, nb))]
    return out


def _mixer_ref(rgb, mixer):
    out = np.empty_like(rgb, dtype=np.float64)
    for i in range(rgb.shape[0]):
        for j in range(rgb.shape[1]):
            out[i, j] = _mixer_ref_pixel(*rgb[i, j].tolist(), mixer)
    return out


def _rand_rgb(rng, h=13, w=17):
    return rng.random((h, w, 3), dtype=np.float64).astype(np.float32)


def _apply(rgb, mixer):
    r, g, b = (np.asarray(rgb[..., k], np.float32) for k in range(3))
    ro, go, bo = apply_hsl_mixer(r, g, b, [np.float32(v) for v in mixer])
    return np.stack([np.asarray(ro), np.asarray(go), np.asarray(bo)],
                    axis=-1)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_independent_reference(seed):
    rng = np.random.default_rng(seed)
    rgb = _rand_rgb(rng)
    mixer = (rng.random(24) * 200.0 - 100.0).tolist()
    got = _apply(rgb, mixer)
    want = _mixer_ref(rgb.astype(np.float64), mixer)
    # f32 op vs f64 oracle; hue-band boundaries are piecewise-linear
    # in both, so the only divergence is rounding.
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_identity_at_zero_sliders():
    rng = np.random.default_rng(3)
    rgb = _rand_rgb(rng)
    got = _apply(rgb, [0.0] * 24)
    # The HSV round trip is ≤1 ULP; the chroma-weighted blend keeps
    # the result within float noise of the input.
    np.testing.assert_allclose(got, rgb, atol=1e-6)


def test_grays_exactly_unchanged():
    g = np.linspace(0.0, 1.0, 64, dtype=np.float32)
    rgb = np.repeat(g[:, None, None], 3, axis=2).reshape(8, 8, 3)
    mixer = [73.0] * 24
    got = _apply(rgb, mixer)
    # c = 0 → blend weight 0: bit-exact passthrough.
    np.testing.assert_array_equal(got, rgb)


def test_band_isolation():
    # A saturated blue pixel must ignore the red band's sliders
    # (blue at 240° is two bands away from red's tent).
    rgb = np.full((4, 4, 3), 0.0, np.float32)
    rgb[..., 2] = 0.9
    mixer = [0.0] * 24
    mixer[MIXER_FIELDS.index("sat_red")] = -100.0
    mixer[MIXER_FIELDS.index("hue_red")] = 100.0
    mixer[MIXER_FIELDS.index("lum_red")] = 100.0
    got = _apply(rgb, mixer)
    np.testing.assert_allclose(got, rgb, atol=1e-6)


def test_sat_slider_desaturates_its_band():
    rgb = np.zeros((2, 2, 3), np.float32)
    rgb[..., 0] = 0.8
    rgb[..., 1] = 0.1
    rgb[..., 2] = 0.1
    mixer = [0.0] * 24
    mixer[MIXER_FIELDS.index("sat_red")] = -100.0
    got = _apply(rgb, mixer)
    # Chroma collapses toward zero (full blend weight at c = 0.7).
    assert got[..., 0].max() - got[..., 1].min() < 1e-5
    # And value is preserved (sat only touches chroma).
    np.testing.assert_allclose(got[..., 0], 0.8, atol=1e-5)


def test_hue_slider_shifts_toward_next_band():
    # Pure red at h=0 with hue_red=+100 → h=30° (orange): in RGB,
    # G rises while R stays the max channel.
    rgb = np.zeros((1, 1, 3), np.float32)
    rgb[..., 0] = 1.0
    mixer = [0.0] * 24
    mixer[MIXER_FIELDS.index("hue_red")] = 100.0
    got = _apply(rgb, mixer)
    r, g, b = got[0, 0]
    assert r == pytest.approx(1.0, abs=1e-6)
    assert g == pytest.approx(0.5, abs=1e-5)  # sin ramp at 30°/60°
    assert b == pytest.approx(0.0, abs=1e-6)


def test_lum_slider_scales_value():
    rgb = np.zeros((1, 1, 3), np.float32)
    rgb[..., 2] = 0.5
    mixer = [0.0] * 24
    mixer[MIXER_FIELDS.index("lum_blue")] = 100.0
    got = _apply(rgb, mixer)
    want_v = 0.5 * 2.0 ** (100.0 * LUM_EXP2_PER_UNIT)
    assert got[0, 0, 2] == pytest.approx(want_v, rel=1e-5)


def test_mixer_field_order_matches_band_names():
    assert MIXER_FIELDS == tuple(
        f"{ctl}_{band}" for ctl in ("hue", "sat", "lum")
        for band in BAND_NAMES)
    assert len(BAND_CENTERS) == len(BAND_NAMES) == 8


# -- EditParams integration -------------------------------------------------


def test_params_json_roundtrip_sparse():
    p = EditParams(hue_red=25.0, sat_aqua=-40.0, lum_magenta=10.0)
    payload = p.to_json()
    # Mixer fields serialize only when non-default (reference-schema
    # compatibility for unedited catalogs).
    assert '"hue_red"' in payload and '"hue_blue"' not in payload
    q = EditParams.from_json(payload)
    assert q == p
    assert '"hue_red"' not in EditParams().to_json()


def test_finish_extras_modes():
    assert EditParams().finish_extras_mode() is False
    assert EditParams(sat_red=10.0).finish_extras_mode() == "mixer"
    assert EditParams(sharpen=10.0).finish_extras_mode() == "base"
    assert (EditParams(sharpen=10.0, hue_green=5.0).finish_extras_mode()
            == "base+mixer")
    assert (EditParams(clarity=10.0, hue_green=5.0).finish_extras_mode()
            == "full+mixer")
    assert EditParams(clarity=10.0).finish_extras_mode() == "full"
    assert EditParams(sat_red=10.0).has_finish_extras()
    assert EditParams(sat_red=10.0).has_mixer()
    assert not EditParams(sharpen=10.0).has_mixer()


def test_mixer_values_order():
    p = EditParams(hue_red=1.0, sat_red=2.0, lum_red=3.0)
    v = p.mixer_values()
    assert len(v) == 24
    assert v[0] == 1.0 and v[8] == 2.0 and v[16] == 3.0


# -- develop-chain integration (XLA, CPU backend) ---------------------------

IDENTITY = np.eye(3, dtype=np.float32)
WB_DAYLIGHT = np.array([2.07, 1.0, 1.32], dtype=np.float32)


def _tiny_mosaic(seed=11, h=32, w=48):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4095, (h, w)).astype(np.uint16)


def test_develop_with_mixer_matches_inchain_reference():
    """develop(..., extras="mixer") == the chain's own internals with
    the mixer applied on the encoded planes (exact — same graph
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
    p = EditParams(sat_yellow=-60.0, hue_blue=40.0, lum_green=30.0)
    assert p.finish_extras_mode() == "mixer"
    got = np.asarray(develop(mosaic, p, WB_DAYLIGHT, IDENTITY,
                             extras=p.finish_extras_mode()))

    norm = _normalize(mosaic, 4096.0, 0.0)
    r, g, b = _demosaic.demosaic(norm, "nearest", (0, 0))
    r, g, b = apply_edit_stack(r, g, b, p, WB_DAYLIGHT, IDENTITY, True)
    enc = encoder_for("gamma22")
    r, g, b = (jnp.minimum(enc(c), jnp.float32(1.0)) for c in (r, g, b))
    r, g, b = apply_hsl_mixer(r, g, b, p.mixer_values())

    def q(c):
        return np.asarray(
            jnp.floor(c * jnp.float32(255.0) + jnp.float32(0.5)).astype(
                jnp.uint8))

    want = np.stack([q(r), q(g), q(b)], axis=-1)
    np.testing.assert_array_equal(got, want)


def test_develop_mixer_zero_is_bitexact_default():
    """The static gate: mixer-free params resolve to mode False and
    develop bit-exactly on the default path."""
    from raweditor_tpu.ops.develop import develop

    mosaic = _tiny_mosaic()
    p = EditParams()
    assert p.finish_extras_mode() is False
    a = np.asarray(develop(mosaic, p, WB_DAYLIGHT, IDENTITY,
                           extras=p.finish_extras_mode()))
    b = np.asarray(develop(mosaic, p, WB_DAYLIGHT, IDENTITY))
    np.testing.assert_array_equal(a, b)


def test_develop_base_plus_mixer_runs_and_differs():
    """The combined mode traces both stages and each slider family
    visibly contributes."""
    from raweditor_tpu.ops.develop import develop

    mosaic = _tiny_mosaic()
    base = EditParams(sharpen=40.0)
    both = EditParams(sharpen=40.0, sat_red=-80.0, sat_orange=-80.0,
                      sat_yellow=-80.0, sat_green=-80.0, sat_aqua=-80.0,
                      sat_blue=-80.0, sat_purple=-80.0, sat_magenta=-80.0)
    assert both.finish_extras_mode() == "base+mixer"
    a = np.asarray(develop(mosaic, base, WB_DAYLIGHT, IDENTITY,
                           extras=base.finish_extras_mode()))
    b = np.asarray(develop(mosaic, both, WB_DAYLIGHT, IDENTITY,
                           extras=both.finish_extras_mode()))
    assert np.abs(a.astype(int) - b.astype(int)).max() > 3


def test_words_form_matches_planes_form():
    """finish_extras_rgba_words with a mixer == unpack → mixer →
    repack (quantize-then-filter contract)."""
    from raweditor_tpu.ops.extras import (
        finish_extras_rgba_words,
        planes_to_words,
        words_to_planes,
    )

    rng = np.random.default_rng(7)
    words = rng.integers(0, 2**24, (24, 32), dtype=np.uint64).astype(
        np.uint32) | np.uint32(0xFF000000)
    mixer = tuple(np.float32(v)
                  for v in (rng.random(24) * 160.0 - 80.0))
    got = np.asarray(finish_extras_rgba_words(
        words, 0.0, 0.0, mixer=mixer, stencils=False))
    r, g, b = words_to_planes(words)
    r, g, b = apply_hsl_mixer(r, g, b, mixer)
    want = np.asarray(planes_to_words(r, g, b))
    np.testing.assert_array_equal(got, want)


# -- Pallas post-pass kernel (interpret mode, CPU backend) -------------------


class TestPallasMixer:
    def _words(self, rng, shape):
        return (rng.integers(0, 2**24, shape).astype(np.uint32)
                | np.uint32(0xFF000000))

    def _diff(self, a, b):
        return int(np.abs(a.view(np.uint8).astype(int)
                          - b.view(np.uint8).astype(int)).max())

    @pytest.mark.parametrize("shape", [(96, 128), (50, 70)])
    def test_mixer_only_matches_reference(self, rng, shape):
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import finish_extras_rgba_words
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        words = self._words(rng, shape)
        mixer = (rng.random(24) * 200.0 - 100.0).astype(np.float32)
        ref = np.asarray(finish_extras_rgba_words(
            jnp.asarray(words), 0.0, 0.0, mixer=tuple(mixer),
            stencils=False))
        got = np.asarray(pallas_finish_extras_rgba(
            jnp.asarray(words), mixer=mixer, stencils=False,
            interpret=True))
        assert self._diff(ref, got) <= 1

    def test_mixer_plus_stencils_matches_reference(self, rng):
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import finish_extras_rgba_words
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        words = self._words(rng, (96, 128))
        mixer = (rng.random(24) * 200.0 - 100.0).astype(np.float32)
        ref = np.asarray(finish_extras_rgba_words(
            jnp.asarray(words), 70.0, 40.0, (10.0, -5.0, 5.0, -10.0),
            20.0, mixer=tuple(mixer)))
        got = np.asarray(pallas_finish_extras_rgba(
            jnp.asarray(words), 70.0, 40.0, (10.0, -5.0, 5.0, -10.0),
            20.0, mixer=mixer, interpret=True))
        assert self._diff(ref, got) <= 1

    def test_per_image_mixer_amounts(self, rng):
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import finish_extras_rgba_words
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        words = self._words(rng, (2, 96, 128))
        mix = np.zeros((2, 24), np.float32)
        mix[0, 8:16] = -100.0   # image 0: desaturate everything
        mix[1, 0:8] = 60.0      # image 1: hue-rotate everything
        got = np.asarray(pallas_finish_extras_rgba(
            jnp.asarray(words), mixer=mix, stencils=False,
            interpret=True))
        for i in range(2):
            ref = np.asarray(finish_extras_rgba_words(
                jnp.asarray(words[i]), 0.0, 0.0,
                mixer=tuple(mix[i]), stencils=False))
            assert self._diff(ref, got[i]) <= 1

    def test_hue_zero_tie_pixels_in_kernel(self):
        """Regression: pixels with g == b (hue exactly 0) must take
        the red band's adjustments inside the kernel. The original
        segment-mask interpolation mis-fused in the banded kernel and
        passed exactly-hue-0 pixels through untouched; the hat-weight
        form is pure arithmetic and immune."""
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import finish_extras_rgba_words
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        w0 = np.uint32(137 | (27 << 8) | (27 << 16) | 0xFF000000)
        words = np.full((96, 128), w0, np.uint32)
        mixer = np.zeros(24, np.float32)
        mixer[MIXER_FIELDS.index("hue_red")] = 30.0
        ref = np.asarray(finish_extras_rgba_words(
            jnp.asarray(words), 0.0, 0.0, mixer=tuple(mixer),
            stencils=False))
        got = np.asarray(pallas_finish_extras_rgba(
            jnp.asarray(words), mixer=mixer, stencils=False,
            interpret=True))
        assert self._diff(ref, got) <= 1
        # And the shift is real: green rises at h 0 -> 9 degrees.
        assert (got[0, 0] >> 8) & 0xFF > 27


# -- pipeline integration (engine + batch exporter, CPU backend) -------------


class TestMixerPipeline:
    @pytest.fixture
    def raw_path(self, tmp_path, rng):
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "x.dng"
        mosaic = rng.integers(0, 4095, (64, 96)).astype(np.uint16)
        write_synthetic_raw(str(path), mosaic)
        return str(path)

    def test_engine_full_applies_mixer(self, raw_path):
        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate")
        p = EditParams(sat_red=-100.0, sat_orange=-100.0,
                       sat_yellow=-100.0, sat_green=-100.0,
                       sat_aqua=-100.0, sat_blue=-100.0,
                       sat_purple=-100.0, sat_magenta=-100.0)
        base = np.asarray(eng.full(EditParams())).astype(int)
        mixed = np.asarray(eng.full(p)).astype(int)
        assert np.abs(base - mixed).max() > 3
        # Full desaturation: channel spread collapses vs the base
        # render wherever the base had chroma.
        spread = mixed.max(axis=-1) - mixed.min(axis=-1)
        base_spread = base.max(axis=-1) - base.min(axis=-1)
        assert spread.mean() < 0.35 * max(base_spread.mean(), 1.0)

    def test_preview_applies_mixer(self, raw_path):
        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate")
        p = EditParams(hue_red=80.0, hue_green=-80.0, hue_blue=80.0,
                       hue_orange=80.0, hue_yellow=-80.0,
                       hue_aqua=80.0, hue_purple=-80.0,
                       hue_magenta=80.0)
        a = np.asarray(eng.preview(EditParams()))
        b = np.asarray(eng.preview(p))
        assert (a != b).any()

    def test_batch_export_mixer_mesh_matches_solo(self, tmp_path, rng):
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
        # One mixer-only image, one mixer+stencil image: the flush
        # resolves to "base+mixer" and each image keeps its own
        # amounts.
        plist = [EditParams(sat_blue=-90.0, lum_red=40.0),
                 EditParams(sharpen=80.0, hue_green=50.0)]

        jobs_a = [ExportJob(pth, str(tmp_path / f"solo{i}.png"), plist[i])
                  for i, pth in enumerate(paths)]
        rep = run_batch_export(jobs_a, mesh=None, batch_size=2)
        assert rep.succeeded == 2 and not rep.failed

        mesh = batch_row_mesh(8, row=4)
        jobs_b = [ExportJob(pth, str(tmp_path / f"mesh{i}.png"), plist[i])
                  for i, pth in enumerate(paths)]
        rep = run_batch_export(jobs_b, mesh=mesh, batch_size=2)
        assert rep.succeeded == 2 and not rep.failed
        from PIL import Image

        for i in range(2):
            a = np.asarray(Image.open(tmp_path / f"solo{i}.png"))
            b = np.asarray(Image.open(tmp_path / f"mesh{i}.png"))
            assert (a == b).all()

    def test_batch_export_mixer_differs_from_plain(self, tmp_path, rng):
        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "m.dng"
        mosaic = rng.integers(0, 4095, (64, 96)).astype(np.uint16)
        write_synthetic_raw(str(path), mosaic)
        p = EditParams(sat_red=-100.0, sat_orange=-100.0,
                       sat_yellow=-100.0, sat_green=-100.0,
                       sat_aqua=-100.0, sat_blue=-100.0,
                       sat_purple=-100.0, sat_magenta=-100.0)
        rep = run_batch_export(
            [ExportJob(str(path), str(tmp_path / "mix.png"), p),
             ExportJob(str(path), str(tmp_path / "plain.png"),
                       EditParams())],
            mesh=None, batch_size=2)
        assert rep.succeeded == 2 and not rep.failed
        from PIL import Image

        a = np.asarray(Image.open(tmp_path / "mix.png"))
        b = np.asarray(Image.open(tmp_path / "plain.png"))
        assert (a != b).any()
