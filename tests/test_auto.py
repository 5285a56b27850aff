"""Auto-adjust suggestions (beyond the reference)."""

import numpy as np
import pytest

from raweditor_tpu.params import EditParams
from raweditor_tpu.pipeline.auto import (
    suggest_auto,
    suggest_exposure,
    suggest_white_balance,
)
from raweditor_tpu.pipeline.engine import DevelopEngine
from raweditor_tpu.raw.synth import write_synthetic_raw


def _engine(tmp_path, mosaic, **kwargs):
    path = tmp_path / "a.nef"
    write_synthetic_raw(path, mosaic, **kwargs)
    return DevelopEngine.open(path)


def test_underexposed_suggests_positive_stops(tmp_path, rng):
    dark = rng.integers(0, 300, size=(48, 64), dtype=np.uint16)
    eng = _engine(tmp_path, dark)
    stops = suggest_exposure(eng)
    assert stops > 1.0


def test_overexposed_suggests_negative_stops(tmp_path, rng):
    bright = rng.integers(3600, 4096, size=(48, 64), dtype=np.uint16)
    eng = _engine(tmp_path, bright)
    assert suggest_exposure(eng) < 0.0


def test_well_exposed_near_zero(tmp_path, rng):
    # Values whose p99 develops near the 0.92 display target.
    lin_target = 0.92 ** 2.2
    good = rng.integers(int(lin_target * 4096 * 0.5),
                        int(lin_target * 4096), size=(48, 64),
                        dtype=np.uint16)
    eng = _engine(tmp_path, good)
    assert abs(suggest_exposure(eng)) < 0.5


def test_fast_gamma_engine_linearizes_like_exact(tmp_path, rng):
    """A fast-gamma engine renders the same curve to u8 accuracy as
    its exact parent, so the suggestions must match closely — exact
    string comparisons previously linearized 'gamma22_poly' renders
    with the sRGB inverse (~0.6-stop exposure error; code-review r3)."""
    dark = rng.integers(0, 300, size=(48, 64), dtype=np.uint16)
    path = tmp_path / "a.nef"
    write_synthetic_raw(path, dark)
    for transfer in ("gamma22", "srgb"):
        exact = DevelopEngine.open(path, mode="accurate",
                                   transfer=transfer)
        fast = DevelopEngine.open(path, mode="accurate",
                                  transfer=transfer, fast_gamma=True)
        assert fast.transfer.endswith("_poly")
        a = suggest_exposure(exact)
        b = suggest_exposure(fast)
        assert abs(a - b) < 0.1, (transfer, a, b)
        wa = suggest_white_balance(exact)
        wb = suggest_white_balance(fast)
        assert np.allclose(wa, wb, atol=0.05), (transfer, wa, wb)


def test_gray_world_wb_detects_cast(tmp_path, rng):
    # Blue-heavy mosaic: B sites hot, R sites weak → warm correction
    # (positive temperature raises R, lowers B).
    h, w = 48, 64
    m = np.empty((h, w), np.uint16)
    m[0::2, 0::2] = 400   # R sites
    m[0::2, 1::2] = 1500  # G
    m[1::2, 0::2] = 1500  # G
    m[1::2, 1::2] = 3000  # B sites
    eng = _engine(tmp_path, m)
    temp, tint = suggest_white_balance(eng)
    assert temp > 0.3
    # Applying the suggestion should reduce the cast.
    hist0 = eng.histogram(EditParams())
    hist1 = eng.histogram(EditParams(temperature=temp, tint=tint))
    def spread(h):
        bins = np.arange(256)
        means = [(h[c] * bins).sum() / max(h[c].sum(), 1) for c in range(3)]
        return max(means) - min(means)
    assert spread(hist1) < spread(hist0)


def test_suggest_auto_combines(tmp_path, rng):
    dark = rng.integers(0, 200, size=(32, 32), dtype=np.uint16)
    eng = _engine(tmp_path, dark)
    p = suggest_auto(eng)
    assert p.exposure > 1.0
    assert -1.0 <= float(p.temperature) <= 1.0


def test_session_auto_command(tmp_path, rng):
    from raweditor_tpu.pipeline.session import DevelopSession

    dark = rng.integers(0, 200, size=(32, 32), dtype=np.uint16)
    eng = _engine(tmp_path, dark)
    s = DevelopSession(eng)
    out = s.handle("auto")
    assert out["ok"] and out["params"]["exposure"] > 1.0


def test_auto_is_idempotent(tmp_path, rng):
    """Running auto on already-corrected params must not undo the
    correction (regression: residual WB replaced instead of composing)."""
    h, w = 48, 64
    m = np.empty((h, w), np.uint16)
    m[0::2, 0::2] = 400
    m[0::2, 1::2] = 1500
    m[1::2, 0::2] = 1500
    m[1::2, 1::2] = 3000
    eng = _engine(tmp_path, m)
    p1 = suggest_auto(eng)
    p2 = suggest_auto(eng, p1)
    # Second pass keeps the correction (small residual drift allowed).
    assert abs(float(p2.temperature) - float(p1.temperature)) < 0.15
    assert abs(float(p2.exposure) - float(p1.exposure)) < 0.5


class TestSuggestLevels:
    def _engine(self, tmp_path, mosaic):
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "lv.dng"
        write_synthetic_raw(path, mosaic, wb_neutral=(1.0, 1.0, 1.0))
        return DevelopEngine.open(str(path))

    def test_washed_out_image_stretches(self, tmp_path, rng):
        """A low-contrast mid-gray scene gets blacks raised and whites
        lowered (stretch), and re-running on the stretched params is a
        near no-op."""
        from raweditor_tpu.pipeline.auto import suggest_levels
        from raweditor_tpu.params import EditParams

        # Linear values ~[0.25, 0.55] of full scale.
        mosaic = rng.integers(1024, 2250, size=(48, 64),
                              dtype=np.uint16)
        eng = self._engine(tmp_path, mosaic)
        blacks, whites = suggest_levels(eng, EditParams())
        assert blacks > 0.1
        assert whites < 0.8
        stretched = EditParams(blacks=blacks, whites=whites)
        b2, w2 = suggest_levels(eng, stretched)
        assert abs(b2 - blacks) < 0.1 * (whites - blacks) + 0.05
        assert abs(w2 - whites) < 0.1 * (whites - blacks) + 0.05

    def test_degenerate_render_is_noop(self, tmp_path):
        from raweditor_tpu.pipeline.auto import suggest_levels
        from raweditor_tpu.params import EditParams

        mosaic = np.zeros((48, 64), np.uint16)
        eng = self._engine(tmp_path, mosaic)
        p = EditParams(blacks=0.1, whites=0.9)
        assert suggest_levels(eng, p) == (0.1, 0.9)

    def test_suggest_auto_includes_levels(self, tmp_path, rng):
        from raweditor_tpu.pipeline.auto import suggest_auto
        from raweditor_tpu.params import EditParams

        mosaic = rng.integers(1024, 2250, size=(48, 64),
                              dtype=np.uint16)
        eng = self._engine(tmp_path, mosaic)
        no_lv = suggest_auto(eng, EditParams())
        with_lv = suggest_auto(eng, EditParams(), include_levels=True)
        assert float(no_lv.blacks) == 0.0 and float(no_lv.whites) == 1.0
        assert float(with_lv.blacks) != 0.0 or float(with_lv.whites) != 1.0


class TestSuggestContrast:
    def test_low_contrast_scene_gets_positive_delta(self, tmp_path, rng):
        from raweditor_tpu.pipeline.auto import suggest_contrast
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.params import EditParams
        from raweditor_tpu.raw.synth import write_synthetic_raw

        # Narrow mid-gray band → small interquartile spread.
        mosaic = rng.integers(1700, 2100, size=(48, 64), dtype=np.uint16)
        path = tmp_path / "c.dng"
        write_synthetic_raw(path, mosaic, wb_neutral=(1.0, 1.0, 1.0))
        eng = DevelopEngine.open(str(path))
        delta = suggest_contrast(eng, EditParams())
        assert delta > 5.0

    def test_flat_render_suggests_zero(self, tmp_path):
        from raweditor_tpu.pipeline.auto import suggest_contrast
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.params import EditParams
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "f.dng"
        write_synthetic_raw(path, np.zeros((48, 64), np.uint16),
                            wb_neutral=(1.0, 1.0, 1.0))
        eng = DevelopEngine.open(str(path))
        assert suggest_contrast(eng, EditParams()) == 0.0


class TestShadowsHighlights:
    def test_dark_scene_lifts_shadows(self, tmp_path, rng):
        from raweditor_tpu.pipeline.auto import suggest_shadows_highlights

        # Mostly deep shadows with a few bright pixels so auto-exposure
        # logic isn't what fixes it.
        m = rng.integers(0, 120, size=(48, 64)).astype(np.uint16)
        m[:4, :4] = 4000
        eng = _engine(tmp_path, m)
        sh, hl = suggest_shadows_highlights(eng)
        assert sh > 0.2
        assert hl == 0.0

    def test_blown_scene_pulls_highlights(self, tmp_path, rng):
        from raweditor_tpu.pipeline.auto import suggest_shadows_highlights

        m = rng.integers(3900, 4096, size=(48, 64)).astype(np.uint16)
        eng = _engine(tmp_path, m)
        sh, hl = suggest_shadows_highlights(eng)
        assert hl < -0.2

    def test_balanced_scene_near_zero(self, tmp_path, rng):
        from raweditor_tpu.pipeline.auto import suggest_shadows_highlights

        # Neutral WB: the default synth WB doubles red, which clips a
        # midtone scene's red channel — a real highlight problem, not
        # the no-op case this test wants.
        m = rng.integers(1200, 2800, size=(48, 64)).astype(np.uint16)
        eng = _engine(tmp_path, m, wb_neutral=(1.0, 1.0, 1.0))
        sh, hl = suggest_shadows_highlights(eng)
        assert sh <= 0.1 and hl >= -0.1

    def test_residual_shrinks_after_applying(self, tmp_path, rng):
        """Applying the suggestion reduces the next suggestion — no
        runaway stacking across repeated `auto tone` runs."""
        from raweditor_tpu.pipeline.auto import suggest_shadows_highlights

        m = rng.integers(0, 120, size=(48, 64)).astype(np.uint16)
        m[:4, :4] = 4000
        eng = _engine(tmp_path, m)
        sh1, _ = suggest_shadows_highlights(eng)
        applied = EditParams(shadows=sh1)
        sh2, _ = suggest_shadows_highlights(eng, applied)
        assert sh2 <= sh1 + 1e-6

    def test_suggest_auto_includes_tone(self, tmp_path, rng):
        # A big bright region (>1% of pixels) anchors auto-exposure on
        # the highlights, so the deep shadows survive the exposure step
        # and the tone pass has real work left.
        m = rng.integers(0, 120, size=(48, 64)).astype(np.uint16)
        m[:8, :] = 3800
        eng = _engine(tmp_path, m)
        out = suggest_auto(eng, include_tone=True)
        assert float(out.shadows) > 0.0

    def test_session_auto_tone_token(self, tmp_path, rng):
        from raweditor_tpu.pipeline.session import DevelopSession

        m = rng.integers(0, 120, size=(24, 32)).astype(np.uint16)
        eng = _engine(tmp_path, m)
        sess = DevelopSession(eng, None, None)
        out = sess.handle("auto tone")
        assert out["ok"]
        out = sess.handle("auto bogus")
        assert not out["ok"] and "tone" in out["error"]
