"""Local adjustments (ops/local_adjust.py) — masked per-region develop
deltas, beyond the reference (whose edits are all global,
state/edit.rs:15-96).

Covers: the mask-weight math against an INDEPENDENT per-pixel NumPy
float64 oracle (the tests/oracle.py discipline), the delta semantics
(a full-frame mask reproduces the global slider), structural gating
(no masks → bit-exact parity; zero-delta masks ≤1 LSB), geometric
placement (masks hit the right picture region, identically on the
preview grid and the full render), serde/preset persistence, batch
packing, and the session/CLI surfaces.
"""

import numpy as np
import pytest

from raweditor_tpu.ops.local_adjust import (
    _DATA_FIELDS,
    KINDS,
    LocalAdjust,
    apply_local_adjustments,
    full_grid_norm,
    mask_weight,
)
from raweditor_tpu.params import EditParams

WB = np.ones(3, np.float32)
CM = np.eye(3, dtype=np.float32)


# ---------------------------------------------------------------------------
# Independent float64 oracle (no jax, no shared helpers)
# ---------------------------------------------------------------------------

def _smooth_ref(t):
    t = np.clip(t, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _weight_ref(m: LocalAdjust, X, Y, r, g, b):
    """Per-pixel float64 weight, straight from the documented model."""
    x0, y0 = float(m.x0), float(m.y0)
    if m.kind == "linear":
        dx, dy = float(m.x1) - x0, float(m.y1) - y0
        t = ((X - x0) * dx + (Y - y0) * dy) / (dx * dx + dy * dy + 1e-12)
        w = _smooth_ref(t)
    elif m.kind == "radial":
        rx = max(float(m.x1), 1e-4)
        ry = max(float(m.y1), 1e-4)
        d = np.sqrt(((X - x0) / rx) ** 2 + ((Y - y0) / ry) ** 2)
        f = min(max(float(m.feather), 0.01), 1.0)
        w = _smooth_ref((1.0 + f - d) / (2.0 * f))
    else:
        w = np.ones(np.broadcast_shapes(X.shape, Y.shape))
    y = np.clip(0.2126 * r + 0.7152 * g + 0.0722 * b, 0.0, 1.0)
    soft = max(float(m.luma_soft), 1e-3)
    w = w * _smooth_ref((y - float(m.luma_lo)) / soft + 1.0)
    w = w * _smooth_ref((float(m.luma_hi) - y) / soft + 1.0)
    inv = float(m.invert)
    return inv + (1.0 - 2.0 * inv) * w


def _apply_ref(r, g, b, masks, X, Y):
    """Float64 reference of the whole stage."""
    r, g, b = (np.asarray(c, np.float64) for c in (r, g, b))
    for m in masks:
        w = _weight_ref(m, X, Y, r, g, b)
        e = np.exp2(float(m.exposure) * w)
        temp = float(m.temperature) * w
        tint = float(m.tint) * w
        r = r * e * (1.0 + temp * 0.3)
        g = g * e * (1.0 + tint * 0.3)
        b = b * e * (1.0 - temp * 0.3)
        cf = 1.0 + float(m.contrast) * w * 0.01
        r = (r - 0.5) * cf + 0.5
        g = (g - 0.5) * cf + 0.5
        b = (b - 0.5) * cf + 0.5
        sf = 1.0 + float(m.saturation) * w * 0.01
        y = 0.2126 * r + 0.7152 * g + 0.0722 * b
        r = y + (r - y) * sf
        g = y + (g - y) * sf
        b = y + (b - y) * sf
    return (np.maximum(r, 0.0), np.maximum(g, 0.0), np.maximum(b, 0.0))


def _grid(h, w):
    X = ((np.arange(w, dtype=np.float64) + 0.5) / w)[None, :]
    Y = ((np.arange(h, dtype=np.float64) + 0.5) / h)[:, None]
    return X, Y


def _rand_mask(rng, kind):
    return LocalAdjust(
        kind=kind,
        x0=float(rng.uniform(0.1, 0.9)), y0=float(rng.uniform(0.1, 0.9)),
        x1=float(rng.uniform(0.1, 0.9)), y1=float(rng.uniform(0.1, 0.9)),
        feather=float(rng.uniform(0.05, 1.0)),
        invert=float(rng.integers(0, 2)),
        luma_lo=float(rng.uniform(0.0, 0.4)),
        luma_hi=float(rng.uniform(0.6, 1.0)),
        luma_soft=float(rng.uniform(0.02, 0.3)),
        exposure=float(rng.uniform(-2.0, 2.0)),
        contrast=float(rng.uniform(-80.0, 80.0)),
        saturation=float(rng.uniform(-80.0, 80.0)),
        temperature=float(rng.uniform(-1.0, 1.0)),
        tint=float(rng.uniform(-1.0, 1.0)),
    )


class TestMaskOracle:
    @pytest.mark.parametrize("kind", KINDS)
    @pytest.mark.parametrize("seed", [0, 1])
    def test_weight_matches_reference(self, kind, seed):
        rng = np.random.default_rng(seed)
        h, w = 23, 31
        m = _rand_mask(rng, kind)
        X, Y = _grid(h, w)
        r = rng.random((h, w))
        g = rng.random((h, w))
        b = rng.random((h, w))
        cols, rows = full_grid_norm(h, w)
        got = np.asarray(mask_weight(
            m, np.asarray(cols, np.float32)[None, :],
            np.asarray(rows, np.float32)[:, None],
            r.astype(np.float32), g.astype(np.float32),
            b.astype(np.float32)))
        want = _weight_ref(m, X, Y, r, g, b)
        np.testing.assert_allclose(got, want, atol=3e-6)
        assert got.min() >= 0.0 and got.max() <= 1.0

    @pytest.mark.parametrize("seed", [2, 3, 4])
    def test_full_stage_matches_reference(self, seed):
        rng = np.random.default_rng(seed)
        h, w = 19, 27
        masks = tuple(
            _rand_mask(rng, KINDS[int(rng.integers(0, 3))])
            for _ in range(3))
        r = rng.random((h, w)).astype(np.float32)
        g = rng.random((h, w)).astype(np.float32)
        b = rng.random((h, w)).astype(np.float32)
        cols, rows = full_grid_norm(h, w)
        got = apply_local_adjustments(r, g, b, masks, cols, rows)
        X, Y = _grid(h, w)
        want = _apply_ref(r, g, b, masks, X, Y)
        for gg, ww in zip(got, want):
            # 3 chained masks in f32 vs f64: exp2/divide rounding only.
            np.testing.assert_allclose(np.asarray(gg), ww, atol=2e-4)

    def test_linear_ramp_direction(self):
        # Graduated filter (0.5, 0) → (0.5, 0.5): weight 0 at the top
        # edge, 1 at and below the midline ("darken the sky" aims the
        # OTHER way — p1 side gets the effect).
        m = LocalAdjust(kind="linear", x0=0.5, y0=0.0, x1=0.5, y1=0.5)
        cols, rows = full_grid_norm(32, 16)
        w = np.asarray(mask_weight(
            m, np.asarray(cols)[None, :], np.asarray(rows)[:, None],
            *(np.full((32, 16), 0.5, np.float32),) * 3))
        assert w[0].max() < 0.01          # top edge: p0 side
        assert w[16:].min() > 0.99        # below midline: p1 side
        col = w[:, 8]
        assert (np.diff(col) >= -1e-6).all()  # monotonic ramp

    def test_radial_inside_outside(self):
        m = LocalAdjust(kind="radial", x0=0.5, y0=0.5, x1=0.2, y1=0.2,
                        feather=0.5)
        cols, rows = full_grid_norm(64, 64)
        w = np.asarray(mask_weight(
            m, np.asarray(cols)[None, :], np.asarray(rows)[:, None],
            *(np.full((64, 64), 0.5, np.float32),) * 3))
        assert w[32, 32] > 0.99           # center: inside
        assert w[0, 0] < 1e-6             # corner: d >> 1+f
        assert w[32, 0] < 1e-6            # edge on the axis: d = 2.5

    def test_invert_flips(self):
        base = LocalAdjust(kind="radial", x0=0.5, y0=0.5, x1=0.2,
                           y1=0.2)
        inv = base.replace(invert=1.0)
        cols, rows = full_grid_norm(32, 32)
        args = (np.asarray(cols)[None, :], np.asarray(rows)[:, None],
                *(np.full((32, 32), 0.5, np.float32),) * 3)
        w0 = np.asarray(mask_weight(base, *args))
        w1 = np.asarray(mask_weight(inv, *args))
        np.testing.assert_allclose(w1, 1.0 - w0, atol=1e-6)

    def test_luma_range_selects_brights(self):
        # A horizontal luminance ramp; lo=0.6 must zero the dark half
        # and pass the bright end.
        m = LocalAdjust(kind="luma", luma_lo=0.6, luma_soft=0.05)
        h, w = 8, 64
        ramp = np.tile(np.linspace(0.0, 1.0, w, dtype=np.float32),
                       (h, 1))
        cols, rows = full_grid_norm(h, w)
        wgt = np.asarray(mask_weight(
            m, np.asarray(cols)[None, :], np.asarray(rows)[:, None],
            ramp, ramp, ramp))
        assert wgt[:, : w // 2].max() < 0.01   # luma < 0.5: deselected
        assert wgt[:, -4:].min() > 0.99        # luma → 1: full weight

    def test_default_luma_range_selects_everything(self):
        m = LocalAdjust(kind="luma")
        h, w = 8, 8
        cols, rows = full_grid_norm(h, w)
        for level in (0.0, 0.5, 1.0, 4.0):  # >1 linear light clips
            planes = (np.full((h, w), level, np.float32),) * 3
            wgt = np.asarray(mask_weight(
                m, np.asarray(cols)[None, :],
                np.asarray(rows)[:, None], *planes))
            assert wgt.min() > 1.0 - 1e-6, level


class TestDeltaSemantics:
    def test_full_frame_exposure_matches_global(self, rng):
        """A whole-frame mask's exposure IS the global slider: with
        every other slider at default the chain is linear, so the
        post-stack local gain commutes (negative stops: nothing
        clips)."""
        from raweditor_tpu.ops.develop import develop

        m = rng.integers(0, 4096, (32, 48)).astype(np.uint16)
        g = np.asarray(develop(m, EditParams(exposure=-0.8), WB, CM))
        loc = np.asarray(develop(
            m, EditParams(locals=(LocalAdjust(kind="luma",
                                              exposure=-0.8),)),
            WB, CM))
        assert np.max(np.abs(g.astype(int) - loc.astype(int))) <= 1

    def test_full_frame_temperature_matches_global(self, rng):
        from raweditor_tpu.ops.develop import develop

        m = rng.integers(0, 2048, (32, 48)).astype(np.uint16)
        g = np.asarray(develop(m, EditParams(temperature=-0.6), WB, CM))
        loc = np.asarray(develop(
            m, EditParams(locals=(LocalAdjust(kind="luma",
                                              temperature=-0.6),)),
            WB, CM))
        assert np.max(np.abs(g.astype(int) - loc.astype(int))) <= 1


class TestDevelopIntegration:
    def test_zero_delta_mask_within_1lsb(self, rng):
        from raweditor_tpu.ops.develop import develop

        m = rng.integers(0, 4096, (32, 48)).astype(np.uint16)
        base = np.asarray(develop(m, EditParams(), WB, CM))
        z = np.asarray(develop(
            m, EditParams(locals=(LocalAdjust(kind="radial"),)),
            WB, CM))
        assert np.max(np.abs(z.astype(int) - base.astype(int))) <= 1

    def test_mask_changes_only_its_region(self, rng):
        from raweditor_tpu.ops.develop import develop

        m = (rng.integers(1024, 3072, (64, 96))).astype(np.uint16)
        mask = LocalAdjust(kind="radial", x0=0.25, y0=0.5, x1=0.15,
                           y1=0.2, feather=0.3, exposure=-2.0)
        base = np.asarray(develop(m, EditParams(), WB, CM)).astype(int)
        out = np.asarray(develop(
            m, EditParams(locals=(mask,)), WB, CM)).astype(int)
        diff = np.abs(out - base).max(axis=-1)
        # Center of the ellipse: clearly darkened.
        assert diff[32, 20:28].max() > 8
        # Far right half: weight 0, bit-exact.
        assert diff[:, 56:].max() == 0

    def test_preview_masks_same_picture_region(self, rng):
        """The preview's sampled grid maps masks to PICTURE coordinates:
        the |diff| centroid lands on the mask center on the full render
        and on a half-size preview alike."""
        from raweditor_tpu.ops.develop import develop, develop_preview

        m = (rng.integers(1024, 3072, (64, 96))).astype(np.uint16)
        mask = LocalAdjust(kind="radial", x0=0.3, y0=0.4, x1=0.15,
                           y1=0.2, feather=0.3, exposure=-2.5)
        p0 = EditParams()
        p1 = EditParams(locals=(mask,))

        def centroid(a, b):
            d = np.abs(a.astype(int) - b.astype(int)).max(axis=-1)
            ys, xs = np.nonzero(d > 4)
            h, w = d.shape
            return (xs.mean() + 0.5) / w, (ys.mean() + 0.5) / h

        full = centroid(np.asarray(develop(m, p1, WB, CM)),
                        np.asarray(develop(m, p0, WB, CM)))
        prev = centroid(
            np.asarray(develop_preview(m, p1, WB, CM, 48, 32)),
            np.asarray(develop_preview(m, p0, WB, CM, 48, 32)))
        for got in (full, prev):
            assert abs(got[0] - 0.3) < 0.05 and abs(got[1] - 0.4) < 0.05

    def test_composes_with_finish_extras(self, rng):
        from raweditor_tpu.ops.develop import develop

        m = rng.integers(0, 4096, (32, 48)).astype(np.uint16)
        p = EditParams(sharpen=60.0,
                       locals=(LocalAdjust(kind="luma", exposure=-1.0),))
        out = np.asarray(develop(m, p, WB, CM, extras=True))
        only_sharpen = np.asarray(develop(
            m, EditParams(sharpen=60.0), WB, CM, extras=True))
        assert (out != only_sharpen).any()


class TestSerde:
    def test_mask_dict_round_trip_sparse(self):
        m = LocalAdjust(kind="linear", x0=0.1, exposure=-1.5)
        d = m.to_dict()
        assert d == {"kind": "linear", "x0": 0.1, "exposure": -1.5}
        assert LocalAdjust.from_dict(d) == m

    def test_bad_kind_and_unknown_field_rejected(self):
        with pytest.raises(ValueError):
            LocalAdjust(kind="vortex")
        with pytest.raises(ValueError):
            LocalAdjust.from_dict({"kind": "radial", "bogus": 1.0})
        with pytest.raises(ValueError):
            LocalAdjust.from_dict({"x0": 0.5})  # kind required

    def test_params_json_round_trip(self):
        p = EditParams(
            exposure=0.5,
            locals=(LocalAdjust(kind="radial", x0=0.3, exposure=-1.0),
                    LocalAdjust(kind="luma", luma_lo=0.7)))
        p2 = EditParams.from_json(p.to_json())
        assert p2.locals == p.locals
        assert not p.is_unedited()
        # A mask alone counts as an edit (export must not skip it).
        assert not EditParams(locals=(LocalAdjust(),)).is_unedited()

    def test_locals_json_must_be_list(self):
        with pytest.raises(ValueError):
            EditParams.from_json('{"locals": {"kind": "luma"}}')

    def test_pytree_kind_is_static_numbers_are_leaves(self):
        import jax

        p = EditParams(locals=(LocalAdjust(kind="radial"),))
        leaves, td = jax.tree_util.tree_flatten(p)
        assert len(leaves) == len(EditParams.field_names()) + len(
            _DATA_FIELDS)
        # Same numbers, different kind → different treedef (static).
        p2 = EditParams(locals=(LocalAdjust(kind="linear"),))
        assert jax.tree_util.tree_structure(p2) != td


class TestPresets:
    @pytest.fixture(autouse=True)
    def _preset_dir(self, tmp_path, monkeypatch):
        monkeypatch.setenv("RAWEDITOR_TPU_PRESETS_DIR",
                           str(tmp_path / "presets"))

    def test_preset_round_trip_with_locals(self):
        from raweditor_tpu import presets

        mask = LocalAdjust(kind="linear", y1=0.6, exposure=-1.0)
        presets.save_preset("sky", EditParams(locals=(mask,)))
        out = presets.load_preset("sky")
        assert out["locals"] == (mask,)
        applied = presets.apply_preset(EditParams(exposure=1.0), "sky")
        assert applied.locals == (mask,) and applied.exposure == 1.0

    def test_bad_locals_payload_rejected(self):
        from raweditor_tpu import presets

        d = presets.presets_dir()
        d.mkdir(parents=True, exist_ok=True)
        (d / "bad.json").write_text('{"locals": [{"kind": "vortex"}]}')
        with pytest.raises(ValueError):
            presets.load_preset("bad")


class TestBatch:
    def test_pack_and_batch_matches_individual(self, rng):
        from raweditor_tpu.ops.develop import develop
        from raweditor_tpu.parallel.batch import (batch_develop,
                                                  pack_params)

        mosaics = rng.integers(0, 4096, (3, 32, 48)).astype(np.uint16)
        plist = [
            EditParams(exposure=float(e), locals=(
                LocalAdjust(kind="radial", x0=float(x), x1=0.3, y1=0.3,
                            exposure=-1.0),
                LocalAdjust(kind="luma", saturation=float(s)),
            ))
            for e, x, s in ((0.2, 0.3, 20.0), (-0.4, 0.7, -30.0),
                            (0.0, 0.5, 0.0))
        ]
        wbs = np.ones((3, 3), np.float32)
        cms = np.stack([CM] * 3)
        got = np.asarray(batch_develop(mosaics, pack_params(plist),
                                       wbs, cms))
        for i in range(3):
            want = np.asarray(develop(mosaics[i], plist[i], WB, CM))
            np.testing.assert_array_equal(got[i], want)

    def test_mixed_structure_raises(self):
        from raweditor_tpu.parallel.batch import pack_params

        with pytest.raises(ValueError):
            pack_params([
                EditParams(locals=(LocalAdjust(kind="radial"),)),
                EditParams(),
            ])


class TestSessionAndCLI:
    @pytest.fixture
    def session(self, tmp_path, rng, monkeypatch):
        from raweditor_tpu.catalog import Library
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.pipeline.session import DevelopSession
        from raweditor_tpu.raw.synth import write_synthetic_raw

        monkeypatch.chdir(tmp_path)
        path = tmp_path / "a.nef"
        write_synthetic_raw(
            path, rng.integers(0, 4096, size=(24, 32), dtype=np.uint16))
        lib = Library(tmp_path / "cat.db")
        image_id = lib.import_image(str(path), "a.nef")
        eng = DevelopEngine.open(path)
        yield DevelopSession(eng, lib, image_id), lib, image_id
        lib.close()

    def test_local_add_set_del_clear(self, session):
        s, lib, image_id = session
        out = s.handle("local add radial x0=0.3 exposure=-1")
        assert out["ok"] and out["index"] == 0
        assert out["render_ms"] > 0
        # Persisted like any slider tick.
        stored = lib.load_edit_params(image_id)
        assert stored.locals[0].kind == "radial"
        assert float(stored.locals[0].exposure) == -1.0
        out = s.handle("local set 0 exposure -2")
        assert out["ok"]
        assert float(s.params.locals[0].exposure) == -2.0
        out = s.handle("local list")
        assert out["ok"] and len(out["locals"]) == 1
        out = s.handle("local del 0")
        assert out["ok"] and s.params.locals == ()
        s.handle("local add luma luma_lo=0.5")
        out = s.handle("local clear")
        assert out["ok"]
        assert lib.load_edit_params(image_id).locals == ()

    def test_local_errors_are_command_errors(self, session):
        s, _, _ = session
        for line in ("local add vortex", "local set 5 exposure 1",
                     "local set 0 bogus 1", "local del 3",
                     "local add radial exposure=nan!",
                     "local frobnicate"):
            out = s.handle(line)
            assert out is not None and not out["ok"], line

    def test_cli_local_spec_parsing(self):
        from raweditor_tpu.cli import _parse_local_spec

        m = _parse_local_spec("radial:x0=0.3,y0=0.4,exposure=-1")
        assert m.kind == "radial" and float(m.exposure) == -1.0
        assert _parse_local_spec("luma:").kind == "luma"
        for bad in ("vortex:x0=0.5", "radial:x0", "radial:x0=abc",
                    "radial:bogus=1"):
            with pytest.raises(SystemExit):
                _parse_local_spec(bad)

    def test_cli_develop_with_local(self, tmp_path, rng, monkeypatch):
        from raweditor_tpu.cli import main
        from raweditor_tpu.raw.synth import write_synthetic_raw

        monkeypatch.chdir(tmp_path)
        path = tmp_path / "a.nef"
        write_synthetic_raw(
            path, rng.integers(1024, 3072,
                               size=(24, 32)).astype(np.uint16))
        out0 = tmp_path / "base.png"
        out1 = tmp_path / "masked.png"
        assert main(["develop", str(path), "-o", str(out0)]) == 0
        assert main(["develop", str(path), "-o", str(out1), "--local",
                     "radial:x0=0.5,y0=0.5,x1=0.4,y1=0.4,exposure=-2",
                     ]) == 0
        assert out0.read_bytes() != out1.read_bytes()


class TestEngine:
    def test_aot_engine_falls_back_for_locals(self, tmp_path, rng):
        """AOT executables are compiled mask-free; a locals-active
        params must route to the jit lane and still render."""
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "a.nef"
        write_synthetic_raw(
            path, rng.integers(1024, 3072,
                               size=(32, 48)).astype(np.uint16))
        eng = DevelopEngine.open(path, max_preview_width=24)
        eng.compile_preview()
        base = np.asarray(eng.preview(EditParams()))
        masked = np.asarray(eng.preview(EditParams(locals=(
            LocalAdjust(kind="radial", x0=0.5, y0=0.5, x1=0.4, y1=0.4,
                        exposure=-2.0),))))
        assert base.shape == masked.shape
        assert (base != masked).any()

    def test_full_render_respects_locals(self, tmp_path, rng):
        """engine.full() must not take a fused lane that skips the
        locals stage (the Pallas kernels don't carry it): a graduated
        filter changes the bottom of the frame and leaves the top
        bit-exact."""
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "a.nef"
        write_synthetic_raw(
            path, rng.integers(1024, 3072,
                               size=(32, 48)).astype(np.uint16))
        for use_pallas in (False, True):
            eng = DevelopEngine.open(path, use_pallas=use_pallas)
            p = EditParams(locals=(
                LocalAdjust(kind="linear", x0=0.5, y0=0.25, x1=0.5,
                            y1=0.75, exposure=-2.0),))
            base = np.asarray(eng.full(EditParams())).astype(int)
            got = np.asarray(eng.full(p)).astype(int)
            assert np.abs(got[28:] - base[28:]).max() > 4, use_pallas
            assert np.abs(got[:4] - base[:4]).max() == 0, use_pallas
