"""Finish extras (sharpen / denoise, ops/extras.py) — beyond the
reference, whose develop chain ends at vibrance + gamma
(reference: gpu/shaders.rs:171-267 has no spatial output filtering).

Covers: the static gating contract (defaults never trace the extras;
zero amounts inside an extras-enabled graph stay within 1 LSB), the
image-quality claims (denoise raises PSNR on noisy input, sharpening
raises edge acutance monotonically), serde-compat JSON, per-image
amounts under the batch exporter's vmap, and mesh-path equality.
"""

import json
import os

import numpy as np
import pytest

from raweditor_tpu.params import EditParams


def _rgb_planes(rng, h=48, w=64, smooth=True):
    """Encoded-domain [0,1] test planes: a smooth 2-D ramp scene."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.25 + 0.5 * (xx / w) * (yy / h)
    r = base
    g = np.clip(base * 1.1, 0.0, 1.0)
    b = np.clip(base * 0.8, 0.0, 1.0)
    return r.astype(np.float32), g.astype(np.float32), b.astype(np.float32)


def _apply(r, g, b, sharpen=0.0, denoise=0.0):
    from raweditor_tpu.ops.extras import apply_finish_extras

    out = apply_finish_extras(r, g, b, sharpen, denoise)
    return tuple(np.asarray(c) for c in out)


class TestKernel:
    def test_zero_amounts_near_identity(self, rng):
        r, g, b = _rgb_planes(rng)
        r2, g2, b2 = _apply(r, g, b, 0.0, 0.0)
        # The opponent round trip may cost 1 ULP; nothing visible.
        for a, c in ((r, r2), (g, g2), (b, b2)):
            assert np.max(np.abs(a - c)) < 1e-5

    def test_denoise_raises_psnr(self, rng):
        clean = _rgb_planes(rng)
        noisy = tuple(
            np.clip(c + rng.normal(0, 0.03, c.shape).astype(np.float32),
                    0, 1)
            for c in clean
        )
        den = _apply(*noisy, sharpen=0.0, denoise=80.0)

        def mse(t):
            return float(np.mean([(a - b) ** 2
                                  for a, b in zip(t, clean)]))

        assert mse(den) < 0.5 * mse(noisy)

    def test_chroma_noise_strongly_suppressed(self, rng):
        r, g, b = _rgb_planes(rng)
        # Chroma-only noise: perturb r/b against g.
        n = rng.normal(0, 0.04, r.shape).astype(np.float32)
        rn = np.clip(r + n, 0, 1)
        bn = np.clip(b - n, 0, 1)
        r2, g2, b2 = _apply(rn, g, bn, denoise=100.0)
        assert np.mean((r2 - r) ** 2) < 0.2 * np.mean((rn - r) ** 2)

    def test_sharpen_monotonic_acutance(self, rng):
        # A soft vertical edge; acutance = mean |horizontal gradient|.
        h, w = 48, 64
        xx = np.mgrid[0:h, 0:w][1].astype(np.float32)
        soft = (1.0 / (1.0 + np.exp(-(xx - w / 2) / 3.0))).astype(
            np.float32)
        r = g = b = 0.2 + 0.6 * soft

        def acutance(t):
            y = 0.2126 * t[0] + 0.7152 * t[1] + 0.0722 * t[2]
            return float(np.mean(np.abs(np.diff(y, axis=1))))

        base = acutance((r, g, b))
        a50 = acutance(_apply(r, g, b, sharpen=50.0))
        a100 = acutance(_apply(r, g, b, sharpen=100.0))
        assert base < a50 < a100

    def test_output_clamped(self, rng):
        # Hard edge at the top of the range: USM overshoot must clamp,
        # not wrap the quantizers.
        r, g, b = _rgb_planes(rng)
        r = r.copy()
        r[:, 32:] = 1.0
        r[:, :32] = 0.0
        out = _apply(r, g, b, sharpen=150.0, denoise=0.0)
        for c in out:
            assert c.min() >= 0.0 and c.max() <= 1.0

    def test_batched_matches_loop(self, rng):
        r, g, b = _rgb_planes(rng)
        rb = np.stack([r, r * 0.5])
        gb = np.stack([g, g * 0.5])
        bb = np.stack([b, b * 0.5])
        batched = _apply(rb, gb, bb, sharpen=60.0, denoise=30.0)
        one = _apply(r, g, b, sharpen=60.0, denoise=30.0)
        for big, small in zip(batched, one):
            np.testing.assert_allclose(big[0], small, rtol=0, atol=1e-6)


class TestDevelopGating:
    def test_static_flag_ignores_params(self, rng):
        from raweditor_tpu.ops.develop import develop

        m = rng.integers(0, 4095, (32, 48)).astype(np.uint16)
        wb = np.ones(3, np.float32)
        cm = np.eye(3, dtype=np.float32)
        base = np.asarray(develop(m, EditParams(), wb, cm))
        ignored = np.asarray(
            develop(m, EditParams(sharpen=100.0), wb, cm, extras=False))
        assert (ignored == base).all()

    def test_zero_amount_enabled_within_1lsb(self, rng):
        from raweditor_tpu.ops.develop import develop

        m = rng.integers(0, 4095, (32, 48)).astype(np.uint16)
        wb = np.ones(3, np.float32)
        cm = np.eye(3, dtype=np.float32)
        base = np.asarray(develop(m, EditParams(), wb, cm))
        z = np.asarray(develop(m, EditParams(), wb, cm, extras=True))
        assert np.max(np.abs(z.astype(int) - base.astype(int))) <= 1

    def test_extras_change_output(self, rng):
        from raweditor_tpu.ops.develop import develop

        m = rng.integers(0, 4095, (32, 48)).astype(np.uint16)
        wb = np.ones(3, np.float32)
        cm = np.eye(3, dtype=np.float32)
        base = np.asarray(develop(m, EditParams(), wb, cm))
        e = np.asarray(develop(
            m, EditParams(sharpen=100.0, denoise=60.0), wb, cm,
            extras=True))
        assert (e != base).any()

    def test_u16_lane(self, rng):
        from raweditor_tpu.ops.develop import develop_u16

        m = rng.integers(0, 4095, (32, 48)).astype(np.uint16)
        wb = np.ones(3, np.float32)
        cm = np.eye(3, dtype=np.float32)
        base = np.asarray(develop_u16(m, EditParams(), wb, cm))
        e = np.asarray(develop_u16(
            m, EditParams(denoise=80.0), wb, cm, extras=True))
        assert e.dtype == np.uint16 and (e != base).any()


class TestParamsContract:
    def test_has_finish_extras(self):
        assert not EditParams().has_finish_extras()
        assert EditParams(sharpen=10.0).has_finish_extras()
        assert EditParams(denoise=5.0).has_finish_extras()

    def test_default_json_is_reference_schema(self):
        payload = json.loads(EditParams().to_json())
        assert len(payload) == 10 and "sharpen" not in payload

    def test_extras_json_round_trip(self):
        p = EditParams(exposure=0.5, sharpen=75.0, denoise=25.0)
        assert EditParams.from_json(p.to_json()) == p

    def test_is_unedited_covers_extras(self):
        assert not EditParams(sharpen=1.0).is_unedited()

    def test_ranges_present_for_cli(self):
        from raweditor_tpu.params import RANGES

        assert "sharpen" in RANGES and "denoise" in RANGES


class TestEngineAndExport:
    @pytest.fixture
    def raw_path(self, tmp_path, rng):
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "x.dng"
        mosaic = rng.integers(0, 4095, (64, 96)).astype(np.uint16)
        write_synthetic_raw(str(path), mosaic)
        return str(path)

    def test_preview_tick_aot_fallback(self, raw_path):
        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate")
        eng.compile_preview()
        p = EditParams(sharpen=100.0, denoise=50.0)
        t0 = np.asarray(eng.preview_tick(EditParams()))
        t = np.asarray(eng.preview_tick(p))
        assert (t != t0).any()
        # The jit path must agree with preview() for the same params.
        assert (t == eng.preview(p)).all()

    def test_engine_export_jpeg_and_tiff(self, raw_path, tmp_path):
        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate")
        p = EditParams(sharpen=80.0)
        a = tmp_path / "a.jpg"
        b = tmp_path / "b.jpg"
        eng.export(str(a), EditParams(), quality=92)
        eng.export(str(b), p, quality=92)
        assert a.read_bytes() != b.read_bytes()
        t16 = tmp_path / "a.tiff"
        eng.export_tiff16(str(t16), p)
        assert t16.stat().st_size > 0

    def test_batch_per_image_amounts(self, rng):
        """Each image in one vmapped batch gets its own amounts."""
        from raweditor_tpu.ops.develop import develop_rgba
        from raweditor_tpu.parallel.batch import (
            batch_develop_rgba,
            pack_params,
        )

        m = rng.integers(0, 4095, (2, 32, 48)).astype(np.uint16)
        wb = np.ones((2, 3), np.float32)
        cm = np.stack([np.eye(3, dtype=np.float32)] * 2)
        plist = [EditParams(sharpen=120.0), EditParams(denoise=90.0)]
        out = np.asarray(batch_develop_rgba(
            m, pack_params(plist), wb, cm, extras=True))
        for i, p in enumerate(plist):
            single = np.asarray(develop_rgba(
                m[i], p, wb[i], cm[i], extras=True))
            assert (out[i] == single).all()

    def test_batch_export_with_mesh(self, tmp_path, rng):
        """Extras-active batches route GSPMD on a row-sharded mesh and
        match the mesh-less output bit-for-bit."""
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
        p = EditParams(sharpen=90.0, denoise=40.0)

        jobs_a = [ExportJob(pth, str(tmp_path / f"solo{i}.png"), p)
                  for i, pth in enumerate(paths)]
        rep = run_batch_export(jobs_a, mesh=None, batch_size=2)
        assert rep.succeeded == 2 and not rep.failed

        mesh = batch_row_mesh(8, row=4)
        jobs_b = [ExportJob(pth, str(tmp_path / f"mesh{i}.png"), p)
                  for i, pth in enumerate(paths)]
        rep = run_batch_export(jobs_b, mesh=mesh, batch_size=2)
        assert rep.succeeded == 2 and not rep.failed
        from PIL import Image

        for i in range(2):
            a = np.asarray(Image.open(tmp_path / f"solo{i}.png"))
            b = np.asarray(Image.open(tmp_path / f"mesh{i}.png"))
            assert (a == b).all()

    def test_catalog_round_trip(self, tmp_path, raw_path):
        from raweditor_tpu.catalog import Library

        lib = Library(str(tmp_path / "cat.db"))
        img_id = lib.import_image(raw_path, os.path.basename(raw_path))
        p = EditParams(exposure=0.3, sharpen=66.0)
        lib.save_edit_params(img_id, p)
        assert lib.load_edit_params(img_id) == p
        lib.close()


class TestPallasPostPass:
    """pallas_finish_extras_rgba vs its XLA behavioral reference
    (ops/extras.finish_extras_rgba_words) in interpreter mode — the
    compiled kernel's on-chip timings live in docs/performance.md."""

    def _words(self, rng, shape):
        return (rng.integers(0, 2**24, shape).astype(np.uint32)
                | np.uint32(0xFF000000))

    def _diff(self, a, b):
        return int(np.abs(a.view(np.uint8).astype(int)
                          - b.view(np.uint8).astype(int)).max())

    @pytest.mark.parametrize("shape", [(96, 128), (96, 130), (100, 128),
                                       (50, 70), (2, 96, 128)])
    def test_matches_reference(self, rng, shape):
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import finish_extras_rgba_words
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        words = self._words(rng, shape)
        ref = np.asarray(finish_extras_rgba_words(
            jnp.asarray(words), 80.0, 50.0))
        got = np.asarray(pallas_finish_extras_rgba(
            jnp.asarray(words), 80.0, 50.0, interpret=True))
        # ±1 LSB contract (FMA-contraction differences between fusion
        # contexts); the pad-rescue paths must not leak clone pixels.
        assert self._diff(ref, got) <= 1

    def test_per_image_amounts(self, rng):
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import finish_extras_rgba_words
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        words = self._words(rng, (2, 96, 128))
        got = np.asarray(pallas_finish_extras_rgba(
            jnp.asarray(words),
            np.array([100.0, 0.0], np.float32),
            np.array([0.0, 80.0], np.float32), interpret=True))
        for i, (s, d) in enumerate([(100.0, 0.0), (0.0, 80.0)]):
            ref = np.asarray(finish_extras_rgba_words(
                jnp.asarray(words[i]), s, d))
            assert self._diff(ref, got[i]) <= 1

    def test_quantized_vs_inchain_within_contract(self, rng):
        """Quantize-then-filter (the post-pass) vs filter-then-quantize
        (the XLA in-chain form) stay within a couple of LSBs — the
        fast-lane contract that lets the exporter/engine route extras
        through the kernel."""
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import (
            apply_finish_extras,
            finish_extras_rgba_words,
        )

        r, g, b = _rgb_planes(rng)
        words = (
            np.floor(r * 255 + 0.5).astype(np.uint32)
            | (np.floor(g * 255 + 0.5).astype(np.uint32) << 8)
            | (np.floor(b * 255 + 0.5).astype(np.uint32) << 16)
            | np.uint32(0xFF000000))
        post = np.asarray(finish_extras_rgba_words(
            jnp.asarray(words), 80.0, 50.0)).view(np.uint8).reshape(
                words.shape + (4,))
        rr, gg, bb = apply_finish_extras(r, g, b, 80.0, 50.0)
        inchain = np.stack(
            [np.floor(np.asarray(c) * 255 + 0.5) for c in (rr, gg, bb)],
            axis=-1).astype(int)
        got = np.stack([post[..., 0], post[..., 1], post[..., 2]],
                       axis=-1).astype(int)
        assert np.abs(got - inchain).max() <= 2

    @pytest.mark.parametrize("shape", [(96, 128), (96, 130), (100, 128)])
    def test_ycbcr420_output(self, rng, shape):
        """The post-pass can emit the JPEG planes directly (NV12
        layout) — must match converting its RGBA output."""
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import finish_extras_rgba_words
        from raweditor_tpu.ops.jpeg import rgba_words_to_ycbcr420
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        words = self._words(rng, shape)
        ref = rgba_words_to_ycbcr420(finish_extras_rgba_words(
            jnp.asarray(words), 80.0, 50.0))
        ry, rcb, rcr = (np.asarray(pl) for pl in ref)
        y, c = pallas_finish_extras_rgba(
            jnp.asarray(words), 80.0, 50.0, interpret=True,
            output="ycbcr420")
        y, c = np.asarray(y), np.asarray(c)
        for got, want in ((y, ry), (c[..., 0::2], rcb),
                          (c[..., 1::2], rcr)):
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_batch_composition_determinism(self, tmp_path, rng):
        """An extras-FREE image's exported bytes must not depend on
        whether an extras-using job shares its batch: the bucketer
        splits flushes by has_finish_extras (the extras-enabled graph
        shifts zero-amount images by ±1 LSB — code-review r3)."""
        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )
        from raweditor_tpu.raw.synth import write_synthetic_raw

        raw = tmp_path / "plain.dng"
        write_synthetic_raw(
            str(raw), rng.integers(0, 4095, (64, 96)).astype(np.uint16))
        raw2 = tmp_path / "edited.dng"
        write_synthetic_raw(
            str(raw2), rng.integers(0, 4095, (64, 96)).astype(np.uint16))

        solo = tmp_path / "solo.png"
        rep = run_batch_export(
            [ExportJob(str(raw), str(solo))], batch_size=2)
        assert rep.succeeded == 1

        mixed = tmp_path / "mixed.png"
        rep = run_batch_export(
            [ExportJob(str(raw), str(mixed)),
             ExportJob(str(raw2), str(tmp_path / "other.png"),
                       EditParams(sharpen=120.0))],
            batch_size=2)
        assert rep.succeeded == 2
        assert solo.read_bytes() == mixed.read_bytes()


class TestToneCurve:
    """Parametric tone curve (ops/extras.tone_curve) — four region
    sliders over a monotone knot remap of encoded luma."""

    def _curve(self, y, *c):
        from raweditor_tpu.ops.extras import tone_curve

        return np.asarray(tone_curve(np.asarray(y, np.float32), c))

    def test_identity_at_zero(self):
        y = np.linspace(0, 1, 257).astype(np.float32)
        out = self._curve(y, 0.0, 0.0, 0.0, 0.0)
        assert np.abs(out - y).max() < 1e-6

    def test_endpoints_pinned(self):
        for c in ((100, 100, 100, 100), (-100, -100, -100, -100),
                  (100, -100, 100, -100)):
            out = self._curve(np.array([0.0, 1.0]), *c)
            assert abs(out[0]) < 2e-3 and abs(out[1] - 1.0) < 2e-3

    def test_region_selectivity(self):
        """The shadows slider lifts dark tones and leaves highlights
        essentially alone (and vice versa)."""
        y = np.linspace(0, 1, 101).astype(np.float32)
        lifted = self._curve(y, 80.0, 0.0, 0.0, 0.0)
        assert lifted[20] > y[20] + 0.05          # dark tone lifted
        assert abs(lifted[90] - y[90]) < 1e-3     # highlight untouched
        hi = self._curve(y, 0.0, 0.0, 0.0, -80.0)
        assert hi[85] < y[85] - 0.03
        assert abs(hi[10] - y[10]) < 1e-3

    def test_monotone_under_opposing_extremes(self):
        y = np.linspace(0, 1, 1001).astype(np.float32)
        for c in ((100, -100, 100, -100), (-100, 100, -100, 100),
                  (100, 100, -100, -100)):
            out = self._curve(y, *c)
            assert np.all(np.diff(out) >= -1e-6)

    def test_develop_integration(self, rng):
        from raweditor_tpu.ops.develop import develop

        m = rng.integers(0, 4095, (32, 48)).astype(np.uint16)
        wb = np.ones(3, np.float32)
        cm = np.eye(3, dtype=np.float32)
        base = np.asarray(develop(m, EditParams(), wb, cm))
        e = np.asarray(develop(
            m, EditParams(curve_shadows=80.0), wb, cm, extras=True))
        assert (e != base).any()
        # Slider participates in gating + serde-when-used.
        p = EditParams(curve_lights=-30.0)
        assert p.has_finish_extras()
        assert EditParams.from_json(p.to_json()) == p
        import json as _json

        assert "curve_lights" not in _json.loads(
            EditParams().to_json())

    def test_kernel_parity_with_curve(self, rng):
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import finish_extras_rgba_words
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        words = (rng.integers(0, 2**24, (96, 128)).astype(np.uint32)
                 | np.uint32(0xFF000000))
        curve = (60.0, -20.0, 30.0, -50.0)
        ref = np.asarray(finish_extras_rgba_words(
            jnp.asarray(words), 40.0, 20.0, curve))
        got = np.asarray(pallas_finish_extras_rgba(
            jnp.asarray(words), 40.0, 20.0, curve, interpret=True))
        d = np.abs(ref.view(np.uint8).astype(int)
                   - got.view(np.uint8).astype(int))
        assert d.max() <= 1

    def test_batch_per_image_curves(self, rng):
        from raweditor_tpu.ops.develop import develop_rgba
        from raweditor_tpu.parallel.batch import (
            batch_develop_rgba,
            pack_params,
        )

        m = rng.integers(0, 4095, (2, 32, 48)).astype(np.uint16)
        wb = np.ones((2, 3), np.float32)
        cm = np.stack([np.eye(3, dtype=np.float32)] * 2)
        plist = [EditParams(curve_shadows=90.0),
                 EditParams(curve_highlights=-70.0)]
        out = np.asarray(batch_develop_rgba(
            m, pack_params(plist), wb, cm, extras=True))
        for i, p in enumerate(plist):
            single = np.asarray(develop_rgba(
                m[i], p, wb[i], cm[i], extras=True))
            assert (out[i] == single).all()


class TestVignette:
    def test_center_invariant_corners_scaled(self, rng):
        from raweditor_tpu.ops.extras import apply_finish_extras

        h, w = 65, 97  # odd dims -> exact center pixel
        r = g = b = np.full((h, w), 0.5, np.float32)
        out = apply_finish_extras(r, g, b, 0.0, 0.0,
                                  vignette=-100.0)
        y = 0.2126 * np.asarray(out[0]) + 0.7152 * np.asarray(out[1]) \
            + 0.0722 * np.asarray(out[2])
        assert abs(y[h // 2, w // 2] - 0.5) < 1e-3   # center unchanged
        assert y[0, 0] < 0.5 - 0.2                   # corner darkened
        lift = apply_finish_extras(r, g, b, 0.0, 0.0, vignette=100.0)
        y2 = 0.2126 * np.asarray(lift[0]) + 0.7152 * np.asarray(
            lift[1]) + 0.0722 * np.asarray(lift[2])
        assert y2[0, 0] > 0.5 + 0.2                  # corner lifted

    def test_zero_is_identity(self, rng):
        from raweditor_tpu.ops.extras import apply_finish_extras

        r, g, b = _rgb_planes(rng)
        out0 = apply_finish_extras(r, g, b, 0.0, 0.0, vignette=0.0)
        out = apply_finish_extras(r, g, b, 0.0, 0.0)
        for a, c in zip(out0, out):
            assert (np.asarray(a) == np.asarray(c)).all()

    def test_kernel_parity_with_vignette(self, rng):
        import jax.numpy as jnp

        from raweditor_tpu.ops.extras import finish_extras_rgba_words
        from raweditor_tpu.ops.pallas_develop import (
            pallas_finish_extras_rgba,
        )

        for shape in ((96, 128), (100, 130)):  # aligned + pad-rescued
            words = (rng.integers(0, 2**24, shape).astype(np.uint32)
                     | np.uint32(0xFF000000))
            ref = np.asarray(finish_extras_rgba_words(
                jnp.asarray(words), 0.0, 0.0, vignette=-80.0))
            got = np.asarray(pallas_finish_extras_rgba(
                jnp.asarray(words), 0.0, 0.0, vignette=-80.0,
                interpret=True))
            d = np.abs(ref.view(np.uint8).astype(int)
                       - got.view(np.uint8).astype(int))
            assert d.max() <= 1, shape

    def test_develop_and_params(self, rng):
        from raweditor_tpu.ops.develop import develop

        m = rng.integers(0, 4095, (32, 48)).astype(np.uint16)
        wb = np.ones(3, np.float32)
        cm = np.eye(3, dtype=np.float32)
        base = np.asarray(develop(m, EditParams(), wb, cm))
        e = np.asarray(develop(
            m, EditParams(vignette=-80.0), wb, cm, extras=True))
        assert (e != base).any()
        assert EditParams(vignette=5.0).has_finish_extras()
        p = EditParams(vignette=-25.0)
        assert EditParams.from_json(p.to_json()) == p


class TestClarity:
    def test_identity_and_local_contrast(self, rng):
        from raweditor_tpu.ops.extras import apply_clarity

        yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
        base = (0.4 + 0.2 * np.sin(xx / 5.0)).astype(np.float32)
        r = g = b = base
        out0 = apply_clarity(r, g, b, 0.0)
        assert max(float(np.abs(np.asarray(a) - base).max())
                   for a in out0) < 1e-6
        hi = apply_clarity(r, g, b, 80.0)
        lo = apply_clarity(r, g, b, -80.0)

        def std(t):
            return float((0.2126 * np.asarray(t[0])
                          + 0.7152 * np.asarray(t[1])
                          + 0.0722 * np.asarray(t[2])).std())

        assert std(lo) < base.std() < std(hi)

    def test_engine_fast_lane_clarity_only(self, tmp_path, rng):
        """Clarity-only params skip the stencil kernel but still
        change the output; matches the XLA in-chain render within
        2 LSB (quantize-between-stages)."""
        from raweditor_tpu.params import EditParams
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "c.dng"
        yy, xx = np.mgrid[0:64, 0:96]
        write_synthetic_raw(
            str(path),
            (800 + 1500 * np.sin(xx / 4.0) ** 2).astype(np.uint16))
        eng = DevelopEngine.open(str(path), mode="accurate")
        p = EditParams(clarity=70.0)
        base = np.asarray(eng.full_rgba_device(EditParams()))
        out = np.asarray(eng.full_rgba_device(p))
        assert (out != base).any()
        eng_fast = DevelopEngine.open(str(path), mode="accurate",
                                      use_pallas=True)
        fast = np.asarray(eng_fast.full_rgba_device(p))
        d = np.abs(fast.view(np.uint8).astype(int)
                   - out.view(np.uint8).astype(int))
        assert d.max() <= 2

    def test_batch_clarity_per_image(self, tmp_path, rng):
        from PIL import Image

        from raweditor_tpu.params import EditParams
        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )
        from raweditor_tpu.raw.synth import write_synthetic_raw

        paths, plist = [], [EditParams(clarity=80.0),
                            EditParams(clarity=-60.0)]
        for i in range(2):
            path = tmp_path / f"c{i}.dng"
            yy, xx = np.mgrid[0:64, 0:96]
            write_synthetic_raw(
                str(path),
                (700 + 1400 * np.sin((xx + 7 * i) / 4.0) ** 2).astype(
                    np.uint16))
            paths.append(str(path))
        jobs = [ExportJob(pth, str(tmp_path / f"b{i}.png"), plist[i])
                for i, pth in enumerate(paths)]
        rep = run_batch_export(jobs, batch_size=2)
        assert rep.succeeded == 2 and not rep.failed
        for i, pth in enumerate(paths):
            single = tmp_path / f"s{i}.png"
            DevelopEngine.open(pth).export(str(single), plist[i])
            a = np.asarray(Image.open(single))
            b = np.asarray(Image.open(tmp_path / f"b{i}.png"))
            assert (a == b).all()

    def test_params_contract(self):
        from raweditor_tpu.params import EditParams

        assert EditParams(clarity=10.0).has_finish_extras()
        p = EditParams(clarity=-33.0)
        assert EditParams.from_json(p.to_json()) == p


class TestExtrasReviewRegressions:
    def test_tone_curve_bounded_for_wild_sliders(self):
        """Out-of-range sliders (the engine accepts any float) must
        not push knots past the endpoints or invert the curve
        (code-review r3: four +600 sliders compounded the old cascade
        to k=1.002 and a negative top-segment slope)."""
        from raweditor_tpu.ops.extras import tone_curve

        y = np.linspace(0, 1, 2001).astype(np.float32)
        for c in ((600, 600, 600, 600), (-600, -600, -600, -600),
                  (600, -600, 600, -600)):
            out = np.asarray(tone_curve(y, c))
            assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6
            assert np.all(np.diff(out) >= -1e-6)

    def test_base_mode_skips_clarity_trace(self, rng):
        """extras='base' must not trace the clarity pyramid: the
        jaxpr of a base-mode develop contains no resize ops."""
        import jax

        from raweditor_tpu.ops.develop import develop

        m = rng.integers(0, 4095, (32, 48)).astype(np.uint16)
        wb = np.ones(3, np.float32)
        cm = np.eye(3, dtype=np.float32)
        base_jaxpr = str(jax.make_jaxpr(
            lambda mm, p: develop.__wrapped__(mm, p, wb, cm,
                                              extras="base"))(
            m, EditParams(sharpen=50.0)))
        full_jaxpr = str(jax.make_jaxpr(
            lambda mm, p: develop.__wrapped__(mm, p, wb, cm,
                                              extras="full"))(
            m, EditParams(clarity=50.0)))
        assert "resize" in full_jaxpr or "scale" in full_jaxpr or \
            "gather" in full_jaxpr
        assert base_jaxpr.count("resize") == 0

    def test_extras_mode_helper(self):
        assert EditParams().finish_extras_mode() is False
        assert EditParams(sharpen=10.0).finish_extras_mode() == "base"
        assert EditParams(clarity=10.0).finish_extras_mode() == "full"
        assert EditParams(sharpen=1.0,
                          clarity=1.0).finish_extras_mode() == "full"

    def test_cli_rotate_nan_usage_error(self):
        import argparse

        from raweditor_tpu.cli import _finite_rotate

        ns = argparse.Namespace(rotate=float("nan"))
        import pytest as _pytest

        with _pytest.raises(SystemExit):
            _finite_rotate(ns)
