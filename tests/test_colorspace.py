"""Wide-gamut output (Display P3 / Adobe RGB) + embedded ICC profiles.

Beyond the reference, which is sRGB-only (and nominally so — its color
matrix is bypassed, reference: color.rs:36-47). The acceptance bar:
a wide-gamut export converted back to sRGB through its OWN embedded
profile must match the direct sRGB render within 1 LSB on in-gamut
pixels (lcms is the independent referee).
"""

import io
import os

import numpy as np
import pytest

from raweditor_tpu.params import EditParams

_MILD_CAM = np.array([[0.9, 0.06, 0.04],
                      [0.05, 0.9, 0.05],
                      [0.04, 0.06, 0.9]])


def _lcms():
    try:
        from PIL import ImageCms  # noqa: F401

        return True
    except Exception:
        return False


class TestColorMath:
    def test_derivation_matches_iec_srgb(self):
        from raweditor_tpu.color import (SRGB_TO_XYZ, _D65_XY,
                                         _rgb_to_xyz_from_chromaticities)

        derived = _rgb_to_xyz_from_chromaticities(
            ((0.640, 0.330), (0.300, 0.600), (0.150, 0.060)), _D65_XY)
        # The published IEC matrix is rounded to 4 decimals.
        assert np.abs(derived - SRGB_TO_XYZ.astype(np.float64)).max() < 1e-4

    def test_white_preserved(self):
        from raweditor_tpu.color import (ADOBE_RGB_TO_XYZ,
                                         DISPLAY_P3_TO_XYZ)

        for m in (DISPLAY_P3_TO_XYZ, ADOBE_RGB_TO_XYZ):
            w = m @ np.ones(3)
            assert abs(w[1] - 1.0) < 1e-9  # Y of white = 1

    def test_cam_matrix_white_preserving(self):
        from raweditor_tpu.color import cam_to_output_matrix

        for cs in ("srgb", "display-p3", "adobe-rgb"):
            m = cam_to_output_matrix(_MILD_CAM, "accurate", cs)
            camwhite = np.linalg.inv(m.astype(np.float64)) @ np.ones(3)
            assert np.abs(m @ camwhite - 1.0).max() < 1e-5

    def test_parity_rejects_wide_gamut(self):
        from raweditor_tpu.color import cam_to_output_matrix

        with pytest.raises(ValueError):
            cam_to_output_matrix(_MILD_CAM, "parity", "display-p3")

    def test_adobe_gamma_exact_value(self):
        from raweditor_tpu.color import ADOBE_GAMMA, adobe_gamma_encode

        assert ADOBE_GAMMA == 563.0 / 256.0
        x = np.array([0.0, 0.25, 1.0])
        got = np.asarray(adobe_gamma_encode(x))
        assert np.allclose(got, x ** (256.0 / 563.0))


class TestProfiles:
    @pytest.mark.skipif(not _lcms(), reason="no lcms in PIL")
    def test_profiles_parse(self):
        from PIL import ImageCms

        from raweditor_tpu.icc import profile_bytes

        for cs, name in (("srgb", "sRGB"), ("display-p3", "Display P3"),
                         ("adobe-rgb", "Adobe RGB")):
            prof = ImageCms.ImageCmsProfile(io.BytesIO(profile_bytes(cs)))
            assert name in ImageCms.getProfileDescription(prof)

    @pytest.mark.skipif(not _lcms(), reason="no lcms in PIL")
    def test_profile_colorimetry_vs_analytic(self):
        """lcms conversion through our profile == the analytic
        matrix+transfer math, per pixel exactly."""
        from PIL import Image, ImageCms

        from raweditor_tpu.color import (DISPLAY_P3_TO_XYZ, SRGB_TO_XYZ,
                                         srgb_decode, srgb_encode)
        from raweditor_tpu.icc import profile_bytes

        srgb_prof = ImageCms.createProfile("sRGB")
        prof = ImageCms.ImageCmsProfile(
            io.BytesIO(profile_bytes("display-p3")))
        rng = np.random.default_rng(0)
        for _ in range(8):
            c = tuple(int(v) for v in rng.integers(30, 226, 3))
            im = Image.new("RGB", (1, 1), c)
            out = ImageCms.profileToProfile(
                im, prof, srgb_prof,
                renderingIntent=ImageCms.Intent.RELATIVE_COLORIMETRIC)
            got = np.array(out)[0, 0].astype(int)
            lin = srgb_decode(np.array(c) / 255.0)
            xyz = DISPLAY_P3_TO_XYZ @ lin
            srgb_lin = np.linalg.inv(
                SRGB_TO_XYZ.astype(np.float64)) @ xyz
            want = np.round(np.asarray(
                srgb_encode(np.clip(srgb_lin, 0, 1))) * 255).astype(int)
            assert np.abs(got - want).max() <= 1

    def test_jpeg_splice(self):
        from raweditor_tpu.icc import profile_bytes, splice_icc_jpeg

        icc = profile_bytes("adobe-rgb")
        jpeg = b"\xff\xd8\xff\xdbrest"
        out = splice_icc_jpeg(jpeg, icc)
        assert out.startswith(b"\xff\xd8\xff\xe2")
        assert b"ICC_PROFILE\0" in out
        # Large profiles chunk under the 64 KB marker limit.
        big = bytes(200_000)
        out = splice_icc_jpeg(jpeg, big)
        assert out.count(b"ICC_PROFILE\0") == 4  # ceil(200000/65517)


class TestEngineAndBatch:
    @pytest.fixture
    def raw_path(self, tmp_path):
        from raweditor_tpu.raw.synth import write_synthetic_raw

        yy, xx = np.mgrid[0:64, 0:96]
        mosaic = (600 + 1400 * (xx / 96) * (yy / 64)).astype(np.uint16)
        path = tmp_path / "c.dng"
        write_synthetic_raw(str(path), mosaic, wb_neutral=(1.0, 1.0, 1.0),
                            xyz_to_cam=_MILD_CAM)
        return str(path)

    @pytest.mark.skipif(not _lcms(), reason="no lcms in PIL")
    def test_round_trip_to_srgb_within_1lsb(self, raw_path, tmp_path):
        from PIL import Image, ImageCms

        from raweditor_tpu.pipeline.engine import DevelopEngine

        p = EditParams()
        srgb_out = tmp_path / "srgb.png"
        DevelopEngine.open(raw_path, mode="accurate",
                           transfer="srgb").export(str(srgb_out), p)
        ref = np.asarray(Image.open(srgb_out).convert("RGB")).astype(int)
        interior = ((ref > 10) & (ref < 245)).all(axis=-1)
        assert interior.mean() > 0.9  # the fixture is in-gamut

        srgb_prof = ImageCms.createProfile("sRGB")
        for cs in ("display-p3", "adobe-rgb"):
            eng = DevelopEngine.open(raw_path, mode="accurate",
                                     color_space=cs)
            out = tmp_path / f"{cs}.png"
            eng.export(str(out), p)
            im = Image.open(out).convert("RGB")
            icc = im.info.get("icc_profile")
            assert icc  # wide gamut must always be tagged
            prof = ImageCms.ImageCmsProfile(io.BytesIO(icc))
            back = np.asarray(ImageCms.profileToProfile(
                im, prof, srgb_prof,
                renderingIntent=ImageCms.Intent.RELATIVE_COLORIMETRIC,
            )).astype(int)
            assert np.abs(back - ref)[interior].max() <= 1

    def test_all_formats_tagged(self, raw_path, tmp_path):
        from PIL import Image

        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate",
                                 color_space="display-p3")
        for ext in ("jpg", "png", "tiff"):
            out = tmp_path / f"t.{ext}"
            eng.export(str(out), EditParams(), quality=95)
            assert Image.open(out).info.get("icc_profile")

    def test_srgb_default_untagged_and_unchanged(self, raw_path,
                                                 tmp_path):
        from PIL import Image

        from raweditor_tpu.pipeline.engine import DevelopEngine

        eng = DevelopEngine.open(raw_path, mode="accurate")
        out = tmp_path / "plain.png"
        eng.export(str(out), EditParams())
        assert not Image.open(out).info.get("icc_profile")

    def test_parity_guard(self, raw_path):
        from raweditor_tpu.pipeline.engine import DevelopEngine

        with pytest.raises(ValueError):
            DevelopEngine.open(raw_path, mode="parity",
                               color_space="adobe-rgb")

    def test_batch_matches_engine(self, raw_path, tmp_path):
        from PIL import Image

        from raweditor_tpu.pipeline.engine import DevelopEngine
        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )

        p = EditParams(exposure=0.1)
        single = tmp_path / "single.png"
        DevelopEngine.open(raw_path, mode="accurate",
                           color_space="display-p3").export(
                               str(single), p)
        batch_out = tmp_path / "batch.png"
        rep = run_batch_export(
            [ExportJob(raw_path, str(batch_out), p)], batch_size=1,
            mode="accurate", color_space="display-p3")
        assert rep.succeeded == 1 and not rep.failed
        a = np.asarray(Image.open(single).convert("RGB"))
        b = np.asarray(Image.open(batch_out).convert("RGB"))
        assert (a == b).all()
        assert Image.open(batch_out).info.get("icc_profile")

    def test_batch_jpeg_native_path_tagged(self, raw_path, tmp_path):
        from PIL import Image

        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )

        out = tmp_path / "n.jpg"
        rep = run_batch_export(
            [ExportJob(raw_path, str(out))], batch_size=1,
            mode="accurate", color_space="adobe-rgb")
        assert rep.succeeded == 1
        assert Image.open(out).info.get("icc_profile")

    def test_batch_tiff16_tagged(self, raw_path, tmp_path):
        from PIL import Image

        from raweditor_tpu.pipeline.export import (
            ExportJob,
            run_batch_export,
        )

        out = tmp_path / "w.tif"
        rep = run_batch_export(
            [ExportJob(raw_path, str(out))], batch_size=1,
            mode="accurate", bits=16, color_space="display-p3")
        assert rep.succeeded == 1
        assert Image.open(out).info.get("icc_profile")


class TestReviewRegressions:
    def test_identity_metadata_uses_srgb_bridge(self):
        """No/broken camera metadata (identity xyz_to_cam) must map
        sRGB-valued pixels INTO the wide-gamut space, not tag them as
        wide gamut unchanged (code-review r3)."""
        from raweditor_tpu.color import (DISPLAY_P3_TO_XYZ, SRGB_TO_XYZ,
                                         cam_to_output_matrix)

        m = cam_to_output_matrix(np.eye(3), "accurate", "display-p3")
        bridge = (np.linalg.inv(DISPLAY_P3_TO_XYZ)
                  @ SRGB_TO_XYZ.astype(np.float64))
        assert np.abs(m - bridge).max() < 1e-4
        assert not np.allclose(m, np.eye(3), atol=1e-3)
        # White is preserved by the bridge — to the accuracy of the
        # published 4-decimal IEC sRGB constants (their white isn't
        # exactly D65; ~1e-4 ≪ 1 u8 LSB).
        assert np.abs(m @ np.ones(3) - 1.0).max() < 5e-4

    def test_srgb_matrix_helper_delegates(self):
        from raweditor_tpu.color import (cam_to_output_matrix,
                                         cam_to_srgb_matrix)

        assert (cam_to_srgb_matrix(_MILD_CAM, "accurate")
                == cam_to_output_matrix(_MILD_CAM, "accurate",
                                        "srgb")).all()

    def test_desc_tag_v2_layout(self):
        """textDescriptionType: 4 sig + 4 reserved + 4 count + ascii +
        78-byte tail (strict CMMs validate the size; code-review r3)."""
        from raweditor_tpu.icc import _desc_tag

        tag = _desc_tag("X")
        assert len(tag) == 12 + 2 + 78

    @pytest.fixture
    def raw_path(self, tmp_path, rng):
        from raweditor_tpu.raw.synth import write_synthetic_raw

        path = tmp_path / "r.dng"
        write_synthetic_raw(
            str(path),
            rng.integers(0, 4095, (64, 96)).astype(np.uint16),
            xyz_to_cam=_MILD_CAM)
        return str(path)

    def test_cli_preview_embeds_profile(self, raw_path, tmp_path,
                                        capsys):
        from PIL import Image

        from raweditor_tpu.cli import main

        out = tmp_path / "p.png"
        rc = main(["develop", raw_path, "-o", str(out), "--preview",
                   "--mode", "accurate", "--color-space", "display-p3"])
        assert rc == 0
        assert Image.open(out).info.get("icc_profile")

    def test_cli_parity_wide_gamut_usage_error(self, raw_path,
                                               tmp_path):
        from raweditor_tpu.cli import main

        with pytest.raises(SystemExit):
            main(["develop", raw_path, "-o", str(tmp_path / "x.jpg"),
                  "--color-space", "adobe-rgb"])  # default parity mode
