import numpy as np

from raweditor_tpu.color import (
    XYZ_TO_SRGB,
    cam_to_srgb_matrix,
    is_identity_matrix,
    srgb_decode,
    srgb_encode,
    gamma22_encode,
)


def test_identity_matrix_detection():
    # reference: color.rs:185-191
    assert is_identity_matrix(np.eye(3))
    m = np.eye(3)
    m[0, 0] = 1.5
    assert not is_identity_matrix(m)


def test_parity_mode_returns_identity():
    # The shipped reference bypasses the matrix math
    # (reference: color.rs:36-47).
    xyz_to_cam = np.array([[0.7, 0.2, 0.1], [0.3, 0.9, -0.2], [0.0, 0.1, 0.8]])
    assert np.allclose(cam_to_srgb_matrix(xyz_to_cam, mode="parity"), np.eye(3))


def test_accurate_mode_identity_passthrough():
    assert np.allclose(cam_to_srgb_matrix(np.eye(3), mode="accurate"), np.eye(3))


def test_accurate_mode_white_preserving():
    # D3300-like xyz_to_cam (dcraw-style units).
    xyz_to_cam = np.array(
        [[0.6988, -0.1384, -0.0714], [-0.5631, 1.3410, 0.2447],
         [-0.1485, 0.2204, 0.7318]]
    )
    m = cam_to_srgb_matrix(xyz_to_cam, mode="accurate")
    # Row-normalized inversion maps camera white to sRGB white.
    white = m @ np.ones(3)
    assert np.allclose(white, np.ones(3), atol=1e-4)
    assert not is_identity_matrix(m)


def test_accurate_mode_10000_scaled_input():
    xyz_to_cam = np.array(
        [[6988.0, -1384.0, -714.0], [-5631.0, 13410.0, 2447.0],
         [-1485.0, 2204.0, 7318.0]]
    )
    m_scaled = cam_to_srgb_matrix(xyz_to_cam, mode="accurate")
    m_unscaled = cam_to_srgb_matrix(xyz_to_cam / 10000.0, mode="accurate")
    assert np.allclose(m_scaled, m_unscaled, atol=1e-5)


def test_accurate_mode_singular_falls_back_to_identity():
    assert np.allclose(
        cam_to_srgb_matrix(np.zeros((3, 3)) + 0.5, mode="accurate"), np.eye(3)
    )


def test_srgb_transfer_round_trip():
    x = np.linspace(0, 1, 257, dtype=np.float32)
    assert np.allclose(srgb_decode(srgb_encode(x)), x, atol=1e-5)


def test_gamma22_clamps_negatives():
    out = gamma22_encode(np.array([-0.5, 0.0, 0.25], dtype=np.float32))
    assert out[0] == 0.0
    assert np.isfinite(out).all()


def test_xyz_to_srgb_matches_iec_constants():
    # reference: color.rs:13-17
    assert XYZ_TO_SRGB[0, 0] == np.float32(3.2406)
    assert XYZ_TO_SRGB[2, 1] == np.float32(-0.2040)


class TestGamma22Poly:
    """gamma22_poly_encode: polynomial fast path vs the exact pow."""

    def test_u8_within_1lsb_dense(self):
        from raweditor_tpu.color import gamma22_encode, gamma22_poly_encode

        x = np.linspace(0.0, 1.0, 2_000_003).astype(np.float32)
        exact = np.floor(np.asarray(gamma22_encode(x)) * 255.0 + 0.5)
        fast = np.floor(np.asarray(gamma22_poly_encode(x)) * 255.0 + 0.5)
        diff = np.abs(exact - fast)
        assert diff.max() <= 1
        assert (diff == 0).mean() > 0.99

    def test_out_of_range_clamped(self):
        from raweditor_tpu.color import gamma22_poly_encode

        y = np.asarray(gamma22_poly_encode(
            np.array([-0.5, 0.0, 1.0, 2.5], np.float32)))
        assert abs(y[0] - y[1]) < 1e-6  # negatives clamp to 0's value
        assert abs(y[2] - y[3]) < 1e-6  # >1 clamps to 1's value
        assert y[1] < 0.01 and 0.99 < y[2] < 1.01

    def test_monotonic(self):
        from raweditor_tpu.color import gamma22_poly_encode

        x = np.linspace(0.0, 1.0, 100_001).astype(np.float32)
        y = np.asarray(gamma22_poly_encode(x))
        assert (np.diff(y) >= -1e-6).all()


class TestSrgbPoly:
    """srgb_poly_encode: fast IEC 61966-2-1 (exact linear segment +
    polynomial pow branch) vs the exact transfer."""

    def test_u8_within_1lsb_dense(self):
        from raweditor_tpu.color import srgb_encode, srgb_poly_encode

        x = np.linspace(0.0, 1.0, 2_000_003).astype(np.float32)
        exact = np.floor(np.asarray(srgb_encode(x)) * 255.0 + 0.5)
        fast = np.floor(np.asarray(srgb_poly_encode(x)) * 255.0 + 0.5)
        diff = np.abs(exact - fast)
        assert diff.max() <= 1
        assert (diff == 0).mean() > 0.999

    def test_linear_segment_exact(self):
        from raweditor_tpu.color import srgb_encode, srgb_poly_encode

        x = np.linspace(0.0, 0.0031308, 10_001).astype(np.float32)
        assert np.array_equal(np.asarray(srgb_poly_encode(x)),
                              np.asarray(srgb_encode(x)))

    def test_pow_branch_abs_error(self):
        from raweditor_tpu.color import srgb_encode, srgb_poly_encode

        x = np.linspace(0.0031309, 1.0, 500_001).astype(np.float32)
        err = np.abs(np.asarray(srgb_poly_encode(x))
                     - np.asarray(srgb_encode(x)))
        assert err.max() < 5e-6

    def test_out_of_range_clamped(self):
        from raweditor_tpu.color import srgb_poly_encode

        y = np.asarray(srgb_poly_encode(
            np.array([-0.5, 0.0, 1.0, 2.5], np.float32)))
        assert abs(y[0] - y[1]) < 1e-6
        assert abs(y[2] - y[3]) < 1e-6
        assert y[1] < 0.01 and 0.99 < y[2] < 1.01

    def test_monotonic(self):
        from raweditor_tpu.color import srgb_poly_encode

        x = np.linspace(0.0, 1.0, 100_001).astype(np.float32)
        y = np.asarray(srgb_poly_encode(x))
        assert (np.diff(y) >= -1e-6).all()
