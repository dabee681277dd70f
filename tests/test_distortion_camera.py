"""Tests for distortion models and camera frame conversions.

Parity targets: the reference formulas in
/root/reference/camera_model/camera_params.cc:260-355 and
rpc_distortion.cc:116-160, re-derived independently in numpy here.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multiview_tpu.geometry import distortion as D
from multiview_tpu.geometry.camera import (
    CameraParams, RAW, DISTORTED, DISTORTED_C, UNDISTORTED, UNDISTORTED_C,
    undistortion_remap_grid,
)

IMG = (1280, 960)
FOCAL = (600.0, 610.0)
CENTER = (640.5, 470.2)  # deliberately off-center optical offset


def make_cam(coeffs):
    return CameraParams.create(IMG, FOCAL, CENTER, coeffs)


class TestDispatch:
    def test_model_from_num_coeffs(self):
        assert D.model_from_num_coeffs(0) == "none"
        assert D.model_from_num_coeffs(1) == "fov"
        assert D.model_from_num_coeffs(4) == "tsai"
        assert D.model_from_num_coeffs(5) == "tsai"
        assert D.model_from_num_coeffs(12) == "rpc"
        with pytest.raises(ValueError):
            D.model_from_num_coeffs(3)
        with pytest.raises(ValueError):
            D.model_from_num_coeffs(7)

    def test_rpc_degree_math(self):
        # rpc_distortion.cc:43-49
        for deg in range(1, 6):
            n = D.rpc_num_params_from_degree(deg)
            assert D.rpc_degree_from_num_params(n) == deg
        assert D.rpc_num_params_from_degree(1) == 10


class TestNoDistortion:
    def test_roundtrip_and_offset(self):
        cam = make_cam(())
        pix = jnp.array([[12.3, -45.6], [0.0, 0.0], [300.0, 200.0]])
        d = cam.distort_centered(pix)
        # none model: distorted = undistorted + optical_offset - half_size
        expected = np.asarray(pix) + (np.array(CENTER) - np.array(IMG) / 2.0)
        np.testing.assert_allclose(d, expected, atol=1e-12)
        np.testing.assert_allclose(cam.undistort_centered(d), pix, atol=1e-12)


class TestFov:
    def test_matches_reference_formula(self):
        cam = make_cam((0.9,))
        pix = np.array([[100.0, 50.0], [-200.0, 300.0], [5.0, -3.0]])
        out = np.asarray(cam.distort_centered(jnp.array(pix)))
        # independent numpy re-derivation of camera_params.cc:269-281
        c0 = 0.9
        pre1, pre2 = 1 / c0, 2 * np.tan(c0 / 2)
        norm = pix / np.array(FOCAL)
        ru = np.linalg.norm(norm, axis=-1)
        rd = np.arctan(ru * pre2) * pre1
        conv = np.where(ru > 1e-5, rd / ru, 1.0)
        expected = (np.array(CENTER) - np.array(IMG) / 2.0) + conv[:, None] * norm * FOCAL
        np.testing.assert_allclose(out, expected, atol=1e-12)

    def test_roundtrip(self):
        cam = make_cam((0.9,))
        pix = jnp.array([[100.0, 50.0], [-200.0, 300.0], [0.0, 0.0]])
        np.testing.assert_allclose(
            cam.undistort_centered(cam.distort_centered(pix)), pix, atol=1e-9)

    def test_center_ray_fixed_point(self):
        cam = make_cam((0.9,))
        d = cam.distort_centered(jnp.zeros(2))
        np.testing.assert_allclose(d, np.array(CENTER) - np.array(IMG) / 2.0, atol=1e-12)


class TestTsai:
    COEFFS = (-0.28, 0.07, 1.8e-4, -2.0e-4, 0.015)

    def test_matches_reference_formula(self):
        cam = make_cam(self.COEFFS)
        pix = np.array([[100.0, 50.0], [-200.0, 300.0], [5.0, -3.0]])
        out = np.asarray(cam.distort_centered(jnp.array(pix)))
        # independent re-derivation of camera_params.cc:282-308
        k1, k2, p1, p2, k3 = self.COEFFS
        norm = pix / np.array(FOCAL)
        r2 = np.sum(norm**2, axis=-1)
        radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
        dist = radial[:, None] * norm
        dist[:, 0] += 2 * p1 * norm[:, 0] * norm[:, 1] + p2 * (r2 + 2 * norm[:, 0] ** 2)
        dist[:, 1] += p1 * (r2 + 2 * norm[:, 1] ** 2) + 2 * p2 * norm[:, 0] * norm[:, 1]
        expected = dist * FOCAL + (np.array(CENTER) - np.array(IMG) / 2.0)
        np.testing.assert_allclose(out, expected, atol=1e-10)

    def test_roundtrip(self):
        cam = make_cam(self.COEFFS)
        pix = jnp.array([[100.0, 50.0], [-250.0, 300.0], [0.0, 0.0], [400.0, -350.0]])
        rt = cam.undistort_centered(cam.distort_centered(pix))
        np.testing.assert_allclose(rt, pix, atol=1e-6)

    def test_four_coeff_variant(self):
        cam = make_cam(self.COEFFS[:4])
        pix = jnp.array([[150.0, -80.0]])
        rt = cam.undistort_centered(cam.distort_centered(pix))
        np.testing.assert_allclose(rt, pix, atol=1e-6)


class TestRpc:
    def test_identity_params(self):
        params = D.rpc_identity_params(2)
        p = jnp.array([[17.0, -5.0], [0.3, 0.4]])
        np.testing.assert_allclose(D.compute_rpc(p, jnp.array(params)), p, atol=1e-12)

    def test_increment_degree_preserves_map(self):
        rng = np.random.default_rng(0)
        params = D.rpc_identity_params(1)
        params = params + rng.normal(size=params.shape) * 0.01
        up = D.rpc_increment_degree(params)
        assert up.shape[0] == D.rpc_num_params_from_degree(2)
        p = jnp.array([[1.3, -0.7]])
        np.testing.assert_allclose(
            D.compute_rpc(p, jnp.array(up)), D.compute_rpc(p, jnp.array(params)), atol=1e-12)

    def test_coefficient_ordering_matches_reference(self):
        """Degree-1 RPC: num = [c, x, y], den = 1 + [x, y] coeffs
        (rpc_distortion.cc:141-159)."""
        # num_x=[1,2,3], den_x=[4,5], num_y=[6,7,8], den_y=[9,10]
        coeffs = jnp.array([1., 2., 3., 4., 5., 6., 7., 8., 9., 10.])
        x, y = 0.3, -0.2
        out = np.asarray(D.compute_rpc(jnp.array([x, y]), coeffs))
        ex = (1 + 2 * x + 3 * y) / (1 + 4 * x + 5 * y)
        ey = (6 + 7 * x + 8 * y) / (1 + 9 * x + 10 * y)
        np.testing.assert_allclose(out, [ex, ey], atol=1e-12)

    def test_rpc_camera_roundtrip_with_fitted_identity(self):
        """RPC camera with identity distort+undistort halves behaves as a
        translation-only model like 'none' but through the rpc path."""
        ident = D.rpc_identity_params(1)
        cam = CameraParams.create(IMG, FOCAL, CENTER, np.concatenate([ident, ident]))
        assert cam.model == "rpc"
        pix = jnp.array([[10.0, 20.0]])
        np.testing.assert_allclose(cam.distort_centered(pix), pix, atol=1e-12)
        np.testing.assert_allclose(cam.undistort_centered(pix), pix, atol=1e-12)


class TestFrameConversions:
    def test_all_frames_consistent(self):
        cam = make_cam(TestTsai.COEFFS)
        pix_raw = jnp.array([[321.0, 250.0]])
        # RAW -> DISTORTED -> UNDISTORTED -> back
        und = cam.convert(pix_raw, RAW, UNDISTORTED)
        back = cam.convert(und, UNDISTORTED, RAW)
        np.testing.assert_allclose(back, pix_raw, atol=1e-6)

    def test_distorted_to_undistorted_c_path(self):
        cam = make_cam((0.9,))
        pix = jnp.array([[700.0, 500.0]])
        a = cam.convert(pix, DISTORTED, UNDISTORTED_C)
        b = cam.convert(cam.convert(pix, DISTORTED, DISTORTED_C), DISTORTED_C, UNDISTORTED_C)
        np.testing.assert_allclose(a, b, atol=1e-12)

    def test_intrinsic_matrices(self):
        cam = make_cam(())
        K = np.asarray(cam.intrinsic_matrix(DISTORTED))
        np.testing.assert_allclose(K[0, 0], FOCAL[0])
        np.testing.assert_allclose(K[1, 1], FOCAL[1])
        np.testing.assert_allclose(K[:2, 2], CENTER)
        Ku = np.asarray(cam.intrinsic_matrix(UNDISTORTED))
        np.testing.assert_allclose(Ku[:2, 2], np.array(IMG) / 2.0)
        Kc = np.asarray(cam.intrinsic_matrix(UNDISTORTED_C))
        np.testing.assert_allclose(Kc[:2, 2], 0.0)

    def test_projection_ray_roundtrip(self):
        cam = make_cam(TestTsai.COEFFS)
        X = jnp.array([[0.2, -0.1, 2.0], [0.05, 0.08, 1.5]])
        pix = cam.project_cam_to_dist_pix(X)
        rays = cam.ray_from_dist_pix(pix)
        Xn = np.asarray(X) / np.linalg.norm(np.asarray(X), axis=-1, keepdims=True)
        np.testing.assert_allclose(rays, Xn, atol=1e-7)


class TestRemap:
    def test_remap_grid_shape_and_center(self):
        cam = make_cam(())
        grid = undistortion_remap_grid(cam)
        assert grid.shape == (IMG[1], IMG[0], 2)
        # none model: dist = undist - half_u + offset ... check one pixel
        u = np.array([100.0, 200.0])
        expected = (u - np.array(IMG) / 2.0) + (np.array(CENTER) - np.array(IMG) / 2.0) \
            + np.array(IMG) / 2.0
        np.testing.assert_allclose(grid[200, 100], expected, atol=1e-9)
