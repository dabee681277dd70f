"""Tests for the small parity helpers: depth lookup, exposure, match files,
pose storage, FoV check."""

import numpy as np
import jax.numpy as jnp
import pytest

from multiview_tpu.utils import images as im
from multiview_tpu.io import match_file as mf
from multiview_tpu.calib.pose_storage import StampedPoseStorage, max_rotation_angle
from multiview_tpu.geometry.camera import CameraParams
from multiview_tpu.geometry import pose as P


class TestDepthValue:
    def test_lookup_and_invalid(self):
        cloud = np.zeros((4, 5, 3), np.float32)
        cloud[2, 3] = [1.0, 2.0, 3.0]
        np.testing.assert_array_equal(im.depth_value(cloud, (3.2, 2.1)), [1, 2, 3])
        assert im.depth_value(cloud, (0, 0)) is None  # (0,0,0) invalid
        assert im.depth_value(None, (0, 0)) is None
        assert im.depth_value(cloud, (4.6, 3.6)) is None  # rounds to bound
        with pytest.raises(ValueError):
            im.depth_value(cloud, (-2, 0))

    def test_batch(self):
        cloud = np.zeros((4, 5, 3), np.float32)
        cloud[1, 1] = [1, 1, 1]
        xyz, valid = im.depth_values_batch(cloud, np.array([[1.0, 1.0], [0.0, 0.0]]))
        assert valid.tolist() == [True, False]


class TestExposure:
    def test_identity_when_matched(self):
        img = np.random.default_rng(0).integers(0, 255, (8, 8, 3)).astype(np.uint8)
        out = im.exposure_correction(100.0, 10.0, 10.0, img)
        np.testing.assert_array_equal(out, img)

    def test_brightens(self):
        img = np.full((4, 4), 100, np.uint8)
        out = im.exposure_correction(400.0, 10.0, 10.0, img)
        assert out.mean() > img.mean()

    def test_srgb_piecewise_matches_reference(self):
        """Exact sRGB transfer pair (dense_map_utils.cc:572-587): linear
        segment below the breakpoints, power law above, and round-trip
        identity."""
        assert im.srgb_gamma(0.001) == 12.92 * 0.001
        np.testing.assert_allclose(im.srgb_gamma(0.5),
                                   1.055 * 0.5 ** (1 / 2.4) - 0.055)
        assert im.srgb_inv_gamma(0.04) == 0.04 / 12.92
        np.testing.assert_allclose(im.srgb_inv_gamma(0.5),
                                   ((0.5 + 0.055) / 1.055) ** 2.4)
        x = np.linspace(0.0, 1.0, 64)
        np.testing.assert_allclose(im.srgb_gamma(im.srgb_inv_gamma(x)), x,
                                   atol=1e-9)

    def test_scale_image(self):
        img = np.full((4, 4), 100, np.uint8)
        out = im.scale_image(400.0, 10.0, 10.0, img)
        np.testing.assert_allclose(out, round(100 * 4 ** (1 / 2.2)), atol=1)

    def test_pick_timestamps(self):
        out = im.pick_timestamps_in_bounds([0.0, 1.0, 2.0, 3.0], 0.5, 2.5, 0.0)
        assert out == [1.0, 2.0]
        assert im.pick_timestamps_in_bounds([5.0], 0.0, 1.0, -4.5) == [5.0]


class TestMatchFile:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        a = rng.uniform(0, 100, (7, 2))
        b = rng.uniform(0, 100, (7, 2))
        p = tmp_path / "x.match"
        mf.write_match_file(p, a, b)
        a2, b2 = mf.read_match_file(p)
        np.testing.assert_allclose(a2, a, atol=1e-4)
        np.testing.assert_allclose(b2, b, atol=1e-4)

    def test_match_file_name(self):
        p = mf.match_file_name("/out", "nav_cam/100.0.jpg", "sci_cam/101.0.jpg")
        assert p.name == "nav_cam__100.0__sci_cam__101.0.match"


class TestPoseStorage:
    def test_interp(self):
        st = StampedPoseStorage()
        p0 = np.asarray(P.make_pose(jnp.asarray([0., 0, 0]), P.quat_identity(jnp.float64)))
        p1 = np.asarray(P.make_pose(jnp.asarray([2., 0, 0]), P.quat_identity(jnp.float64)))
        st.add(1.0, p1)  # out-of-order insert
        st.add(0.0, p0)
        mid = st.interp_pose(0.5)
        np.testing.assert_allclose(mid[:3], [1.0, 0, 0], atol=1e-12)
        assert st.interp_pose(-0.1) is None
        assert st.interp_pose(1.1) is None
        np.testing.assert_allclose(st.interp_pose(1.0), p1)

    def test_max_rotation_angle(self):
        a = np.asarray(P.make_pose(jnp.zeros(3), P.quat_identity(jnp.float64)))
        b = np.asarray(P.make_pose(jnp.zeros(3),
                                   P.quat_exp(jnp.asarray([0.0, 0.0, np.pi / 2]))))
        np.testing.assert_allclose(max_rotation_angle(a, b), 90.0, atol=1e-9)


class TestFov:
    def test_is_in_fov(self):
        cam = CameraParams.create((100, 80), 50.0, (50.0, 40.0))
        X = jnp.asarray([[0.0, 0.0, 1.0],     # center: in
                         [0.0, 0.0, -1.0],    # behind: out
                         [5.0, 0.0, 1.0]])    # far off-axis: out
        out = np.asarray(cam.is_in_fov(X))
        assert out.tolist() == [True, False, False]


class TestAdjustImageSize:
    """adjustImageSize parity (dense_map_utils.cc:1404-1431)."""

    def test_integer_factor_downsample(self):
        from multiview_tpu.utils.images import adjust_image_size
        img = np.arange(24, dtype=np.float32).reshape(4, 6)
        out = adjust_image_size((3, 2), img)     # (W,H) = (3,2), factor 2
        assert out.shape == (2, 3)
        # block means of 2x2 tiles
        np.testing.assert_allclose(out[0, 0], np.mean(img[:2, :2]))

    def test_factor_one_passthrough(self):
        from multiview_tpu.utils.images import adjust_image_size
        img = np.zeros((10, 20))
        assert adjust_image_size((20, 10), img) is img

    def test_non_integer_factor_fatal(self):
        from multiview_tpu.utils.images import adjust_image_size
        import pytest
        with pytest.raises(ValueError):
            adjust_image_size((7, 3), np.zeros((9, 20)))

    def test_color_image(self):
        from multiview_tpu.utils.images import adjust_image_size
        img = np.ones((4, 4, 3), np.uint8) * 7
        out = adjust_image_size((2, 2), img)
        assert out.shape == (2, 2, 3) and out.dtype == np.uint8
        assert (out == 7).all()
