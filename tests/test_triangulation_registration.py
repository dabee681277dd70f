"""Tests for N-view triangulation and similarity registration."""

import numpy as np
import jax.numpy as jnp

from multiview_tpu.geometry import pose as P
from multiview_tpu.geometry import triangulation as T
from multiview_tpu.geometry import registration as R


def look_at_pose(cam_pos, target=np.zeros(3)):
    """world->cam pose with +z axis toward target."""
    z = target - cam_pos
    z = z / np.linalg.norm(z)
    up = np.array([0.0, 0.0, 1.0]) if abs(z[2]) < 0.9 else np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R_c2w = np.stack([x, y, z], axis=1)  # columns are cam axes in world
    R_w2c = R_c2w.T
    t = -R_w2c @ cam_pos
    return np.asarray(P.make_pose(jnp.array(t), P.matrix_to_quat(jnp.array(R_w2c))))


class TestTriangulation:
    def _setup(self, n_cams=4, noise=0.0, seed=0):
        rng = np.random.default_rng(seed)
        focal = 500.0
        X = np.array([0.3, -0.2, 0.5])
        poses, pix = [], []
        for i in range(n_cams):
            ang = 2 * np.pi * i / n_cams
            cam_pos = np.array([3 * np.cos(ang), 3 * np.sin(ang), 0.4 * i])
            w2c = look_at_pose(cam_pos)
            Xc = np.asarray(P.pose_apply(jnp.array(w2c), jnp.array(X)))
            p = focal * Xc[:2] / Xc[2] + noise * rng.normal(size=2)
            poses.append(w2c)
            pix.append(p)
        return focal, np.array(poses), np.array(pix), X

    def test_exact_recovery(self):
        focal, poses, pix, X = self._setup()
        Pm = T.projection_matrix(jnp.full(len(poses), focal), jnp.array(poses))
        xyz, min_depth, valid = T.triangulate_track(
            Pm, jnp.array(pix), jnp.ones(len(poses), bool))
        np.testing.assert_allclose(xyz, X, atol=1e-9)
        assert bool(valid)
        assert float(min_depth) > 0

    def test_masked_padding_ignored(self):
        focal, poses, pix, X = self._setup()
        # append garbage padded rows with mask False
        poses_p = np.concatenate([poses, 99 * np.ones((3, 7))])
        pix_p = np.concatenate([pix, 1e6 * np.ones((3, 2))])
        mask = np.array([True] * len(pix) + [False] * 3)
        Pm = T.projection_matrix(jnp.full(len(poses_p), focal), jnp.array(poses_p))
        xyz, _, valid = T.triangulate_track(Pm, jnp.array(pix_p), jnp.array(mask))
        np.testing.assert_allclose(xyz, X, atol=1e-9)
        assert bool(valid)

    def test_fewer_than_two_views_invalid(self):
        focal, poses, pix, X = self._setup()
        mask = np.array([True] + [False] * (len(pix) - 1))
        Pm = T.projection_matrix(jnp.full(len(poses), focal), jnp.array(poses))
        _, _, valid = T.triangulate_track(Pm, jnp.array(pix), jnp.array(mask))
        assert not bool(valid)

    def test_noisy_recovery_batched(self):
        focal, poses, pix, X = self._setup(n_cams=6, noise=0.5)
        Pm = T.projection_matrix(jnp.full(len(poses), focal), jnp.array(poses))
        xyzs, _, valids = T.triangulate_tracks(
            jnp.stack([Pm, Pm]), jnp.stack([jnp.array(pix)] * 2),
            jnp.ones((2, len(poses)), bool), 3)
        assert np.all(np.asarray(valids))
        np.testing.assert_allclose(xyzs[0], X, atol=0.02)

    def test_pair_wrapper(self):
        focal, poses, pix, X = self._setup()
        xyz = T.triangulate_pair(focal, focal, jnp.array(poses[0]), jnp.array(poses[1]),
                                 jnp.array(pix[0]), jnp.array(pix[1]))
        np.testing.assert_allclose(xyz, X, atol=1e-9)

    def test_convergence_angle(self):
        # two cameras at 90 degrees to origin-point
        p0 = look_at_pose(np.array([2.0, 0.0, 0.0]))
        p1 = look_at_pose(np.array([0.0, 2.0, 0.0]))
        ang = T.convergence_angles(jnp.array([p0, p1]), jnp.zeros(3), jnp.ones(2, bool))
        np.testing.assert_allclose(float(ang), 90.0, atol=1e-6)


class TestRegistration:
    def test_similarity_recovery(self):
        rng = np.random.default_rng(1)
        src = rng.normal(size=(10, 3))
        true_q = P.quat_normalize(jnp.array(rng.normal(size=4)))
        true_t = jnp.array([0.5, -1.0, 2.0])
        true_s = 2.5
        dst = true_s * np.asarray(P.quat_rotate(true_q, jnp.array(src))) + np.asarray(true_t)
        scale, pose = R.find_similarity_transform(jnp.array(src), jnp.array(dst))
        np.testing.assert_allclose(float(scale), true_s, rtol=1e-9)
        out = R.apply_similarity(scale, pose, jnp.array(src))
        np.testing.assert_allclose(out, dst, atol=1e-9)

    def test_transform_cameras_consistency(self):
        """After registering world with T, camera projections of transformed
        points must be unchanged (TransformCameras semantics,
        interest_point.cc:997-1017)."""
        rng = np.random.default_rng(2)
        w2c = jnp.array(np.concatenate(
            [rng.normal(size=3), P.quat_normalize(jnp.array(rng.normal(size=4)))]))
        X = jnp.array(rng.normal(size=(5, 3)))

        scale = 3.0
        q = P.quat_normalize(jnp.array(rng.normal(size=4)))
        t = jnp.array(rng.normal(size=3))
        Tpose = P.make_pose(t, q)

        Xc_before = P.pose_apply(w2c, X)

        Xnew = R.transform_points(scale, Tpose, X)
        w2c_new = R.transform_cameras(scale, Tpose, w2c[None])[0]
        Xc_after = P.pose_apply(w2c_new, Xnew)
        # camera coords scale by the registration scale
        np.testing.assert_allclose(Xc_after, scale * Xc_before, atol=1e-9)

    def test_transform_rig_scales_translation_only(self):
        rng = np.random.default_rng(3)
        rig = jnp.array(np.concatenate(
            [rng.normal(size=3), P.quat_normalize(jnp.array(rng.normal(size=4)))]))[None]
        out = R.transform_rig(2.0, rig)
        np.testing.assert_allclose(P.pose_t(out), 2.0 * P.pose_t(rig), atol=1e-12)
        np.testing.assert_allclose(P.pose_q(out), P.pose_q(rig), atol=1e-12)


class TestPlaneUtils:
    """dense_map_utils.cc:452-508 parity (azimuth/elevation, snapping, fit)."""

    def test_azimuth_elevation_roundtrip(self):
        from multiview_tpu.geometry import plane
        rng = np.random.default_rng(0)
        n = rng.normal(size=(64, 3))
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        a, e = plane.normal_to_azimuth_elevation(jnp.asarray(n))
        back = np.asarray(plane.azimuth_elevation_to_normal(a, e))
        np.testing.assert_allclose(back, n, atol=1e-12)
        # the pole special case
        a0, e0 = plane.normal_to_azimuth_elevation(jnp.asarray([0.0, 0.0, -1.0]))
        assert float(a0) == 0.0 and float(e0) == -np.pi / 2

    def test_snap_plane_normal(self):
        from multiview_tpu.geometry import plane
        nearly_z = jnp.asarray([0.05, -0.03, 0.998])
        snapped = np.asarray(plane.snap_plane_normal(nearly_z))
        np.testing.assert_allclose(snapped, [0.0, 0.0, 1.0], atol=1e-12)
        diag = jnp.asarray([0.7, 0.02, 0.7])
        snapped = np.asarray(plane.snap_plane_normal(diag))
        s2 = np.sqrt(0.5)
        np.testing.assert_allclose(snapped, [s2, 0.0, s2], atol=1e-12)

    def test_best_fit_plane(self):
        from multiview_tpu.geometry import plane
        rng = np.random.default_rng(1)
        # points on z = 2 + 0.3x - 0.2y with tiny noise
        xy = rng.uniform(-1, 1, (200, 2))
        z = 2.0 + 0.3 * xy[:, 0] - 0.2 * xy[:, 1]
        pts = np.column_stack([xy, z + rng.normal(0, 1e-4, 200)])
        centroid, normal = plane.best_fit_plane(jnp.asarray(pts))
        n_true = np.array([-0.3, 0.2, 1.0])
        n_true /= np.linalg.norm(n_true)
        got = np.asarray(normal)
        got = got * np.sign(got @ n_true)
        np.testing.assert_allclose(got, n_true, atol=1e-3)
        resid = (pts - np.asarray(centroid)) @ got
        assert np.abs(resid).max() < 1e-3
