"""Incremental SfM estimator: PnP RANSAC and end-to-end pose recovery."""

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.geometry import registration as reg
from multiview_tpu.sfm import incremental as inc
from multiview_tpu.sfm import ransac as ransac_mod


def _ring_scene(n_views=12, n_points=120, noise=0.0, seed=0):
    """Cameras on a ring looking at a central point cloud; every point is
    observed by every view (unit-plane observations)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1.0, 1.0, (n_points, 3))
    poses = np.zeros((n_views, 7))
    for v in range(n_views):
        ang = 2 * np.pi * v / n_views
        c = np.array([4.0 * np.sin(ang), 0.5 * np.sin(2 * ang),
                      4.0 * np.cos(ang)])
        # look-at the origin
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R = np.stack([right, upv, fwd])           # world->cam rows
        t = -R @ c
        q = np.asarray(pose_mod.matrix_to_quat(jnp.asarray(R)))
        poses[v] = np.concatenate([t, q])

    obs_cam, obs_pid, obs_uv = [], [], []
    for v in range(n_views):
        Xc = pts @ np.asarray(
            pose_mod.quat_to_matrix(jnp.asarray(poses[v, 3:]))).T + poses[v, :3]
        uv = Xc[:, :2] / Xc[:, 2:3]
        uv = uv + rng.normal(0, noise, uv.shape)
        obs_cam.extend([v] * n_points)
        obs_pid.extend(range(n_points))
        obs_uv.extend(uv)
    obs_cam = np.asarray(obs_cam); obs_pid = np.asarray(obs_pid)
    obs_uv = np.asarray(obs_uv)

    # pairwise matches: consecutive views (+ wraparound), shared pids
    pair_data = {}
    for v in range(n_views - 1):
        a = obs_uv[obs_cam == v]
        b = obs_uv[obs_cam == v + 1]
        pair_data[(v, v + 1)] = (a, b)
    return poses, pts, pair_data, (obs_cam, obs_pid, obs_uv)


def _ate_after_alignment(poses_est, poses_true, mask):
    cam_ctr = jax.vmap(lambda p: -pose_mod.quat_rotate(
        pose_mod.quat_conj(pose_mod.pose_q(p)), pose_mod.pose_t(p)))
    est = cam_ctr(jnp.asarray(poses_est)[mask])
    true = cam_ctr(jnp.asarray(poses_true)[mask])
    scale, spose = reg.find_similarity_transform(est, true)
    aligned = reg.apply_similarity(scale, spose, est)
    return float(jnp.max(jnp.linalg.norm(aligned - true, axis=-1)))


class TestPnpRansac:
    def test_recovers_pose_with_outliers(self):
        rng = np.random.default_rng(3)
        X = rng.uniform(-1, 1, (200, 3)); X[:, 2] += 5.0
        ax = np.asarray([0.3, -0.2, 0.1]); ang = np.linalg.norm(ax)
        q = jnp.asarray(list(np.sin(ang / 2) * ax / ang) + [np.cos(ang / 2)])
        t = jnp.asarray([0.4, -0.1, 0.6])
        R = np.asarray(pose_mod.quat_to_matrix(q))
        Xc = X @ R.T + np.asarray(t)
        x = Xc[:, :2] / Xc[:, 2:3]
        out = rng.random(200) < 0.3
        x[out] += rng.uniform(0.05, 0.3, (out.sum(), 2)) * \
            rng.choice([-1, 1], (out.sum(), 2))
        res = ransac_mod.ransac_pnp(jnp.asarray(X), jnp.asarray(x),
                                    threshold=2e-3)
        assert int(res.num_inliers) >= 0.9 * (200 - out.sum())
        assert float(jnp.linalg.norm(pose_mod.pose_t(res.pose) - t)) < 1e-3
        assert float(jnp.abs(jnp.dot(pose_mod.pose_q(res.pose), q))) > 1 - 1e-6


class TestIncrementalSfm:
    def test_noise_free_ring(self):
        poses_true, pts, pair_data, track_obs = _ring_scene()
        opts = inc.IncrementalOptions(min_pnp_inliers=20)
        poses, registered, points, point_valid = inc.run_incremental_sfm(
            pair_data, len(poses_true), track_obs, opts)
        assert registered.sum() == len(poses_true), registered
        ate = _ate_after_alignment(poses, poses_true, registered)
        assert ate < 1e-6, f"ATE {ate}"
        assert point_valid.sum() >= 0.95 * len(pts)

    def test_noisy_ring_with_bad_matches(self):
        poses_true, pts, pair_data, track_obs = _ring_scene(noise=1e-3, seed=1)
        # corrupt 10% of the track observations
        rng = np.random.default_rng(2)
        obs_cam, obs_pid, obs_uv = track_obs
        bad = rng.random(len(obs_cam)) < 0.10
        obs_uv = obs_uv.copy()
        obs_uv[bad] += rng.uniform(0.05, 0.2, (bad.sum(), 2)) * \
            rng.choice([-1, 1], (bad.sum(), 2))
        opts = inc.IncrementalOptions(min_pnp_inliers=20,
                                      reproj_threshold=5e-3)
        poses, registered, points, point_valid = inc.run_incremental_sfm(
            pair_data, len(poses_true), (obs_cam, obs_pid, obs_uv), opts)
        assert registered.sum() == len(poses_true)
        ate = _ate_after_alignment(poses, poses_true, registered)
        # ~1e-3 unit-plane noise at ~4m range -> mm-level center error
        assert ate < 0.05, f"ATE {ate}"
