"""Hard-mode end-to-end accuracy: ATE of the sfm-init -> calibrate
trajectory vs ground truth on a stressed rendered scene (exposure/gamma
jitter, sensor noise, view rotations incl. accidental 90-degree up-flips,
low-texture patch) — the trajectory-quality bar of BASELINE.md, proxied on
rendered scenes (the reference's de-facto bar is residual stats on real ISS
data, rig_calibrator.cc:753-789).

Also unit-tests the planar two-view path (homography RANSAC +
Faugeras-Lustman decomposition) that makes these scenes solvable: the
8-point essential estimate is degenerate on near-planar scenes and its
rotation can be 10+ degrees off while fitting every correspondence.
"""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


class TestHomography:
    def _planar_pair(self, seed, noise=5e-4, n=200):
        from multiview_tpu.geometry import pose as P
        rng = np.random.default_rng(seed)
        pts = np.concatenate([rng.uniform(-1, 1, (n, 2)),
                              np.full((n, 1), 2.0)], 1)
        R = np.asarray(P.quat_to_matrix(P.quat_exp(
            jnp.asarray(rng.normal(0, 0.1, 3)))))
        t = rng.normal(0, 0.3, 3)
        p2 = pts @ R.T + t
        x1 = pts[:, :2] / pts[:, 2:] + rng.normal(0, noise, (n, 2))
        x2 = p2[:, :2] / p2[:, 2:] + rng.normal(0, noise, (n, 2))
        return x1, x2, R, t

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_decomposition_recovers_pose(self, seed):
        from multiview_tpu.sfm import ransac
        x1, x2, R, t = self._planar_pair(seed)
        res = ransac.ransac_homography(jnp.asarray(x1), jnp.asarray(x2),
                                       threshold=1e-5)
        assert int(res.num_inliers) > 180
        Rh, th, _ = ransac.decompose_homography(res.model, jnp.asarray(x1),
                                                jnp.asarray(x2), res.inliers)
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(Rh) @ R.T) - 1) / 2, -1, 1)))
        tdir = t / np.linalg.norm(t)
        terr = np.degrees(np.arccos(np.clip(
            abs(np.dot(np.asarray(th), tdir)), -1, 1)))
        assert ang < 0.5, f"rotation error {ang} deg"
        assert terr < 1.0, f"translation direction error {terr} deg"

    def test_model_selection_prefers_homography_on_planar(self):
        """On a planar pair both models explain all inliers, so the graph
        builder must take the homography decomposition."""
        from multiview_tpu.sfm import ransac
        x1, x2, R, t = self._planar_pair(3)
        res_e = ransac.ransac_essential(jnp.asarray(x1), jnp.asarray(x2),
                                        threshold=1e-5)
        res_h = ransac.ransac_homography(jnp.asarray(x1), jnp.asarray(x2),
                                         threshold=1e-5)
        assert int(res_h.num_inliers) >= 0.8 * int(res_e.num_inliers)

    def test_outlier_rejection(self):
        from multiview_tpu.sfm import ransac
        rng = np.random.default_rng(4)
        x1, x2, R, t = self._planar_pair(4)
        n_out = 40
        x2[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2))
        res = ransac.ransac_homography(jnp.asarray(x1), jnp.asarray(x2),
                                       threshold=1e-5)
        inl = np.asarray(res.inliers)
        assert inl[:n_out].sum() <= 2
        assert inl[n_out:].sum() > 140


class TestHardSceneATE:
    def test_hard_scene_end_to_end(self, tmp_path):
        """Full sfm-init -> calibrate on the hardened rendered scene; the
        recovered trajectory must align to ground truth within tight ATE
        bounds and every view must register."""
        import bench_pipeline as bp
        from multiview_tpu.__main__ import main as cli_main
        from multiview_tpu.io import nvm as nvm_io

        ws = tmp_path / "hard"
        # 10 images = two serpentine rows: a non-collinear trajectory
        # (center-based similarity alignment is degenerate on a line)
        bp.build_workspace(ws, 10, (320, 240), 280.0, hard=True)
        rc = cli_main(["sfm-init", "--rig_config", str(ws / "rig_config.txt"),
                       "--images", str(ws / "images"),
                       "--out_dir", str(ws / "sfm"),
                       "--max_features", "1000", "--num_overlaps", "4"])
        assert rc == 0
        data = nvm_io.read_nvm(ws / "sfm" / "cameras.nvm")
        assert len(data.cid_to_filename) == 10, "views dropped by SfM"
        nvm_io.write_camera_poses(ws / "sfm" / "cameras_est.txt",
                                  data.cid_to_filename, data.world_to_cam)
        ate = bp.compute_ate(ws / "sfm" / "cameras_est.txt",
                             ws / "cameras_gt.txt")
        cons = bp.check_track_consistency(ws / "sfm" / "cameras.nvm",
                                          ws / "cameras_gt.txt")
        assert ate["ate_rmse_m"] < 0.05, ate
        assert ate["rot_mean_deg"] < 2.0, ate
        assert cons["consistent_frac"] > 0.9, cons

        rc = cli_main(["calibrate", "--rig_config", str(ws / "rig_config.txt"),
                       "--nvm", str(ws / "sfm" / "cameras.nvm"),
                       "--images", str(ws / "images"),
                       "--out_dir", str(ws / "calib"),
                       "--no_rig", "--camera_poses_to_float",
                       "--num_iterations", "15",
                       "--calibrator_num_passes", "2",
                       "--max_features", "1000", "--num_overlaps", "4"])
        assert rc == 0
        ate2 = bp.compute_ate(ws / "calib" / "cameras.txt",
                              ws / "cameras_gt.txt")
        assert ate2["ate_rmse_m"] < 0.05, ate2
        assert ate2["rot_mean_deg"] < 2.0, ate2
