"""End-to-end single-camera BA on the synthetic cube scene — BASELINE
config 1: 'Single-camera pinhole BA refine on a 10-image synthetic cube
scene (fixed matches, CPU jax)'."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from multiview_tpu.calib import problem as prob
from multiview_tpu.calib import calibrator as cal
from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.geometry import registration as reg
from multiview_tpu.utils import synthetic as syn


def ate_after_alignment(est_w2c, true_w2c):
    """RMS translation error of camera centers after similarity alignment
    (the ATE metric from BASELINE.md)."""
    est_ctr = np.asarray(pose_mod.pose_t(pose_mod.pose_inverse(jnp.asarray(est_w2c))))
    true_ctr = np.asarray(pose_mod.pose_t(pose_mod.pose_inverse(jnp.asarray(true_w2c))))
    scale, T = reg.find_similarity_transform(jnp.asarray(est_ctr), jnp.asarray(true_ctr))
    aligned = np.asarray(reg.apply_similarity(scale, T, jnp.asarray(est_ctr)))
    return float(np.sqrt(np.mean(np.sum((aligned - true_ctr) ** 2, axis=-1))))


class TestCubeBA:
    def _run(self, dist_coeffs=(), pix_noise=0.0, **kw):
        scene = syn.make_cube_scene(n_images=10, n_per_face=4,
                                    dist_coeffs=dist_coeffs, pix_noise=pix_noise)
        state0 = syn.perturb_state(scene.true_state)
        spec = prob.FloatSpec(cam_poses=True)
        opts = prob.BAOptions(no_rig=True)
        result = cal.optimize_rig(
            state0, scene.observations, scene.models, spec, opts,
            num_passes=kw.pop("num_passes", 2), num_iterations=kw.pop("num_iterations", 30),
            verbose=False)
        return scene, state0, result

    def test_pinhole_converges_to_truth(self):
        scene, state0, result = self._run()
        # residuals drive to ~0 (exact synthetic data)
        med_before = result.stats_before["cam0_pix_x"][1]
        med_after = result.stats_after["cam0_pix_x"][1]
        assert med_after < 1e-6, f"median residual {med_after}"
        assert med_before > 1.0  # the perturbation was meaningful
        # trajectory recovers ground truth up to gauge
        ate = ate_after_alignment(result.state.world_to_ref, scene.true_state.world_to_ref)
        assert ate < 1e-6, f"ATE {ate}"

    def test_with_distortion_and_noise(self):
        scene, state0, result = self._run(
            dist_coeffs=(-0.15, 0.03, 1e-4, -1e-4), pix_noise=0.3)
        med_after = result.stats_after["cam0_pix_x"][1]
        assert med_after < 0.5, f"median residual {med_after}"
        ate = ate_after_alignment(result.state.world_to_ref, scene.true_state.world_to_ref)
        assert ate < 5e-3, f"ATE {ate}"

    def test_intrinsics_refinement(self):
        """Float focal too, from a wrong initial guess."""
        scene = syn.make_cube_scene(n_images=10, n_per_face=4)
        state0 = syn.perturb_state(scene.true_state, pose_rot=0.005, pose_trans=0.01,
                                   point_sigma=0.01)
        state0 = dataclasses.replace(state0, focal=state0.focal * 1.03)  # 3% focal error
        spec = prob.FloatSpec(cam_poses=True, focal=(0,))
        opts = prob.BAOptions(no_rig=True)
        result = cal.optimize_rig(state0, scene.observations, scene.models, spec, opts,
                                  num_passes=2, num_iterations=40)
        rec_focal = float(result.state.focal[0])
        assert abs(rec_focal - 600.0) < 0.5, f"focal {rec_focal}"

    def test_frozen_poses_stay_frozen(self):
        scene = syn.make_cube_scene(n_images=6, n_per_face=3)
        state0 = syn.perturb_state(scene.true_state, point_sigma=0.05,
                                   pose_rot=0.0, pose_trans=0.0)
        spec = prob.FloatSpec()  # nothing floats except points
        opts = prob.BAOptions(no_rig=True)
        result = cal.optimize_rig(state0, scene.observations, scene.models, spec, opts,
                                  num_passes=1, num_iterations=20)
        np.testing.assert_array_equal(np.asarray(result.state.world_to_ref),
                                      np.asarray(state0.world_to_ref))
        # but points were re-triangulated + optimized to truth
        np.testing.assert_allclose(np.asarray(result.state.points),
                                   np.asarray(scene.true_state.points), atol=1e-6)

    def test_f32_convergence(self):
        """The whole solve in float32 — the TPU-default dtype. Regression for
        the f32 slerp near-parallel threshold (1 - 1e-9 rounds to 1.0)."""
        scene = syn.make_cube_scene(n_images=6, n_per_face=3, pix_noise=0.2,
                                    dtype=jnp.float32)
        state0 = syn.perturb_state(scene.true_state, pose_rot=0.004,
                                   pose_trans=0.008, point_sigma=0.01)
        spec = prob.FloatSpec(cam_poses=True)
        opts = prob.BAOptions(no_rig=True)
        result = cal.optimize_rig(state0, scene.observations, scene.models, spec, opts,
                                  num_passes=1, num_iterations=25)
        assert result.state.world_to_ref.dtype == jnp.float32
        med = result.stats_after["cam0_pix_x"][1]
        assert np.isfinite(med) and med < 0.5, f"f32 median residual {med}"

    def test_outlier_rejection(self):
        """Corrupt some measurements; the gates must remove them."""
        scene = syn.make_cube_scene(n_images=10, n_per_face=4, pix_noise=0.2)
        obs = scene.observations.pixels[0]
        rng = np.random.default_rng(3)
        pix = np.asarray(obs.pix).copy()
        n_bad = 30
        bad_rows = rng.choice(len(pix), n_bad, replace=False)
        pix[bad_rows] += rng.uniform(60, 200, size=(n_bad, 2)) * rng.choice([-1, 1], (n_bad, 2))
        obs = dataclasses.replace(obs, pix=jnp.asarray(pix))
        observations = dataclasses.replace(scene.observations, pixels=(obs,))

        state0 = syn.perturb_state(scene.true_state, pose_rot=0.002, pose_trans=0.005,
                                   point_sigma=0.005)
        spec = prob.FloatSpec(cam_poses=True)
        opts = prob.BAOptions(no_rig=True)
        result = cal.optimize_rig(state0, observations, scene.models, spec, opts,
                                  num_passes=2, num_iterations=30,
                                  max_reprojection_error=5.0)
        final_mask = np.asarray(result.observations.pixels[0].mask)
        # all corrupted rows must be flagged as outliers
        assert not final_mask[bad_rows].any(), "corrupted observations survived"
        # and most clean rows survive
        clean = np.setdiff1d(np.arange(len(pix)), bad_rows)
        assert final_mask[clean].mean() > 0.95
        med_after = result.stats_after["cam0_pix_x"][1]
        assert med_after < 0.5
