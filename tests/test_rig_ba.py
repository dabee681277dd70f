"""End-to-end 3-camera rig calibration — BASELINE config 2: shared-rig
extrinsics + fisheye/Tsai distortion, bracketed timestamps."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from multiview_tpu.calib import problem as prob
from multiview_tpu.calib import calibrator as cal
from multiview_tpu.calib import rig_init
from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.utils import synthetic as syn


def rig_errors(est_state, true_state):
    """Rotation (deg) and translation errors of the non-ref rig transforms."""
    rot_errs, trans_errs = [], []
    for s in range(1, est_state.ref_to_cam.shape[0]):
        est, true = est_state.ref_to_cam[s], true_state.ref_to_cam[s]
        rel = pose_mod.pose_compose(pose_mod.pose_inverse(est), true)
        rot_errs.append(np.degrees(np.linalg.norm(
            np.asarray(pose_mod.quat_log(pose_mod.pose_q(rel))))))
        trans_errs.append(float(np.linalg.norm(np.asarray(pose_mod.pose_t(rel)))))
    return max(rot_errs), max(trans_errs)


class TestRigScene:
    def test_scene_consistency(self):
        """Observations of the true state have zero residuals."""
        scene = syn.make_rig_scene(n_ref=10)
        assert len(scene.observations.pixels) == 3
        opts = prob.BAOptions()
        for obs in scene.observations.pixels:
            r = prob.pixel_residuals(scene.true_state, obs, scene.models[obs.sensor],
                                     opts, robust=False)
            assert float(jnp.abs(r).max()) < 1e-9

    def test_bracketing_indices(self):
        scene = syn.make_rig_scene(n_ref=10)
        for obs in scene.observations.pixels:
            if obs.sensor == 0:
                assert np.all(np.asarray(obs.dt_bracket) == 0)
            else:
                assert np.all(np.asarray(obs.dt_bracket) > 0)


class TestRigCalibration:
    def test_recover_rig_transforms(self):
        """Float the rig transforms from a perturbed guess; exact recovery."""
        scene = syn.make_rig_scene(n_ref=12, pix_noise=0.0)
        state0 = syn.perturb_rig_state(scene.true_state, rig_rot=0.02, rig_trans=0.03,
                                       pose_rot=0.0, pose_trans=0.0, point_sigma=0.0)
        spec = prob.FloatSpec(rig_transforms=True)
        result = cal.optimize_rig(state0, scene.observations, scene.models, spec,
                                  prob.BAOptions(), num_passes=2, num_iterations=30)
        rot_err, trans_err = rig_errors(result.state, scene.true_state)
        assert rot_err < 1e-5, f"rig rotation error {rot_err} deg"
        assert trans_err < 1e-6, f"rig translation error {trans_err} m"
        # ref sensor rig must remain exactly identity
        np.testing.assert_array_equal(
            np.asarray(result.state.ref_to_cam[0]), [0, 0, 0, 0, 0, 0, 1.0])

    def test_recover_rig_with_noise_and_intrinsics(self):
        scene = syn.make_rig_scene(n_ref=12, pix_noise=0.3)
        state0 = syn.perturb_rig_state(scene.true_state, rig_rot=0.01, rig_trans=0.02,
                                       pose_rot=0.0, pose_trans=0.0,
                                       point_sigma=0.01)
        state0 = dataclasses.replace(state0, focal=state0.focal * jnp.asarray([1.0, 1.02, 0.99]))
        spec = prob.FloatSpec(rig_transforms=True, focal=(1, 2))
        result = cal.optimize_rig(state0, scene.observations, scene.models, spec,
                                  prob.BAOptions(), num_passes=2, num_iterations=40)
        rot_err, trans_err = rig_errors(result.state, scene.true_state)
        assert rot_err < 0.2, f"rig rotation error {rot_err} deg"
        assert trans_err < 2e-2, f"rig translation error {trans_err} m"
        np.testing.assert_allclose(np.asarray(result.state.focal),
                                   np.asarray(scene.true_state.focal), rtol=5e-3)

    def test_timestamp_offset_recovery(self):
        """Float the timestamp offsets with bounds (the reference's
        SetParameterLowerBound path, rig_calibrator.cc:1744-1747)."""
        scene = syn.make_rig_scene(n_ref=14, pix_noise=0.0)
        wrong_off = scene.true_state.timestamp_offsets + jnp.asarray([0.0, 0.04, -0.03])
        state0 = dataclasses.replace(scene.true_state, timestamp_offsets=wrong_off)
        # NOTE: observations were built with true offsets; dt_cam entries are
        # measurements, the offset enters only the interpolation alpha.
        spec = prob.FloatSpec(timestamp_offsets=True)
        bounds = np.array([[-1e100, 1e100], [-0.5 + 0.3, 0.5 + 0.3],
                           [-0.5 - 0.2, 0.5 - 0.2]])
        result = cal.optimize_rig(state0, scene.observations, scene.models, spec,
                                  prob.BAOptions(), num_passes=1, num_iterations=40,
                                  timestamp_offset_bounds=bounds)
        np.testing.assert_allclose(np.asarray(result.state.timestamp_offsets),
                                   np.asarray(scene.true_state.timestamp_offsets),
                                   atol=1e-4)


class TestRigInit:
    def test_median_rig_init(self):
        """calc_rig_using_world_to_cam recovers the rig from world_to_cam poses."""
        scene = syn.make_rig_scene(n_ref=12)
        st = scene.true_state
        w2c = rig_init.calc_world_to_cam_using_rig(
            scene.cams, np.asarray(st.world_to_ref), scene.ref_timestamps,
            np.asarray(st.ref_to_cam), np.asarray(st.timestamp_offsets))
        rig = rig_init.calc_rig_using_world_to_cam(
            3, scene.cams, np.asarray(st.world_to_ref), w2c, scene.ref_timestamps,
            np.asarray(st.timestamp_offsets))
        for s in range(3):
            rel = pose_mod.pose_compose(
                pose_mod.pose_inverse(jnp.asarray(rig[s])), st.ref_to_cam[s])
            rot_err = np.linalg.norm(np.asarray(pose_mod.quat_log(pose_mod.pose_q(rel))))
            trans_err = np.linalg.norm(np.asarray(pose_mod.pose_t(rel)))
            assert rot_err < 1e-9, f"sensor {s} rot err {rot_err}"
            assert trans_err < 1e-9, f"sensor {s} trans err {trans_err}"
