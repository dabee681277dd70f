"""Tests for the dense LM solver and RPC fitting."""

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.solver.lm import levenberg_marquardt
from multiview_tpu.solver import losses
from multiview_tpu.geometry.camera import CameraParams
from multiview_tpu.geometry import rpc_fit, distortion as D


class TestLM:
    def test_linear_problem_one_step(self):
        rng = np.random.default_rng(0)
        A = jnp.array(rng.normal(size=(20, 5)))
        b = jnp.array(rng.normal(size=20))

        res = levenberg_marquardt(lambda x: A @ x - b, jnp.zeros(5), max_iterations=10)
        x_ls, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)
        np.testing.assert_allclose(res.x, x_ls, atol=1e-8)
        assert float(res.cost) < float(res.initial_cost)

    def test_rosenbrock(self):
        def r(x):
            return jnp.array([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

        res = levenberg_marquardt(r, jnp.array([-1.2, 1.0]), max_iterations=100)
        np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-6)

    def test_exponential_curve_fit(self):
        rng = np.random.default_rng(1)
        t = jnp.linspace(0, 1, 50)
        true = jnp.array([2.0, -1.3])
        y = true[0] * jnp.exp(true[1] * t)

        def r(p):
            return p[0] * jnp.exp(p[1] * t) - y

        res = levenberg_marquardt(r, jnp.array([1.0, 0.0]), max_iterations=50)
        np.testing.assert_allclose(res.x, true, atol=1e-6)

    def test_mask_freezes_parameters(self):
        t = jnp.linspace(0, 1, 30)
        y = 2.0 * t + 3.0

        def r(p):
            return p[0] * t + p[1] - y

        res = levenberg_marquardt(r, jnp.array([0.0, 9.9]), max_iterations=50,
                                  mask=jnp.array([True, False]))
        assert float(res.x[1]) == 9.9  # frozen (SetParameterBlockConstant behavior)
        # slope compensates as best it can given frozen intercept
        assert abs(float(res.x[0])) > 0.01

    def test_bounds_projection(self):
        def r(p):
            return p - jnp.array([5.0])

        res = levenberg_marquardt(r, jnp.array([0.0]), max_iterations=20,
                                  lower=jnp.array([-1.0]), upper=jnp.array([2.0]))
        np.testing.assert_allclose(res.x, [2.0], atol=1e-9)

    def test_jit_compatible(self):
        def solve(y):
            t = jnp.linspace(0, 1, 30)

            def r(p):
                return p[0] * t + p[1] - y

            return levenberg_marquardt(r, jnp.zeros(2), max_iterations=30).x

        y = 2.0 * jnp.linspace(0, 1, 30) + 3.0
        out = jax.jit(solve)(y)
        np.testing.assert_allclose(out, [2.0, 3.0], atol=1e-8)


class TestLosses:
    def test_rho_properties(self):
        s = jnp.linspace(0.0, 100.0, 50)
        for loss in ("huber", "cauchy", "soft_l1"):
            r = losses.rho(loss, s, 2.0)
            # robust losses are concave upper bounds below identity, equal at 0
            assert float(r[0]) == 0.0
            assert np.all(np.asarray(r) <= np.asarray(s) + 1e-9)
            # derivative matches autodiff
            g = jax.vmap(jax.grad(lambda v: losses.rho(loss, v, 2.0)))(s)
            rp = losses.rho_prime(loss, s, 2.0)
            np.testing.assert_allclose(g, rp, atol=1e-9)

    def test_weights_shape(self):
        blocks = jnp.ones((7, 2))
        w = losses.robust_weights("cauchy", blocks, 1.0)
        assert w.shape == (7,)


class TestRpcFit:
    def test_fit_and_invert_tsai(self):
        """Fit an RPC of degree 3 to a Tsai camera and check the reference's
        quality metric: max distort->undistort round trip error
        (rpc_distortion.cc:723-739)."""
        cam = CameraParams.create((640, 480), (500.0, 500.0), (320.0, 240.0),
                                  (-0.1, 0.02, 1e-4, -1e-4))
        coeffs = rpc_fit.fit_rpc_dist_undist(cam, rpc_degree=3, num_samples=20,
                                             num_iterations=40)
        n = len(coeffs) // 2
        assert D.rpc_degree_from_num_params(n) == 3

        # RPC reproduces the true distortion on fresh samples
        undist_c, dist_c = rpc_fit.gen_undist_dist_pairs(cam, 31)
        rpc_d = np.asarray(D.compute_rpc(jnp.asarray(undist_c), jnp.asarray(coeffs[:n])))
        fit_err = np.abs(rpc_d - dist_c).max()
        assert fit_err < 0.1, f"RPC fit error too large: {fit_err}"

        rt = rpc_fit.eval_rpc_dist_undist(cam, coeffs, num_samples=25)
        assert rt < 0.2, f"round-trip error too large: {rt}"

    def test_rpc_camera_usable(self):
        """The fitted coefficients drop into a CameraParams with model=rpc."""
        cam = CameraParams.create((640, 480), (500.0, 500.0), (320.0, 240.0),
                                  (-0.1, 0.02, 1e-4, -1e-4))
        coeffs = rpc_fit.fit_rpc_dist_undist(cam, rpc_degree=2, num_samples=15,
                                             num_iterations=30)
        rpc_cam = CameraParams.create((640, 480), (500.0, 500.0), (320.0, 240.0), coeffs)
        assert rpc_cam.model == "rpc"
        pix = jnp.array([[50.0, 30.0]])
        d_true = cam.distort_centered(pix)
        d_rpc = rpc_cam.distort_centered(pix)
        np.testing.assert_allclose(d_rpc, d_true, atol=0.1)


class TestRpcRefitInCalibration:
    """Post-BA RPC inverse refit (updateRpcUndistortion parity,
    rig_calibrator.cc:1944-1948)."""

    def _rpc_scene(self):
        """Rig scene whose second sensor carries RPC distortion fitted from a
        Tsai model, with a perturbed forward half as the starting point."""
        import dataclasses
        from multiview_tpu.utils import synthetic as syn
        from multiview_tpu.geometry import pose as pose_mod

        tsai_cam = CameraParams.create((640, 480), (250.0, 250.0),
                                       (320.0, 240.0),
                                       (-0.02, 0.004, 1e-5, -1e-5))
        true_coeffs = rpc_fit.fit_rpc_dist_undist(
            tsai_cam, rpc_degree=3, num_samples=15, num_iterations=30)
        specs = [
            dict(name="nav_cam", focal=600.0, size=(1280, 960), dist=(),
                 offset=0.0, rig=np.array([0, 0, 0, 0, 0, 0, 1.0])),
            dict(name="haz_cam", focal=250.0, size=(640, 480),
                 dist=tuple(true_coeffs), offset=0.3,
                 rig=np.asarray(pose_mod.make_pose(
                     jnp.asarray([0.1, 0.02, -0.05]),
                     pose_mod.quat_exp(jnp.asarray([0.05, -0.03, 0.08]))))),
        ]
        scene = syn.make_rig_scene(n_ref=10, sensor_specs=specs)
        assert scene.models[1] == "rpc"
        rpc_cam = CameraParams.create((640, 480), (250.0, 250.0),
                                      (320.0, 240.0), true_coeffs)
        return scene, true_coeffs, rpc_cam, specs

    def test_mask_floats_only_forward_half(self):
        from multiview_tpu.calib import problem as prob
        scene, true_coeffs, _, _ = self._rpc_scene()
        n = len(true_coeffs) // 2
        spec = prob.FloatSpec(distortion=(1,))
        mask = prob.build_mask(scene.true_state, spec, models=scene.models)
        # locate the dist block of sensor 1 in pack order
        st = scene.true_state
        off = (st.world_to_ref.size + st.ref_to_cam.size
               + st.timestamp_offsets.size + st.focal.size
               + st.optical_center.size + st.dist[0].size)
        dist_mask = mask[off:off + st.dist[1].size]
        assert dist_mask[:n].all()
        assert not dist_mask[n:].any()
        # without models the whole vector floats (legacy behavior)
        mask_legacy = prob.build_mask(scene.true_state, spec)
        assert mask_legacy[off:off + st.dist[1].size].all()

    def test_refit_after_optimize(self):
        """Calibrate with floated RPC distortion; the written coefficients'
        distort->undistort round trip must be tight (the reference's check,
        rpc_distortion.cc:723-739)."""
        import dataclasses
        from multiview_tpu.calib import problem as prob, calibrator as cal

        scene, true_coeffs, rpc_cam, _ = self._rpc_scene()
        n = len(true_coeffs) // 2
        rng = np.random.default_rng(0)
        bad_fwd = true_coeffs[:n] * (1.0 + 0.05 * rng.normal(size=n))
        state0 = dataclasses.replace(
            scene.true_state,
            dist=(scene.true_state.dist[0],
                  jnp.asarray(np.concatenate([bad_fwd, true_coeffs[n:]]))))
        spec = prob.FloatSpec(distortion=(1,))
        result = cal.optimize_rig(
            state0, scene.observations, scene.models, spec,
            prob.BAOptions(), num_passes=1, num_iterations=40,
            cam_params=[None, rpc_cam], rpc_refit_samples=15,
            sensor_names=["nav_cam", "haz_cam"])
        final = np.asarray(result.state.dist[1])
        # the inverse half was actually refit (not left bitwise at its stale
        # value; BA recovers the forward half, so the refit inverse is close
        # to — but not identical with — the original fit)
        assert not np.array_equal(final[n:], true_coeffs[n:])
        cam_final = rpc_cam.with_intrinsics(
            focal=result.state.focal[1] * jnp.ones(2),
            optical_offset=result.state.optical_center[1],
            dist_coeffs=jnp.asarray(final))
        rt = rpc_fit.eval_rpc_dist_undist(cam_final, final, num_samples=20)
        assert rt < 1e-2, f"refit round-trip error too large: {rt}"
        # and the forward half moved back toward consistency: median pixel
        # residual after optimization is small
        med = result.stats_after["haz_cam_pix_x"][1]
        assert med < 0.1, f"pixel residual median {med}"
