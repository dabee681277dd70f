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
