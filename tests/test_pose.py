"""Tests for quaternion/pose algebra: round-trips, composition, interpolation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_tpu.geometry import pose as P


def random_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def random_pose(rng, n=()):
    t = rng.normal(size=n + (3,))
    return np.concatenate([t, random_quat(rng, n)], axis=-1)


class TestQuat:
    def test_mul_matches_matrix_product(self):
        rng = np.random.default_rng(0)
        a, b = random_quat(rng), random_quat(rng)
        Rab = P.quat_to_matrix(P.quat_mul(jnp.array(a), jnp.array(b)))
        Ra = P.quat_to_matrix(jnp.array(a))
        Rb = P.quat_to_matrix(jnp.array(b))
        np.testing.assert_allclose(Rab, Ra @ Rb, atol=1e-12)

    def test_rotate_matches_matrix(self):
        rng = np.random.default_rng(1)
        q = random_quat(rng, (5,))
        v = rng.normal(size=(5, 3))
        out = P.quat_rotate(jnp.array(q), jnp.array(v))
        R = P.quat_to_matrix(jnp.array(q))
        np.testing.assert_allclose(out, np.einsum("nij,nj->ni", R, v), atol=1e-12)

    def test_matrix_quat_roundtrip(self):
        rng = np.random.default_rng(2)
        q = random_quat(rng, (100,))
        q2 = np.asarray(P.matrix_to_quat(P.quat_to_matrix(jnp.array(q))))
        # q and -q are the same rotation
        sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-9)

    def test_matrix_quat_edge_cases(self):
        # 180-degree rotations exercise all Shepperd branches
        for axis in range(3):
            R = -np.eye(3)
            R[axis, axis] = 1.0
            q = np.asarray(P.matrix_to_quat(jnp.array(R)))
            R2 = np.asarray(P.quat_to_matrix(jnp.array(q)))
            np.testing.assert_allclose(R2, R, atol=1e-9)

    def test_slerp_endpoints_and_midpoint(self):
        rng = np.random.default_rng(3)
        q0, q1 = jnp.array(random_quat(rng)), jnp.array(random_quat(rng))
        np.testing.assert_allclose(P.quat_slerp(q0, q1, 0.0), q0, atol=1e-12)
        s1 = np.asarray(P.quat_slerp(q0, q1, 1.0))
        assert min(np.linalg.norm(s1 - q1), np.linalg.norm(s1 + q1)) < 1e-9
        # midpoint is equidistant in angle
        sm = P.quat_slerp(q0, q1, 0.5)
        a0 = np.linalg.norm(P.quat_log(P.quat_mul(P.quat_conj(q0), sm)))
        a1 = np.linalg.norm(P.quat_log(P.quat_mul(P.quat_conj(sm), q1)))
        np.testing.assert_allclose(a0, a1, atol=1e-9)

    def test_log_exp_roundtrip(self):
        rng = np.random.default_rng(4)
        axes = rng.normal(size=(50, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        # log returns the canonical angle in [0, pi); stay inside it
        rv = axes * rng.uniform(0.0, 3.1, size=(50, 1))
        rv2 = np.asarray(P.quat_log(P.quat_exp(jnp.array(rv))))
        np.testing.assert_allclose(rv2, rv, atol=1e-9)

    def test_quat_mean(self):
        rng = np.random.default_rng(5)
        base = random_quat(rng)
        perturb = rng.normal(size=(20, 3)) * 0.05
        qs = P.quat_mul(jnp.array(base), P.quat_exp(jnp.array(perturb)))
        mean = P.quat_mean(qs)
        rel = P.quat_log(P.quat_mul(P.quat_conj(jnp.array(base)), mean))
        expected = perturb.mean(axis=0)
        np.testing.assert_allclose(np.asarray(rel), expected, atol=1e-3)


class TestPose:
    def test_compose_inverse(self):
        rng = np.random.default_rng(6)
        a = jnp.array(random_pose(rng))
        x = jnp.array(rng.normal(size=(7, 3)))
        y = P.pose_apply(a, x)
        x2 = P.pose_apply(P.pose_inverse(a), y)
        np.testing.assert_allclose(x2, x, atol=1e-12)
        ident = P.pose_compose(a, P.pose_inverse(a))
        np.testing.assert_allclose(P.pose_t(ident), 0, atol=1e-12)

    def test_compose_matches_matrix(self):
        rng = np.random.default_rng(7)
        a, b = jnp.array(random_pose(rng)), jnp.array(random_pose(rng))
        Mab = P.pose_to_matrix(P.pose_compose(a, b))
        np.testing.assert_allclose(Mab, P.pose_to_matrix(a) @ P.pose_to_matrix(b), atol=1e-12)

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(8)
        p = jnp.array(random_pose(rng, (10,)))
        p2 = P.matrix_to_pose(P.pose_to_matrix(p))
        np.testing.assert_allclose(P.pose_apply(p2, jnp.ones(3)),
                                   P.pose_apply(p, jnp.ones(3)), atol=1e-9)

    def test_interp_endpoints(self):
        rng = np.random.default_rng(9)
        p0, p1 = jnp.array(random_pose(rng)), jnp.array(random_pose(rng))
        np.testing.assert_allclose(P.pose_interp(0.0, p0, p1)[:3], p0[:3], atol=1e-12)
        np.testing.assert_allclose(P.pose_interp(1.0, p0, p1)[:3], p1[:3], atol=1e-12)

    def test_bracketed_interp_degenerate_is_beg(self):
        """Reference convention: dt_bracket == 0 -> beg pose, rig ignored
        (rig_calibrator.cc:362-390)."""
        rng = np.random.default_rng(10)
        beg, end, rig = (jnp.array(random_pose(rng)) for _ in range(3))
        out = P.world_to_cam_from_bracket(beg, end, rig, 0.0, 0.0, 0.123)
        np.testing.assert_allclose(P.pose_apply(out, jnp.ones(3)),
                                   P.pose_apply(beg, jnp.ones(3)), atol=1e-12)

    def test_bracketed_interp_composition(self):
        """world_to_cam = ref_to_cam * interp(world_to_ref) at
        alpha=(dt_cam-offset)/dt_bracket (rig_calibrator.cc:322-390)."""
        rng = np.random.default_rng(11)
        beg, end, rig = (jnp.array(random_pose(rng)) for _ in range(3))
        dt_cam, dt_bracket, offset = 0.7, 1.0, 0.2
        out = P.world_to_cam_from_bracket(beg, end, rig, dt_cam, dt_bracket, offset)
        interp = P.pose_interp((dt_cam - offset) / dt_bracket, beg, end)
        expected = P.pose_compose(rig, interp)
        np.testing.assert_allclose(P.pose_apply(out, jnp.ones(3)),
                                   P.pose_apply(expected, jnp.ones(3)), atol=1e-12)

    def test_differentiable(self):
        """Autodiff through the bracketed pose (the BA Jacobian path)."""
        rng = np.random.default_rng(12)
        beg, end, rig = (jnp.array(random_pose(rng)) for _ in range(3))

        def f(offset):
            w2c = P.world_to_cam_from_bracket(beg, end, rig, 0.6, 1.0, offset)
            return jnp.sum(P.pose_apply(w2c, jnp.ones(3)))

        g = jax.grad(f)(0.1)
        # numeric check
        eps = 1e-6
        num = (f(0.1 + eps) - f(0.1 - eps)) / (2 * eps)
        np.testing.assert_allclose(g, num, rtol=1e-5)


class TestAffine:
    def test_affine_roundtrip(self):
        rng = np.random.default_rng(13)
        L = jnp.array(rng.normal(size=(3, 3)) + 3 * np.eye(3))
        t = jnp.array(rng.normal(size=3))
        a = P.make_affine(L, t)
        x = jnp.array(rng.normal(size=(5, 3)))
        y = P.affine_apply(a, x)
        np.testing.assert_allclose(P.affine_apply(P.affine_inverse(a), y), x, atol=1e-9)

    def test_pose_to_affine_scale(self):
        rng = np.random.default_rng(14)
        p = jnp.array(random_pose(rng))
        a = P.pose_to_affine(p, scale=2.0)
        x = jnp.array(rng.normal(size=3))
        np.testing.assert_allclose(
            P.affine_apply(a, x),
            2.0 * P.quat_rotate(P.pose_q(p), x) + P.pose_t(p), atol=1e-12)
