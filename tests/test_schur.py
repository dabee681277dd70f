"""Schur-complement LM: correctness vs the dense solver, and gradient checks."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.calib import problem as prob
from multiview_tpu.solver import schur
from multiview_tpu.utils import synthetic as syn


def _setup(dist_coeffs=(), pix_noise=0.0, n_images=6, n_per_face=3, dtype=jnp.float64):
    scene = syn.make_cube_scene(n_images=n_images, n_per_face=n_per_face,
                                dist_coeffs=dist_coeffs, pix_noise=pix_noise, dtype=dtype)
    state0 = syn.perturb_state(scene.true_state, pose_rot=0.01, pose_trans=0.02,
                               point_sigma=0.02)
    opts = prob.BAOptions(no_rig=True)
    return scene, state0, opts


class TestRowBlocks:
    def test_row_jacobian_matches_full_autodiff(self):
        """The per-row block Jacobians must agree with jacrev of the full
        residual vector (they feed Hpp and the preconditioner)."""
        scene, state0, opts = _setup(dist_coeffs=(-0.1, 0.02, 1e-4, -1e-4))
        obs = scene.observations.pixels[0]
        layout = schur.cam_layout(state0)

        j_cam, j_pt, r_aux = schur._pixel_row_blocks(state0, obs, scene.models[0], opts)
        cols = schur._pixel_row_cam_indices(state0, obs, layout)

        # the jacrev-aux residuals must equal the vectorized residual path
        # (they drive the gradient and the LM accept cost in blocks mode)
        np.testing.assert_allclose(
            np.asarray(r_aux),
            np.asarray(prob.pixel_residuals(state0, obs, scene.models[0], opts)),
            atol=1e-12)

        # full autodiff reference
        template = state0

        def residual_fn(cam_vec, points):
            st = prob.unpack_state(cam_vec, template, include_points=False)
            st = dataclasses.replace(st, points=points)
            return prob.pixel_residuals(st, obs, scene.models[0], opts).ravel()

        cam0 = prob.pack_state(state0, include_points=False)
        Jc_full = jax.jacrev(residual_fn, argnums=0)(cam0, state0.points)
        Jp_full = jax.jacrev(residual_fn, argnums=1)(cam0, state0.points)

        N = len(obs)
        Jc_full = np.asarray(Jc_full).reshape(N, 2, -1)
        Jp_full = np.asarray(Jp_full).reshape(N, 2, -1, 3)

        pidx = np.asarray(obs.point_idx)
        for i in range(0, N, 17):  # sample rows
            # camera columns
            dense_row = np.zeros((2, cam0.shape[0]))
            np.add.at(dense_row.T, cols[i], np.asarray(j_cam[i]).T)
            np.testing.assert_allclose(dense_row, Jc_full[i], atol=1e-9)
            # point block
            np.testing.assert_allclose(np.asarray(j_pt[i]), Jp_full[i, :, pidx[i]],
                                       atol=1e-9)


class TestSchurSolve:
    def test_converges_on_cube(self):
        scene, state0, opts = _setup()
        cam_mask = prob.build_mask(state0, prob.FloatSpec(cam_poses=True),
                                   no_rig=True, include_points=False)
        solver = schur.make_schur_solver(state0, scene.observations, scene.models,
                                         opts, cam_mask, max_iterations=30,
                                         cg_iterations=80)
        cam0 = prob.pack_state(state0, include_points=False)
        res = jax.jit(solver)(cam0, state0.points)
        assert float(res.cost) < 1e-10 * float(res.initial_cost), \
            f"cost {float(res.initial_cost)} -> {float(res.cost)}"

    def test_matches_dense_lm(self):
        """Same problem through both backends reaches the same cost."""
        from multiview_tpu.solver.lm import levenberg_marquardt
        scene, state0, opts = _setup(dist_coeffs=(-0.1, 0.02, 1e-4, -1e-4),
                                     pix_noise=0.3)
        spec = prob.FloatSpec(cam_poses=True)
        cam_mask = prob.build_mask(state0, spec, no_rig=True, include_points=False)
        solver = schur.make_schur_solver(state0, scene.observations, scene.models,
                                         opts, cam_mask, max_iterations=30,
                                         cg_iterations=80)
        cam0 = prob.pack_state(state0, include_points=False)
        res_s = solver(cam0, state0.points)

        full_mask = prob.build_mask(state0, spec, no_rig=True)
        template = state0

        def residual_fn(vec):
            return prob.all_residuals(prob.unpack_state(vec, template),
                                      scene.observations, scene.models, opts)

        res_d = levenberg_marquardt(residual_fn, prob.pack_state(state0),
                                    max_iterations=30, mask=jnp.asarray(full_mask))
        # both reach the same basin
        np.testing.assert_allclose(float(res_s.cost), float(res_d.cost), rtol=0.02)

    def test_f32(self):
        scene, state0, opts = _setup(pix_noise=0.2, dtype=jnp.float32)
        cam_mask = prob.build_mask(state0, prob.FloatSpec(cam_poses=True),
                                   no_rig=True, include_points=False)
        solver = schur.make_schur_solver(state0, scene.observations, scene.models,
                                         opts, cam_mask, max_iterations=20,
                                         cg_iterations=40)
        cam0 = prob.pack_state(state0, include_points=False)
        res = solver(cam0, state0.points)
        assert np.isfinite(float(res.cost))
        assert float(res.cost) < 0.05 * float(res.initial_cost)

    def test_frozen_cam_params_do_not_move(self):
        scene, state0, opts = _setup()
        cam_mask = prob.build_mask(state0, prob.FloatSpec(),  # all cams frozen
                                   no_rig=True, include_points=False)
        solver = schur.make_schur_solver(state0, scene.observations, scene.models,
                                         opts, cam_mask, max_iterations=10)
        cam0 = prob.pack_state(state0, include_points=False)
        res = solver(cam0, state0.points)
        np.testing.assert_array_equal(np.asarray(res.cam), np.asarray(cam0))
        # points still optimized
        assert float(res.cost) < float(res.initial_cost)


class TestLinearSolverModes:
    def test_cg_blocks_matches_cg(self):
        """The blocks-mode matvecs (one-hot matmul segment sums over the
        materialized row Jacobians) must reproduce the jvp/vjp matvecs: same
        LM trajectory on a rig problem with pixel + depth families."""
        from multiview_tpu.utils import synthetic as syn2
        scene = syn2.make_rig_scene(n_ref=10, pix_noise=0.2)
        state0 = syn2.perturb_rig_state(scene.true_state)
        opts = prob.BAOptions(depth_tri_weight=100.0)
        cam_mask = prob.build_mask(
            state0, prob.FloatSpec(cam_poses=True, rig_transforms=True,
                                   focal=(0, 1), optical_center=(0, 1)),
            include_points=False)
        cam0 = prob.pack_state(state0, include_points=False)
        out = {}
        for mode in ("cg", "cg_blocks"):
            solver = schur.make_schur_solver(
                state0, scene.observations, scene.models, opts, cam_mask,
                max_iterations=12, cg_iterations=40, cg_tolerance=1e-10,
                linear_solver=mode)
            out[mode] = jax.jit(solver)(cam0, state0.points)
        a, b = out["cg"], out["cg_blocks"]
        assert int(b.iterations) == int(a.iterations)
        np.testing.assert_allclose(float(b.cost), float(a.cost), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(b.cam), np.asarray(a.cam),
                                   rtol=1e-5, atol=1e-7)


class TestSchurJacobiPreconditioner:
    def test_block_precond_reaches_same_solution(self):
        """SCHUR_JACOBI (7x7 pose-block diagonal of the reduced system) must
        converge to the same optimum as the scalar Jacobi preconditioner and
        spend no more CG iterations."""
        scene, state0, opts = _setup()
        cam_mask = prob.build_mask(state0, prob.FloatSpec(cam_poses=True),
                                   no_rig=True, include_points=False)
        cam0 = prob.pack_state(state0, include_points=False)
        results = {}
        for pc in ("jacobi", "schur_jacobi"):
            solver = schur.make_schur_solver(
                scene.true_state, scene.observations, scene.models, opts,
                cam_mask, max_iterations=25, cg_iterations=80,
                cg_tolerance=1e-8, preconditioner=pc)
            results[pc] = jax.jit(solver)(cam0, state0.points)
        ja, sj = results["jacobi"], results["schur_jacobi"]
        assert float(sj.cost) < 1e-8 * float(sj.initial_cost), \
            f"schur_jacobi stalled: {float(sj.initial_cost)} -> {float(sj.cost)}"
        assert float(sj.cost) <= 10.0 * max(float(ja.cost), 1e-300)
        assert int(sj.cg_iters_total) <= int(ja.cg_iters_total), \
            (int(sj.cg_iters_total), int(ja.cg_iters_total))


class TestInv3x3Spd:
    """The closed-form diagonally-normalized SPD inverse that replaced the
    batched LU solves inside every CG matvec."""

    def test_random_spd(self):
        key = jax.random.PRNGKey(0)
        A = jax.random.normal(key, (64, 3, 3), jnp.float32)
        spd = jnp.einsum("nij,nkj->nik", A, A) + 1e-3 * jnp.eye(3)
        inv = schur.inv3x3_spd(spd)
        err = jnp.max(jnp.abs(jnp.einsum("nij,njk->nik", inv, spd) - jnp.eye(3)))
        assert float(err) < 1e-3

    def test_extreme_scales_f32(self):
        """A naive adjugate overflows f32 determinants at ~1e13 diagonal
        scale and underflows for weak blocks; the normalized form must not."""
        key = jax.random.PRNGKey(1)
        A = jax.random.normal(key, (32, 3, 3), jnp.float32)
        spd = jnp.einsum("nij,nkj->nik", A, A) + 1e-2 * jnp.eye(3)
        for scale in (1e12, 1e-12):
            M = spd * scale
            inv = schur.inv3x3_spd(M)
            err = jnp.max(jnp.abs(jnp.einsum("nij,njk->nik", inv, M) - jnp.eye(3)))
            assert float(err) < 1e-3, (scale, float(err))

    def test_singular_block_gives_zero_inverse(self):
        """Numerically singular blocks (fully-masked points) must produce a
        zero inverse, not NaN — the LM update then leaves the point fixed."""
        Z = jnp.zeros((4, 3, 3), jnp.float32)
        inv = schur.inv3x3_spd(Z)
        assert bool(jnp.isfinite(inv).all())
        np.testing.assert_array_equal(np.asarray(inv), 0.0)
