"""Multi-device sharding: the distributed Schur solve must be numerically
equivalent to the single-device solve (8-device virtual CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_tpu.calib import problem as prob
from multiview_tpu.parallel import sharding as sh
from multiview_tpu.solver import schur
from multiview_tpu.utils import synthetic as syn


@pytest.fixture(scope="module")
def scene():
    return syn.make_cube_scene(n_images=8, n_per_face=3, pix_noise=0.3,
                               dist_coeffs=(-0.1, 0.02, 1e-4, -1e-4))


class TestShardedSolve:
    def test_mesh_has_8_devices(self):
        assert len(jax.devices()) == 8

    def test_sharded_equals_unsharded(self, scene):
        state0 = syn.perturb_state(scene.true_state)
        cam_mask = prob.build_mask(state0, prob.FloatSpec(cam_poses=True),
                                   no_rig=True, include_points=False)
        opts = prob.BAOptions(no_rig=True)
        cam0 = prob.pack_state(state0, include_points=False)

        # single device
        solver1 = schur.make_schur_solver(state0, scene.observations,
                                          scene.models, opts, cam_mask,
                                          max_iterations=8, cg_iterations=30)
        r1 = solver1(cam0, state0.points)

        # sharded over the 8-device mesh (padded rows masked out)
        mesh = sh.make_mesh()
        obs_sharded = sh.shard_observations(scene.observations, mesh)
        state_r = sh.replicate(state0, mesh)
        solver8 = schur.make_schur_solver(state_r, obs_sharded, scene.models,
                                          opts, cam_mask,
                                          max_iterations=8, cg_iterations=30)
        r8 = jax.jit(solver8)(prob.pack_state(state_r, include_points=False),
                              state_r.points)

        np.testing.assert_allclose(float(r8.initial_cost), float(r1.initial_cost),
                                   rtol=1e-10)
        np.testing.assert_allclose(float(r8.cost), float(r1.cost), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(r8.cam), np.asarray(r1.cam),
                                   atol=1e-7)

    def test_padding_rows_are_inert(self, scene):
        """Padding added by sharding must not change residuals."""
        mesh = sh.make_mesh()
        obs_p = sh.shard_observations(scene.observations, mesh)
        opts = prob.BAOptions(no_rig=True)
        r0 = prob.all_residuals(scene.true_state, scene.observations,
                                scene.models, opts)
        rp = prob.all_residuals(scene.true_state, obs_p, scene.models, opts)
        np.testing.assert_allclose(float(jnp.sum(r0 * r0)),
                                   float(jnp.sum(rp * rp)), rtol=1e-12)
