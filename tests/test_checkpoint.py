"""Checkpoint/resume of the calibration state."""

import numpy as np
import jax.numpy as jnp

from multiview_tpu.calib import problem as prob, calibrator as cal, checkpoint as ck
from multiview_tpu.utils import synthetic as syn


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        scene = syn.make_cube_scene(n_images=6, n_per_face=3)
        st = syn.perturb_state(scene.true_state)
        ck.save_checkpoint(tmp_path, st, scene.observations, 0)
        st2, obs2, p = ck.load_checkpoint(tmp_path, scene.true_state,
                                          scene.observations)
        assert p == 0
        np.testing.assert_array_equal(np.asarray(st2.world_to_ref),
                                      np.asarray(st.world_to_ref))
        np.testing.assert_array_equal(np.asarray(st2.points), np.asarray(st.points))
        np.testing.assert_array_equal(np.asarray(obs2.pixels[0].mask),
                                      np.asarray(scene.observations.pixels[0].mask))

    def test_resume_skips_done_passes(self, tmp_path):
        scene = syn.make_cube_scene(n_images=6, n_per_face=3, pix_noise=0.2)
        st0 = syn.perturb_state(scene.true_state)
        spec = prob.FloatSpec(cam_poses=True)
        opts = prob.BAOptions(no_rig=True)

        # full 2-pass run with checkpoints
        r_full = cal.optimize_rig(st0, scene.observations, scene.models, spec,
                                  opts, num_passes=2, num_iterations=15,
                                  checkpoint_dir=tmp_path / "ck")
        # simulate a crash after pass 1: delete pass-2 checkpoint, resume
        import json
        (tmp_path / "ck" / "latest.json").write_text(json.dumps({"pass": 0}))
        r_resumed = cal.optimize_rig(st0, scene.observations, scene.models, spec,
                                     opts, num_passes=2, num_iterations=15,
                                     checkpoint_dir=tmp_path / "ck", resume=True)
        # resumed run executed only pass 2 and ends at a comparable cost
        assert len(r_resumed.lm_results) == 1
        np.testing.assert_allclose(
            float(r_resumed.lm_results[-1].cost),
            float(r_full.lm_results[-1].cost), rtol=0.2)
