"""Worker process for the multi-process distributed solve test.

Launched (2x) by tests/test_sharding.py::TestMultiProcess: joins a
2-process jax.distributed cluster over CPU devices (4 local -> 8 global),
builds the SAME synthetic scene in every process, shards observations over
the global mesh, runs the Schur-LM solve, and writes its result to an npz
for the parent to compare across processes and against the single-process
solve. Exercises parallel/distributed.py's real multi-process path
(SURVEY 2.3 DCN half; VERDICT r3 #6) — cross-process collectives ride the
CPU gloo backend here, XLA collectives on a pod.

Usage: python mp_solver_worker.py <process_id> <num_processes> <port> <out.npz>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass


def compute_outlier_gmask(cam_vec, points, state_template, scene, opts):
    """Deterministic pass-1 outlier gate shared by the workers and the
    single-process reference in test_sharding.py: flag the worst 10% of
    pixel observations by pass-1 residual norm (identical host inputs in
    every process -> identical mask everywhere, like the production gates
    that compute from replicated solver outputs)."""
    import dataclasses
    import numpy as np
    from multiview_tpu.calib import problem as prob

    st = prob.unpack_state(cam_vec, state_template, include_points=False)
    st = dataclasses.replace(st, points=points)
    parts = []
    for obs in scene.observations.pixels:
        r = prob.pixel_residuals(st, obs, scene.models[obs.sensor], opts,
                                 robust=False)
        parts.append(np.linalg.norm(np.asarray(r), axis=-1))
    rn = np.concatenate(parts)
    thresh = np.quantile(rn, 0.9)
    return rn <= thresh


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    import numpy as np
    from multiview_tpu.parallel import distributed as dist
    from multiview_tpu.parallel import sharding as sh
    from multiview_tpu.calib import problem as prob
    from multiview_tpu.solver import schur
    from multiview_tpu.utils import synthetic as syn

    active = dist.initialize(coordinator_address=f"localhost:{port}",
                             num_processes=nproc, process_id=pid)
    assert active and jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc

    scene = syn.make_cube_scene(n_images=8, n_per_face=3, pix_noise=0.3,
                                dist_coeffs=(-0.1, 0.02, 1e-4, -1e-4))
    state0 = syn.perturb_state(scene.true_state)
    cam_mask = prob.build_mask(state0, prob.FloatSpec(cam_poses=True),
                               no_rig=True, include_points=False)
    opts = prob.BAOptions(no_rig=True)

    mesh = dist.global_mesh()
    obs_sharded = sh.shard_observations(scene.observations, mesh)
    state_r = sh.replicate(state0, mesh)
    solver = jax.jit(schur.make_schur_solver(
        state_r, obs_sharded, scene.models, opts, cam_mask,
        max_iterations=8, cg_iterations=30))
    cam0 = prob.pack_state(state_r, include_points=False)
    res = solver(cam0, state_r.points, obs_sharded)

    hlo = solver.lower(cam0, state_r.points, obs_sharded).compile().as_text()
    # fully-replicated views of the results for host export
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    cam = np.asarray(jax.device_put(res.cam, rep))
    pts = np.asarray(jax.device_put(res.points, rep))

    # PASS 2 (VERDICT r4 #8): the production loop flags outliers after each
    # pass and re-shards the updated masks (_scatter_mask_updates keeps the
    # old masks' cross-process sharding via _resharded_like); run a second
    # solve with the updated masks through the SAME compiled solver
    # (observations are runtime args — no recompile).
    from multiview_tpu.calib import calibrator as cal
    gmask = compute_outlier_gmask(cam, pts, state0, scene, opts)
    obs2 = cal._scatter_mask_updates(obs_sharded, gmask)
    for o_old, o_new in zip(obs_sharded.pixels, obs2.pixels):
        assert o_new.mask.sharding == o_old.mask.sharding, \
            "mask update lost its cross-process sharding"
    res2 = solver(cam0, state_r.points, obs2)
    cam2 = np.asarray(jax.device_put(res2.cam, rep))
    pts2 = np.asarray(jax.device_put(res2.points, rep))

    np.savez(out_path, cam=cam, points=pts,
             cost=float(res.cost), initial_cost=float(res.initial_cost),
             iterations=int(res.iterations),
             cam2=cam2, points2=pts2, cost2=float(res2.cost),
             initial_cost2=float(res2.initial_cost),
             gmask_flagged=int((~gmask).sum()),
             process_count=jax.process_count(),
             n_global_devices=len(jax.devices()),
             all_reduce_count=hlo.count("all-reduce"))
    print(f"worker {pid}: cost={float(res.cost):.8g} "
          f"pass2_cost={float(res2.cost):.8g} "
          f"flagged={int((~gmask).sum())} "
          f"devices={len(jax.devices())} "
          f"all_reduce={hlo.count('all-reduce')}", flush=True)


if __name__ == "__main__":
    main()
