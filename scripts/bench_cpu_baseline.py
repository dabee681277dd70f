"""Measured CPU denominator for bench.py's ``vs_baseline``.

The reference's hot loop is Ceres ITERATIVE_SCHUR with *numeric-diff*
DynamicNumericDiffCostFunction blocks on 16 CPU threads
(/root/reference/rig_calibrator/bin/rig_calibrator.cc:489-505,1909-1919).
The reference publishes no numbers, so round 1 used an asserted 5 it/s.
This script replaces the assertion with two measurements on the SAME
problem bench.py times on TPU (64 images, ~38k pixel observations, Tsai
distortion, poses+intrinsics+points floated, f64 like Ceres):

1. ``scipy`` — scipy.optimize.least_squares(method="trf",
   tr_solver="lsmr", jac="2-point", jac_sparsity=<exact BA sparsity>).
   This is the reference's *algorithm class*: numeric-diff Jacobians
   (grouped finite differences over structurally-orthogonal columns, the
   same trick that makes Ceres' per-block numeric diff affordable) plus an
   iterative least-squares subproblem solver (LSMR here, Schur-CG there).
   Residual evaluation is our jitted JAX-CPU graph — vectorized compiled
   code, i.e. at least as fast as Ceres' per-block functor loop.

2. ``jax-cpu`` — our own Schur-LM solver (autodiff, cg_blocks) pinned to
   CPU: the strongest CPU implementation available, an upper bound on any
   CPU baseline.

Each prints iterations/second on this machine's cores plus an
ideal-linear-scaling extrapolation to the reference's 16-thread default
(generous to the reference: Ceres' Jacobian evaluation scales close to
linearly but its linear solve does not).

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/bench_cpu_baseline.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def build_problem(dtype=None, n_images=64, n_per_face=10):
    import jax
    import jax.numpy as jnp
    from multiview_tpu.calib import problem as prob
    from multiview_tpu.utils import synthetic as syn

    dtype = dtype or jnp.float64
    scene = syn.make_cube_scene(n_images=n_images, n_per_face=n_per_face,
                                dist_coeffs=(-0.1, 0.02, 1e-4, -1e-4),
                                pix_noise=0.5, dtype=dtype)
    state0 = syn.perturb_state(scene.true_state, pose_rot=0.01, pose_trans=0.02,
                               point_sigma=0.02)
    cam_mask = prob.build_mask(state0, prob.FloatSpec(cam_poses=True, focal=(0,),
                                                      optical_center=(0,),
                                                      distortion=(0,)),
                               no_rig=True, include_points=False)
    return scene, state0, cam_mask


def bench_scipy(scene, state0, cam_mask, max_nfev=40):
    """Numeric-diff sparse TRF on the free parameters; returns it/s."""
    import jax
    import jax.numpy as jnp
    import scipy.optimize
    import scipy.sparse
    from multiview_tpu.calib import problem as prob

    opts = prob.BAOptions(no_rig=True)
    template = state0
    full_mask = np.concatenate([np.asarray(cam_mask),
                                np.ones(state0.points.size, bool)])
    full0 = np.asarray(prob.pack_state(state0))
    free_idx = np.nonzero(full_mask)[0]

    @jax.jit
    def residuals(full_vec):
        st = prob.unpack_state(full_vec, template)
        return prob.all_residuals(st, scene.observations, scene.models, opts)

    def fun(x):
        full = full0.copy()
        full[free_idx] = x
        return np.asarray(residuals(jnp.asarray(full)))

    # Exact BA sparsity: each pixel-residual row touches its pose's 7
    # entries, the sensor intrinsics (focal 1 + center 2 + dist 4) and its
    # point's 3 entries — the structure Ceres gets from its param blocks.
    obs = scene.observations.pixels[0]
    n_res = residuals(jnp.asarray(full0)).shape[0]
    col_of_full = -np.ones(full0.shape[0], np.int64)
    col_of_full[free_idx] = np.arange(free_idx.size)

    R = state0.world_to_ref.shape[0]
    beg = np.asarray(obs.beg_idx)
    pid = np.asarray(obs.point_idx)
    # layout of pack_state: poses [R*7], rig [7], offset [1], focal [1],
    # center [2], dist [4], d2i [7], dscale [1], points [P*3]
    intr_full = np.arange(R * 7 + 7 + 1, R * 7 + 7 + 1 + 1 + 2 + 4)
    pts_base = full0.shape[0] - state0.points.size
    # vectorized: each residual row touches 7 pose + 7 intr + 3 point cols
    seven = np.arange(7)
    fulls = np.concatenate([
        beg[:, None] * 7 + seven[None, :],
        np.broadcast_to(intr_full, (len(obs), intr_full.size)),
        pts_base + pid[:, None] * 3 + np.arange(3)[None, :]], axis=1)  # [N,17]
    c = col_of_full[fulls]                               # [N,17]
    keep = c >= 0
    rows2 = np.repeat(2 * np.arange(len(obs))[:, None], fulls.shape[1], 1)
    rows = np.concatenate([rows2[keep], rows2[keep] + 1])
    cols = np.concatenate([c[keep], c[keep]])
    sp = scipy.sparse.coo_matrix(
        (np.ones(len(rows), np.uint8), (rows, cols)),
        shape=(n_res, free_idx.size)).tocsr()

    x0 = full0[free_idx]
    fun(x0)  # compile
    t0 = time.perf_counter()
    res = scipy.optimize.least_squares(
        fun, x0, jac="2-point", jac_sparsity=sp, method="trf",
        tr_solver="lsmr", max_nfev=max_nfev, verbose=0)
    dt = time.perf_counter() - t0
    iters = res.njev
    return iters / dt, dict(iters=int(iters), nfev=int(res.nfev),
                            wall_s=round(dt, 2), cost=float(res.cost))


def bench_jax_cpu(scene, state0, cam_mask, iters=10):
    import jax
    from multiview_tpu.calib import problem as prob
    from multiview_tpu.solver import schur

    solver = jax.jit(schur.make_schur_solver(
        state0, scene.observations, scene.models, prob.BAOptions(no_rig=True),
        cam_mask, max_iterations=iters, cg_iterations=30, cg_tolerance=0.1))
    cam0 = prob.pack_state(state0, include_points=False)
    res = solver(cam0, state0.points)
    jax.block_until_ready(res.cost)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = solver(cam0, state0.points)
        jax.block_until_ready(res.cost)
        times.append(time.perf_counter() - t0)
    return int(res.iterations) / min(times), dict(iters=int(res.iterations))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="38k", choices=["38k", "115k", "384k"],
                    help="problem size (bench_scaling.py SIZES)")
    ap.add_argument("--max_nfev", type=int, default=40,
                    help="scipy residual-eval budget (reduce at 384k: "
                    "it/s is the metric, not convergence)")
    ap.add_argument("--skip_jax_cpu", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    sizes = {"38k": (64, 10), "115k": (98, 14), "384k": (160, 20)}
    n_images, n_per_face = sizes[args.size]

    ncpu = os.cpu_count() or 1
    scale16 = 16.0 / ncpu
    scene, state0, cam_mask = build_problem(n_images=n_images,
                                            n_per_face=n_per_face)
    n_obs = sum(len(o) for o in scene.observations.pixels)

    out = {"size": args.size, "n_obs": int(n_obs), "ncpu": ncpu}
    r, info = bench_scipy(scene, state0, cam_mask, max_nfev=args.max_nfev)
    out["scipy_numdiff_trf_iters_per_sec"] = round(r, 3)
    out["scipy_extrap_16thread"] = round(r * scale16, 3)
    out["scipy_info"] = info

    if not args.skip_jax_cpu:
        r2, info2 = bench_jax_cpu(scene, state0, cam_mask)
        out["jax_cpu_schur_iters_per_sec"] = round(r2, 3)
        out["jax_cpu_extrap_16thread"] = round(r2 * scale16, 3)
        out["jax_cpu_info"] = info2

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
