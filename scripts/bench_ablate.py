"""Decompose the Schur-LM iteration cost on the real TPU (VERDICT r2 #2).

Slope method: run 1 LM iteration with cg_tolerance=0 and forced CG budgets
{1, 8, 16}; the slope of wall time vs CG count is the true per-matvec cost
inside the compiled loop (no jit-boundary layout artifacts), the intercept
is the per-LM overhead (block Jacobians, Hpp, preconditioner, residual
evals, backsubstitution, accept logic).

Run: cd /root/repo && python scripts/bench_ablate.py [--size 384k]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="384k")
    ap.add_argument("--mode", default="cg_blocks")
    ap.add_argument("--cg", default="1,8,16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from multiview_tpu.calib import problem as prob
    from multiview_tpu.solver import schur
    from scripts.bench_scaling import SIZES, build

    n_images, n_per_face = SIZES[args.size]
    scene, state0, cam_mask = build(n_images, n_per_face, jnp.float32)
    n_obs = sum(len(o) for o in scene.observations.pixels)
    print(f"[ablate] {args.size}: {n_obs} obs, mode={args.mode}",
          file=sys.stderr)
    cam0 = prob.pack_state(state0, include_points=False)

    def run(cg_iters, reps=8):
        solver = jax.jit(schur.make_schur_solver(
            state0, scene.observations, scene.models,
            prob.BAOptions(no_rig=True), cam_mask, max_iterations=1,
            cg_iterations=cg_iters, cg_tolerance=0.0,
            linear_solver=args.mode))
        res = solver(cam0, state0.points)
        jax.block_until_ready(res.cost)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            res = solver(cam0, state0.points)
            jax.block_until_ready(res.cost)
            times.append(time.perf_counter() - t0)
        return min(times), int(res.cg_iters_total)

    pts = []
    for cg in (int(x) for x in args.cg.split(",")):
        dt, k = run(cg)
        pts.append((k, dt))
        print(f"[ablate] cg={cg}: {dt*1e3:8.2f} ms (cg_total={k})",
              file=sys.stderr)
    (k0, t0_), (k1, t1_) = pts[0], pts[-1]
    slope = (t1_ - t0_) / max(k1 - k0, 1)
    intercept = t0_ - slope * k0
    print(f"[ablate] per-matvec {slope*1e3:.3f} ms, per-LM overhead "
          f"{intercept*1e3:.2f} ms", file=sys.stderr)

    # piece timings (jitted separately — includes boundary layout cost, use
    # as a rough guide to which pieces dominate the intercept)
    lay = schur.cam_layout(state0)
    import functools

    solver_mod = schur

    def time_piece(fn, *a, label="", reps=8):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        jax.block_until_ready(out)
        print(f"[ablate] {label:34s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms",
              file=sys.stderr)

    opts = prob.BAOptions(no_rig=True)
    models = scene.models
    obs = scene.observations

    @jax.jit
    def resid(c, p):
        st = prob.unpack_state(c, state0, include_points=False)
        import dataclasses
        st = dataclasses.replace(st, points=p)
        return prob.all_residuals(st, obs, models, opts)

    time_piece(resid, cam0, state0.points, label="residual eval")

    @jax.jit
    def blocks(c, p):
        import dataclasses
        st = prob.unpack_state(c, state0, include_points=False)
        st = dataclasses.replace(st, points=p)
        return solver_mod._pixel_row_blocks(st, obs.pixels[0], models[0], opts)

    time_piece(blocks, cam0, state0.points, label="pixel row blocks (jacrev)")

    j_cam, j_pt, r = blocks(cam0, state0.points)
    pidx = obs.pixels[0].point_idx
    P = state0.points.shape[0]

    @jax.jit
    def hpp_of(j_pt):
        return jnp.zeros((P, 3, 3), jnp.float32).at[pidx].add(
            jnp.einsum("nri,nrj->nij", j_pt, j_pt))

    time_piece(hpp_of, j_pt, label="Hpp einsum+scatter")


if __name__ == "__main__":
    main()
