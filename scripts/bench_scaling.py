"""BA solver throughput vs problem size + roofline accounting (VERDICT #5).

Measures Schur-LM iterations/second at the PERFORMANCE.md problem sizes
(38k / 115k / 384k / 1.57M observations) for the cg_blocks and jvp/vjp
paths, and accounts achieved HBM bandwidth / FLOP rate per LM iteration
from XLA's compiled cost analysis (flops + bytes accessed of the
1-iteration executable) against the chip's peak.

Run on the real TPU:
    PYTHONPATH=/root/repo python scripts/bench_scaling.py [--sizes 38k,384k]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# (n_images, n_per_face) -> n_obs = n_images * 6 * n_per_face^2 (all points
# visible in all images on the ring)
SIZES = {
    "38k": (64, 10),      # 38,400 obs
    "115k": (98, 14),     # 115,248 obs
    "384k": (160, 20),    # 384,000 obs
    "1.57M": (256, 32),   # 1,572,864 obs
}

# peak numbers per device kind (bf16 matmul TFLOP/s, HBM GB/s)
PEAKS = {
    "TPU v5e": (197.0, 819.0),
    "TPU v5 lite": (197.0, 819.0),
    "TPU v5p": (459.0, 2765.0),
    "TPU v6e": (918.0, 1640.0),
    "TPU v4": (275.0, 1228.0),
}


def build(n_images, n_per_face, dtype):
    import jax.numpy as jnp
    from multiview_tpu.calib import problem as prob
    from multiview_tpu.utils import synthetic as syn

    scene = syn.make_cube_scene(n_images=n_images, n_per_face=n_per_face,
                                dist_coeffs=(-0.1, 0.02, 1e-4, -1e-4),
                                pix_noise=0.5, dtype=dtype)
    state0 = syn.perturb_state(scene.true_state, pose_rot=0.01,
                               pose_trans=0.02, point_sigma=0.02)
    cam_mask = prob.build_mask(
        state0, prob.FloatSpec(cam_poses=True, focal=(0,),
                               optical_center=(0,), distortion=(0,)),
        no_rig=True, include_points=False)
    return scene, state0, cam_mask


def bench_mode(scene, state0, cam_mask, mode, iters=10):
    import jax
    from multiview_tpu.calib import problem as prob
    from multiview_tpu.solver import schur

    t0 = time.perf_counter()
    solver = jax.jit(schur.make_schur_solver(
        state0, scene.observations, scene.models, prob.BAOptions(no_rig=True),
        cam_mask, max_iterations=iters, cg_iterations=30, cg_tolerance=0.1,
        linear_solver=mode))
    cam0 = prob.pack_state(state0, include_points=False)
    res = solver(cam0, state0.points)
    float(res.cost)  # real sync: device->host transfer (axon block_until_ready can return early)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = solver(cam0, state0.points)
        float(res.cost)  # real sync: device->host transfer (axon block_until_ready can return early)
        times.append(time.perf_counter() - t0)
    n_it = int(res.iterations)
    return (n_it / min(times), compile_s, n_it, float(res.cost),
            int(res.cg_iters_total))


def roofline(scene, state0, cam_mask, mode):
    """XLA cost analysis of the 1-LM-iteration executable -> achieved
    GFLOP/s + GB/s over the measured per-iteration wall time.

    Methodology note (kept identical to the round-2 measurement so rounds
    compare): HLO cost analysis counts each while-loop body ONCE, so the
    'bytes accessed' are those of one LM iteration with one CG step plus
    one-time work (initial cost, the per-solve row sort); the wall time is
    a real 1-iteration solve. Steady-state throughput is reported
    separately by bench_mode (10-iteration wall clock)."""
    import jax
    from multiview_tpu.calib import problem as prob
    from multiview_tpu.solver import schur

    fn = schur.make_schur_solver(
        state0, scene.observations, scene.models, prob.BAOptions(no_rig=True),
        cam_mask, max_iterations=1, cg_iterations=30, cg_tolerance=0.1,
        linear_solver=mode)
    cam0 = prob.pack_state(state0, include_points=False)
    lowered = jax.jit(fn).lower(cam0, state0.points)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    res = compiled(cam0, state0.points)
    float(res.cost)  # real sync: device->host transfer (axon block_until_ready can return early)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = compiled(cam0, state0.points)
        float(res.cost)  # real sync: device->host transfer (axon block_until_ready can return early)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {
        "iter_ms": round(dt * 1e3, 2),
        "gflops": round(flops / 1e9, 2),
        "gbytes": round(bytes_acc / 1e9, 3),
        "achieved_gflops_s": round(flops / dt / 1e9, 1),
        "achieved_gb_s": round(bytes_acc / dt / 1e9, 1),
    }


def steady_roofline(scene, state0, cam_mask, mode, cg_k, ks=(2, 6)):
    """TRUE steady-state bytes & time per LM iteration, by construction
    (VERDICT r3 #3): HLO cost analysis counts a while body once regardless
    of trip count, so the production executable cannot be read off. Instead
    lower two fully-UNROLLED executables (1 and 2 LM iterations, each with
    exactly ``cg_k`` unrolled CG steps — the measured production average)
    and difference both their cost analyses and their wall times: the
    marginal iteration is one steady-state LM iteration including its CG
    steps, with all one-time work (row sort, initial blocks, initial cost)
    cancelled. achieved GB/s <= peak by construction."""
    import jax
    from multiview_tpu.calib import problem as prob
    from multiview_tpu.solver import schur

    cam0 = prob.pack_state(state0, include_points=False)
    meas = {}
    for k in ks:
        fn = schur.make_schur_solver(
            state0, scene.observations, scene.models,
            prob.BAOptions(no_rig=True), cam_mask,
            max_iterations=k, cg_iterations=cg_k, cg_tolerance=0.1,
            linear_solver=mode, debug_unroll_lm=k, debug_force_cg=cg_k)
        t0 = time.perf_counter()
        compiled = jax.jit(fn).lower(cam0, state0.points).compile()
        compile_s = time.perf_counter() - t0
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        res = compiled(cam0, state0.points)
        float(res.cost)  # real sync: device->host transfer (axon block_until_ready can return early)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            res = compiled(cam0, state0.points)
            float(res.cost)  # real sync: device->host transfer (axon block_until_ready can return early)
            times.append(time.perf_counter() - t0)
        meas[k] = dict(flops=float(ca.get("flops", 0.0)),
                       bytes=float(ca.get("bytes accessed", 0.0)),
                       t=min(times), compile_s=compile_s)

    k_lo, k_hi = ks
    span = k_hi - k_lo
    d_bytes = (meas[k_hi]["bytes"] - meas[k_lo]["bytes"]) / span
    d_flops = (meas[k_hi]["flops"] - meas[k_lo]["flops"]) / span
    d_t = (meas[k_hi]["t"] - meas[k_lo]["t"]) / span
    return {
        "cg_steps_per_iter": cg_k,
        "unroll_span": list(ks),
        "steady_iter_ms": round(d_t * 1e3, 2),
        "steady_gbytes_per_iter": round(d_bytes / 1e9, 3),
        "steady_gflops_per_iter": round(d_flops / 1e9, 2),
        "steady_achieved_gb_s": round(d_bytes / max(d_t, 1e-9) / 1e9, 1),
        "steady_achieved_gflops_s": round(d_flops / max(d_t, 1e-9) / 1e9, 1),
        "onetime_gbytes": round(
            (meas[k_lo]["bytes"] - k_lo * d_bytes) / 1e9, 3),
        "unroll_wall_ms": {k: round(m["t"] * 1e3, 2) for k, m in meas.items()},
        "unroll_compile_s": {k: round(m["compile_s"], 1)
                             for k, m in meas.items()},
    }


def bench_copy_bandwidth(gb: float = 1.0, reps: int = 20):
    """Measured achievable HBM bandwidth: ``reps`` carry-dependent triads
    (out = a + b + eps) inside ONE dispatched fori_loop on ~gb-sized f32
    arrays (3 streams each). The in-loop form is essential here: a single
    triad walls at dispatch latency through this environment's remote
    tunnel (~30 ms) and reads 17x below peak."""
    import jax
    import jax.numpy as jnp

    n = int(gb * 1e9 / 4 / 2)           # two operand arrays
    n = (n // 1024) * 1024
    a = jnp.ones((n,), jnp.float32)
    b = jnp.ones((n,), jnp.float32)

    @jax.jit
    def f(a, b):
        def body(i, acc):
            return a + (b + acc[0])     # carry-dependent: no CSE/hoisting
        return jax.lax.fori_loop(0, reps, body, b)

    out = f(a, b)
    float(out[0])
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(a, b)
        float(out[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return 3.0 * n * 4 * reps / dt / 1e9


def analytic_iter_bytes(scene, state0, cg_k: int):
    """Design-level HBM byte inventory of ONE steady-state cg_blocks LM
    iteration — the irreducible streams the implementation is built to
    touch, counted once each (fusion-internal traffic excluded). This is a
    LOWER bound on real traffic; XLA cost analysis is an UPPER bound
    (counts every op's logical operands — measured above chip peak at
    384k, i.e. provably overcounting on-chip reuse).

    Streams per iteration (solver/schur.py, use_blocks path):
    - family_blocks at the trial point: obs inputs (pix 2 + 5 index/mask
      cols) read once; j_cam [N,k,B], j_pt [N,k,3], residual [N*k]
      written once, read back by Hpp/diag assembly.
    - Hpp packed accumulation + cam_diag: j_pt, j_cam read once each.
    - SCHUR_JACOBI preconditioner blocks: j_cam, j_pt, hinv9 gather.
    - rhs: one Jmv point-side (j_pt) + one JTmv_c (j_cam + both one-hots).
    - CG x cg_k: camera blocks streamed twice, point blocks twice, one-hot
      selectors three times (Jmv x2 + JTmv_c) per matvec.
    - backsubstitution: one Jmv (j_cam + one-hots) + one JTmv_p (j_pt).
    """
    import numpy as np

    obs = scene.observations.pixels[0]
    N = sum(len(o) for o in scene.observations.pixels)
    R = state0.world_to_ref.shape[0]
    B = 14 + 7 + 1 + 1 + 2 + int(state0.dist[0].size)   # row block cols
    k = 2
    f32, bf16 = 4, 2
    j_cam = N * k * B * f32
    j_pt = N * k * 3 * f32
    # ONE folded selector (bracket fold, solver/schur.py: end_idx is
    # structurally beg_idx or beg_idx+1, so beg+end selector matmuls share
    # a single [N,R] stream against a packed [R,14] table)
    oh = N * R * bf16
    resid = N * k * f32
    obs_in = N * 7 * f32

    fam_blocks = obs_in + (j_cam + j_pt + resid)        # write
    hpp = j_cam + j_pt                                   # read back
    precond = j_cam + j_pt
    rhs = j_pt + (j_cam + oh)
    cg = cg_k * (2 * j_cam + 2 * j_pt + 3 * oh)
    backsub = (j_cam + oh) + j_pt
    total = fam_blocks + hpp + precond + rhs + cg + backsub
    return {
        "N": int(N), "R": int(R), "B": int(B),
        "gb_j_cam": round(j_cam / 1e9, 3),
        "gb_onehots": round(oh / 1e9, 3),
        "gb_per_cg_step": round((2 * j_cam + 2 * j_pt + 3 * oh) / 1e9, 3),
        "gb_total_per_iter": round(total / 1e9, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="38k,115k,384k,1.57M")
    ap.add_argument("--modes", default="cg_blocks,cg")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--roofline", action="store_true",
                    help="also run XLA cost-analysis roofline per size")
    ap.add_argument("--steady", action="store_true",
                    help="unrolled-executable steady-state roofline per size")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown")
    peak = PEAKS.get(kind)
    print(f"device: {dev.platform} {kind} peak={peak}", file=sys.stderr)

    out = {"device_kind": kind, "rows": []}
    for name in args.sizes.split(","):
        n_images, n_per_face = SIZES[name]
        scene, state0, cam_mask = build(n_images, n_per_face, jnp.float32)
        n_obs = sum(len(o) for o in scene.observations.pixels)
        row = {"size": name, "n_obs": int(n_obs),
               "cam_params": int(cam_mask.shape[0]),
               "n_points": int(state0.points.shape[0])}
        cg_avg = {}
        for mode in args.modes.split(","):
            r, comp, n_it, cost, cg_tot = bench_mode(scene, state0, cam_mask,
                                                     mode, args.iters)
            cg_avg[mode] = max(1, round(cg_tot / max(n_it, 1)))
            row[mode] = {"iters_per_sec": round(r, 2),
                         "compile_s": round(comp, 1),
                         "cg_per_iter_measured": round(cg_tot / max(n_it, 1), 2)}
            print(f"[{name}] {mode}: {r:.2f} it/s (compile {comp:.1f} s, "
                  f"{n_it} iters, {cg_tot} cg, cost {cost:.4g})",
                  file=sys.stderr)
        if args.steady:
            for mode in args.modes.split(","):
                st = steady_roofline(scene, state0, cam_mask, mode,
                                     cg_avg[mode])
                if peak:
                    st["pct_flops_peak"] = round(
                        100 * st["steady_achieved_gflops_s"] / (peak[0] * 1e3), 2)
                    st["pct_hbm_peak_CA_upper_bound"] = round(
                        100 * st["steady_achieved_gb_s"] / peak[1], 1)
                if mode == "cg_blocks":
                    inv = analytic_iter_bytes(scene, state0, cg_avg[mode])
                    st["analytic_inventory"] = inv
                    bw = bench_copy_bandwidth()
                    st["measured_copy_gb_s"] = round(bw, 1)
                    st["pct_speed_of_light"] = round(
                        100 * inv["gb_total_per_iter"]
                        / max(st["steady_iter_ms"] / 1e3, 1e-9) / bw, 1)
                row[f"steady_{mode}"] = st
                print(f"[{name}] steady {mode}: {st}", file=sys.stderr)
        if args.roofline:
            for mode in args.modes.split(","):
                rl = roofline(scene, state0, cam_mask, mode)
                if peak:
                    rl["pct_flops_peak"] = round(
                        100 * rl["achieved_gflops_s"] / (peak[0] * 1e3), 2)
                    rl["pct_hbm_peak"] = round(
                        100 * rl["achieved_gb_s"] / peak[1], 1)
                row[f"roofline_{mode}"] = rl
                print(f"[{name}] roofline {mode}: {rl}", file=sys.stderr)
        out["rows"].append(row)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
