"""Global-SfM graph machinery at reference scale (VERDICT r4 #5).

Theia's global recipe runs at hundreds-to-thousands of views
(`/root/reference/rig_calibrator/theia_flags.txt:26-165`); this bench
builds a synthetic view graph at that scale — V views on a survey ring,
~E edges (temporal + loop closures), 15% of relative directions corrupted
(half reversed, half random) — and measures the wall time + robustness of:

  1. spanning-tree init + robust rotation averaging
  2. filter_directions_triplet (positive-closure SVD over triangles)
  3. filter_directions_1dsfm (48-axis projection + Eades feedback-arc)
  4. position solve from the filtered graph

Asserts: rotation error small, most corrupted edges caught, positions
survive (relative error small after similarity alignment).

Run (host loops are the concern -> CPU):
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/bench_global_graph.py --views 800
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_graph(V: int, seed: int = 0, corrupt_frac: float = 0.15,
                temporal_span: int = 4, loop_per_view: int = 20,
                loop_radius: float = 4.0):
    import jax.numpy as jnp
    from multiview_tpu.sfm import global_sfm as gs
    from multiview_tpu.geometry import pose as pose_mod

    rng = np.random.default_rng(seed)
    # survey ring with jitter: positions on a slow spiral, rotations facing
    # center with noise
    t = np.linspace(0, 4 * np.pi, V)
    ctr = np.stack([np.cos(t) * (10 + 0.3 * t), np.sin(t) * (10 + 0.3 * t),
                    0.05 * t], axis=1)
    ctr += rng.normal(0, 0.05, ctr.shape)

    def look_rot(i):
        fwd = -ctr[i] / np.linalg.norm(ctr[i])
        up = np.array([0.0, 0, 1])
        s = np.cross(fwd, up)
        s /= np.linalg.norm(s)
        u = np.cross(s, fwd)
        return np.stack([s, u, fwd])  # world->cam rows

    R = np.stack([look_rot(i) for i in range(V)])

    edges = []
    for i in range(V):
        for dj in range(1, temporal_span + 1):
            if i + dj < V:
                edges.append((i, i + dj))
    # loop closures between spiral turns
    n_loop = V * loop_per_view
    a = rng.integers(0, V, n_loop)
    b = rng.integers(0, V, n_loop)
    for i, j in zip(a, b):
        i, j = int(min(i, j)), int(max(i, j))
        if j - i > temporal_span + 1 \
                and np.linalg.norm(ctr[i] - ctr[j]) < loop_radius:
            edges.append((i, j))
    edges = sorted(set(edges))
    E = len(edges)
    edges_np = np.asarray(edges)

    rel_rot = []
    rel_dir = []
    for i, j in edges:
        Rij = R[j] @ R[i].T
        q = np.asarray(pose_mod.matrix_to_quat(jnp.asarray(Rij)))
        rel_rot.append(q)
        d_w = ctr[j] - ctr[i]
        d_w /= np.linalg.norm(d_w)
        rel_dir.append(R[i] @ d_w)  # cam-i frame (view_graph convention)
    rel_rot = np.asarray(rel_rot)
    rel_dir = np.asarray(rel_dir)

    n_bad = int(corrupt_frac * E)
    bad_idx = rng.choice(E, n_bad, replace=False)
    bad = np.zeros(E, bool)
    bad[bad_idx] = True
    half = n_bad // 2
    reversed_mask = np.zeros(E, bool)
    reversed_mask[bad_idx[:half]] = True                     # reversed
    rel_dir[bad_idx[:half]] = -rel_dir[bad_idx[:half]]
    rnd = rng.standard_normal((n_bad - half, 3))
    rel_dir[bad_idx[half:]] = rnd / np.linalg.norm(rnd, axis=1, keepdims=True)

    graph = gs.ViewGraph(jnp.asarray(edges_np), jnp.asarray(rel_rot),
                         jnp.asarray(rel_dir), jnp.asarray(np.full(E, 64.0)))
    return graph, R, ctr, bad, reversed_mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=800)
    ap.add_argument("--corrupt", type=float, default=0.15)
    ap.add_argument("--temporal_span", type=int, default=4)
    ap.add_argument("--loop_per_view", type=int, default=20)
    ap.add_argument("--loop_radius", type=float, default=4.0)
    args = ap.parse_args()

    import jax.numpy as jnp
    from multiview_tpu.sfm import global_sfm as gs
    from multiview_tpu.geometry import pose as pose_mod

    V = args.views
    graph, R_true, ctr_true, bad, reversed_mask = build_graph(
        V, corrupt_frac=args.corrupt, temporal_span=args.temporal_span,
        loop_per_view=args.loop_per_view, loop_radius=args.loop_radius)
    E = len(np.asarray(graph.edges))
    print(f"graph: V={V} E={E} corrupted={int(bad.sum())}", file=sys.stderr)

    t0 = time.perf_counter()
    q = gs.rotation_averaging(graph, V)
    t_rot = time.perf_counter() - t0
    # rotation accuracy (gauge-aligned via view 0)
    R_est = np.asarray(pose_mod.quat_to_matrix(q))
    G = R_true[0].T @ R_est[0]
    errs = []
    for i in range(0, V, 7):
        Rd = (R_est[i] @ G.T) @ R_true[i].T
        cosang = (np.trace(Rd) - 1) / 2
        errs.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
    rot_err = float(np.median(errs))

    world = gs.rel_dir_to_world(graph, q)

    t0 = time.perf_counter()
    g_tri, keep_tri, judged = gs.filter_directions_triplet(world,
                                                           return_judged=True)
    t_tri = time.perf_counter() - t0

    # same composition as run_global_sfm: 1DSfM judges only the edges the
    # triplet could not (too few informative triangles)
    t0 = time.perf_counter()
    g_1d, keep_1d = gs.filter_directions_1dsfm(
        g_tri, threshold=0.45, only=~judged[np.asarray(keep_tri, bool)])
    t_1d = time.perf_counter() - t0

    keep = keep_tri.copy()
    keep[np.nonzero(keep_tri)[0]] &= keep_1d
    caught = int((~keep[bad]).sum())
    # the harmful class: RANDOM directions (reversals are invisible to the
    # position cost — P = I - d d^T is sign-invariant — and the robust
    # IRLS absorbs what filtering misses; see position_estimation).
    # Filters can only judge edges with triangle evidence; the per-filter
    # assert is over the JUDGED harmful edges, the system-level assert is
    # the final ATE.
    rand_bad = bad & ~reversed_mask
    caught_rand = int((~keep[rand_bad]).sum())
    judged_rand = rand_bad & judged
    caught_judged_rand = int((~keep[judged_rand]).sum())
    false_pos = int((~keep[~bad]).sum())

    t0 = time.perf_counter()
    pos = gs.position_estimation(g_1d, q, V)
    t_pos = time.perf_counter() - t0

    # similarity-align positions to truth
    from multiview_tpu.geometry import registration as reg
    pos = np.asarray(pos)
    ok = np.isfinite(pos).all(axis=1)
    scale, T = reg.find_similarity_transform(jnp.asarray(pos[ok]),
                                             jnp.asarray(ctr_true[ok]))
    aligned = np.asarray(reg.apply_similarity(scale, T, jnp.asarray(pos[ok])))
    diam = np.linalg.norm(ctr_true.max(0) - ctr_true.min(0))
    ate_rel = float(np.sqrt(np.mean(np.sum((aligned - ctr_true[ok]) ** 2, -1)))
                    / diam)

    out = {
        "views": V, "edges": E, "corrupted": int(bad.sum()),
        "rot_avg_s": round(t_rot, 2), "rot_err_med_deg": round(rot_err, 3),
        "triplet_filter_s": round(t_tri, 2),
        "1dsfm_filter_s": round(t_1d, 2),
        "position_solve_s": round(t_pos, 2),
        "caught": caught, "caught_frac": round(caught / max(int(bad.sum()), 1), 3),
        "caught_random_frac": round(caught_rand / max(int(rand_bad.sum()), 1), 3),
        "caught_judged_random_frac": round(
            caught_judged_rand / max(int(judged_rand.sum()), 1), 3),
        "false_pos": false_pos,
        "ate_rel": round(ate_rel, 4),
    }
    print(json.dumps(out))
    assert rot_err < 2.0, f"rotation averaging degraded: {rot_err} deg"
    assert caught_judged_rand >= 0.7 * int(judged_rand.sum()), \
        f"filters caught only {caught_judged_rand}/{int(judged_rand.sum())} " \
        f"judged random dirs"
    assert ate_rel < 0.05, f"positions degraded: {ate_rel}"
    print("SCALE ASSERTS PASSED", file=sys.stderr)


if __name__ == "__main__":
    main()
