"""Global SfM pose initialization: rotation averaging + position estimation.

The TheiaSfM-replacement (SURVEY.md 2.2): the reference pins Theia's global
pipeline — ROBUST_L1L2 rotation averaging + least-unsquared-deviation
position estimation (`/root/reference/rig_calibrator/theia_flags.txt:26-165`)
— which is re-designed here as batched JAX IRLS solves:

- rotation averaging: spanning-tree init, then iteratively re-weighted
  Gauss-Newton in the tangent space; all edge residuals
  log(R_j^-1 R_ij R_i) are computed as one vmapped batch and the normal
  equations assembled by segment-sum (soft-L1 weights ~ Theia's L1L2).
- position estimation: cross-product (direction-alignment) linear system
  over camera centers with IRLS soft-L1 weights (~ LUD), gauge fixed by
  pinning center 0 and unit mean baseline.

Convention: world->cam poses; an edge (i,j) carries the relative transform
cam_i -> cam_j: R_ij = R_j R_i^T, and the translation direction of the
camera-j center seen from i in world coordinates.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod


class ViewGraph(NamedTuple):
    """Pairwise relative rotations/directions between views."""

    edges: jnp.ndarray      # [E,2] int32 (i,j)
    rel_rot: jnp.ndarray    # [E,4] quaternion q_ij: R_ij = R_j R_i^T (xyzw)
    rel_dir: jnp.ndarray    # [E,3] unit direction of (c_j - c_i) in WORLD frame
                            # (only used by position estimation; can be zeros)
    weight: jnp.ndarray     # [E] edge confidence (e.g. inlier counts)


def spanning_tree_rotations(graph: ViewGraph, num_views: int,
                            rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Initial global rotations by composing relative rotations over a
    max-weight spanning tree (host-side BFS). With ``rng``, edge priorities
    are randomized (for multi-tree robust initialization)."""
    edges = np.asarray(graph.edges)
    w = np.asarray(graph.weight).astype(float)
    if rng is not None:
        w = w * rng.uniform(0.1, 1.0, size=w.shape)
    order = np.argsort(-w)
    adj = {}
    for e in order:
        i, j = int(edges[e, 0]), int(edges[e, 1])
        adj.setdefault(i, []).append((j, e, False))
        adj.setdefault(j, []).append((i, e, True))

    q = np.tile([0.0, 0.0, 0.0, 1.0], (num_views, 1))
    seen = np.zeros(num_views, bool)
    seen[0] = True
    stack = [0]
    rel = np.asarray(graph.rel_rot)
    while stack:
        i = stack.pop()
        for j, e, flipped in adj.get(i, []):
            if seen[j]:
                continue
            seen[j] = True
            qij = jnp.asarray(rel[e])
            if flipped:
                qij = pose_mod.quat_conj(qij)
            # R_j = R_ij R_i
            q[j] = np.asarray(pose_mod.quat_mul(qij, jnp.asarray(q[i])))
            stack.append(j)
    if not seen.all():
        raise ValueError("View graph is disconnected")
    return q


def _rotation_averaging_core(edges, rel, base_w, init_q, num_views: int,
                             iterations: int, loss_scale: float):
    """One IRLS Gauss-Newton rotation-averaging run (traced core)."""
    q = init_q
    i_idx = edges[:, 0]
    j_idx = edges[:, 1]

    def residuals(q):
        qi = q[i_idx]
        qj = q[j_idx]
        # r = log( R_j^-1 R_ij R_i )
        r = pose_mod.quat_mul(pose_mod.quat_conj(qj), pose_mod.quat_mul(rel, qi))
        return pose_mod.quat_log(r)  # [E,3]

    def step(q, _):
        r = residuals(q)                       # [E,3]
        nrm = jnp.linalg.norm(r, axis=-1)
        w = base_w / jnp.sqrt(1.0 + (nrm / loss_scale) ** 2)  # soft-L1
        # normal equations for unknown increments w_i (per-view 3-vec):
        # r_e ~ d_i - d_j  (first-order) -> minimize sum w |r + d_i - d_j|^2
        # solve with a few Jacobi sweeps (diagonal = sum of adjacent weights)
        denom = jnp.zeros(num_views, q.dtype)
        denom = denom.at[i_idx].add(w).at[j_idx].add(w)
        denom = jnp.maximum(denom, 1e-12)

        def jacobi(_, d):
            # d: [V,3]; update d = (sum_w neighbor terms) / denom
            rhs = jnp.zeros((num_views, 3), q.dtype)
            rhs = rhs.at[i_idx].add(w[:, None] * (d[j_idx] - r))
            rhs = rhs.at[j_idx].add(w[:, None] * (d[i_idx] + r))
            d = rhs / denom[:, None]
            return d.at[0].set(0.0)  # gauge: view 0 fixed

        d = jax.lax.fori_loop(0, 12, jacobi, jnp.zeros((num_views, 3), q.dtype))
        q_new = pose_mod.quat_mul(q, pose_mod.quat_exp(d))
        q_new = pose_mod.quat_normalize(q_new)
        return q_new, jnp.sum(w * nrm)

    q, _ = jax.lax.scan(step, q, None, length=iterations)
    # outlier-immune fitness score: median edge residual
    r = residuals(q)
    score = jnp.median(jnp.linalg.norm(r, axis=-1))
    return q, score


import functools as _functools


@_functools.partial(jax.jit,
                    static_argnames=("num_views", "iterations"))
def _rotation_averaging_multi(edges, rel, base_w, inits, num_views,
                              iterations, loss_scale):
    """ALL candidate spanning-tree initializations averaged in ONE
    dispatch (vmapped over the leading init axis) — the per-tree loop paid
    a full device round-trip per tree through this environment's dispatch
    tunnel (measured: the 16-tree robust init dominated the sfm-init
    global stage). Returns (qs [T,V,4], scores [T])."""
    return jax.vmap(lambda q0: _rotation_averaging_core(
        edges, rel, base_w, q0, num_views, iterations, loss_scale))(inits)


def rotation_averaging(graph: ViewGraph, num_views: int, iterations: int = 30,
                       loss_scale: float = 0.1, init: Optional[np.ndarray] = None
                       ) -> jnp.ndarray:
    """Robust rotation averaging -> global quaternions [V,4] (view 0 pinned).

    IRLS Gauss-Newton in so(3): residual per edge r_e = log(R_j^T R_ij R_i),
    Jacobian wrt (w_i, w_j) approximated by (R_j^T R_ij, -I) ~ (I, -I) in the
    well-conditioned near-convergence regime, weights soft-L1 in |r|.
    """
    if init is None:
        init = spanning_tree_rotations(graph, num_views)
    qs, _ = _rotation_averaging_multi(
        jnp.asarray(graph.edges), jnp.asarray(graph.rel_rot),
        jnp.asarray(graph.weight, jnp.asarray(init).dtype),
        jnp.asarray(init)[None], num_views, iterations, loss_scale)
    return qs[0]


def filter_graph_by_rotation(graph: ViewGraph, rotations: jnp.ndarray,
                             max_deg: float = 10.0) -> ViewGraph:
    """Drop edges whose relative rotation disagrees with the global solution
    by more than max_deg — the role of Theia's view-pair filtering
    (theia_flags.txt post_rotation_filtering / 1DSfM spirit)."""
    qi = rotations[graph.edges[:, 0]]
    qj = rotations[graph.edges[:, 1]]
    r = pose_mod.quat_mul(pose_mod.quat_conj(qj),
                          pose_mod.quat_mul(graph.rel_rot, qi))
    err_deg = np.degrees(np.linalg.norm(np.asarray(pose_mod.quat_log(r)), axis=-1))
    keep = err_deg <= max_deg
    if keep.sum() < len(keep):
        keep_idx = np.nonzero(keep)[0]
        graph = ViewGraph(graph.edges[keep_idx], graph.rel_rot[keep_idx],
                          graph.rel_dir[keep_idx], graph.weight[keep_idx])
    return graph


def _median_edge_residual(graph: ViewGraph, q) -> float:
    qi = q[graph.edges[:, 0]]
    qj = q[graph.edges[:, 1]]
    r = pose_mod.quat_mul(pose_mod.quat_conj(qj),
                          pose_mod.quat_mul(graph.rel_rot, qi))
    return float(np.median(np.linalg.norm(np.asarray(pose_mod.quat_log(r)), axis=-1)))


def robust_rotation_averaging(graph: ViewGraph, num_views: int,
                              num_trees: int = 16, iterations: int = 30,
                              loss_scale: float = 0.1,
                              filter_deg: float = 15.0, seed: int = 0
                              ) -> Tuple[jnp.ndarray, ViewGraph]:
    """Rotation averaging robust to outlier edges.

    A single outlier edge in the spanning-tree init poisons everything
    downstream of it, and the IRLS consensus then *keeps* the outlier (the
    inlier edges look wrong). So: try several randomized spanning trees, run
    the IRLS from each, keep the solution with the smallest median edge
    residual (an outlier-immune score), then drop edges inconsistent with it
    and do a final averaging round. Returns (rotations, filtered graph)."""
    rng = np.random.default_rng(seed)
    inits = np.stack([
        spanning_tree_rotations(graph, num_views,
                                rng=None if k == 0 else rng)
        for k in range(num_trees)])
    dtype = jnp.asarray(inits).dtype
    # all trees in ONE vmapped dispatch (was one round-trip per tree)
    qs, scores = _rotation_averaging_multi(
        jnp.asarray(graph.edges), jnp.asarray(graph.rel_rot),
        jnp.asarray(graph.weight, dtype), jnp.asarray(inits),
        num_views, iterations, loss_scale)
    scores = np.asarray(scores)
    best = int(np.argmin(scores))
    best_q, best_score = qs[best], float(scores[best])

    filtered = filter_graph_by_rotation(graph, best_q, filter_deg)
    if filtered.edges.shape[0] < graph.edges.shape[0]:
        try:
            init = spanning_tree_rotations(filtered, num_views)
            q2, score2 = _rotation_averaging_multi(
                jnp.asarray(filtered.edges), jnp.asarray(filtered.rel_rot),
                jnp.asarray(filtered.weight, dtype),
                jnp.asarray(init)[None], num_views, iterations, loss_scale)
            if float(score2[0]) <= best_score:
                best_q = q2[0]
            return best_q, filtered
        except ValueError:
            pass  # filtering disconnected the graph; keep unfiltered solution
    return best_q, filtered


def _eades_order(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                 num_views: int) -> np.ndarray:
    """Greedy Eades–Lin–Smyth ordering minimizing backward-edge weight of a
    weighted directed graph (the minimum-feedback-arc-set heuristic 1DSfM
    uses per projection subproblem). Returns a permutation [V] of node ids
    in left-to-right order."""
    V = num_views
    out_w = np.zeros(V)
    in_w = np.zeros(V)
    np.add.at(out_w, src, w)
    np.add.at(in_w, dst, w)
    adj_out: list = [[] for _ in range(V)]
    adj_in: list = [[] for _ in range(V)]
    for s, t, ww in zip(src, dst, w):
        adj_out[s].append((t, ww))
        adj_in[t].append((s, ww))
    alive = np.ones(V, bool)
    head: list = []
    tail: list = []
    score = out_w - in_w
    for _ in range(V):
        sinks = np.nonzero(alive & (out_w <= 1e-12))[0]
        if sinks.size:
            v = int(sinks[0])
            tail.append(v)
        else:
            sources = np.nonzero(alive & (in_w <= 1e-12))[0]
            if sources.size:
                v = int(sources[0])
            else:
                v = int(np.argmax(np.where(alive, score, -np.inf)))
            head.append(v)
        alive[v] = False
        for t, ww in adj_out[v]:
            if alive[t]:
                in_w[t] -= ww
                score[t] = out_w[t] - in_w[t]
        for s, ww in adj_in[v]:
            if alive[s]:
                out_w[s] -= ww
                score[s] = out_w[s] - in_w[s]
    return np.asarray(head + tail[::-1], np.int64)


def _keep_if_connected(graph: ViewGraph, keep: np.ndarray,
                       quality: Optional[np.ndarray] = None
                       ) -> Tuple[ViewGraph, np.ndarray]:
    """Apply a keep mask, then REPAIR it so no touched view is stranded and
    the kept subgraph stays one component: flagged edges are restored
    best-quality-first until both hold.

    (Round-4 version discarded the ENTIRE mask whenever it would strand a
    view — all-or-nothing. At reference scale some view almost always
    loses all its edges, which silently turned the filters into no-ops:
    measured at V=200/E=974 with 15% corrupted directions, the triplet
    filter kept all 974 edges and positions degraded 35x vs the
    oracle-filtered solve.)

    quality: per-edge score, higher = restore first (default: edge weight).
    """
    edges = np.asarray(graph.edges)
    E = len(edges)
    if keep.all() or not keep.any():
        return graph, np.ones(E, bool)
    keep = keep.copy()
    q = np.asarray(graph.weight, float) if quality is None \
        else np.asarray(quality, float)
    V = int(edges.max()) + 1
    touched = np.zeros(V, bool)
    touched[edges.reshape(-1)] = True

    # 1) stranded views: restore each one's best flagged edge
    deg = np.zeros(V, np.int64)
    np.add.at(deg, edges[keep].reshape(-1), 1)
    for v in np.nonzero(touched & (deg == 0))[0]:
        cand = np.nonzero(((edges[:, 0] == v) | (edges[:, 1] == v))
                          & ~keep)[0]
        best = cand[np.argmax(q[cand])]
        keep[best] = True
        deg[edges[best, 0]] += 1
        deg[edges[best, 1]] += 1

    # 2) connectivity: Kruskal-restore flagged edges (best first) until the
    # kept subgraph of touched views is one component
    parent = np.arange(V)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in edges[keep]:
        parent[find(int(i))] = find(int(j))
    n_comp = len({find(int(v)) for v in np.nonzero(touched)[0]})
    if n_comp > 1:
        for e in np.argsort(-q):
            if keep[e]:
                continue
            ri, rj = find(int(edges[e, 0])), find(int(edges[e, 1]))
            if ri != rj:
                parent[ri] = rj
                keep[e] = True
                n_comp -= 1
                if n_comp == 1:
                    break

    keep_idx = np.nonzero(keep)[0]
    return ViewGraph(graph.edges[keep_idx], graph.rel_rot[keep_idx],
                     graph.rel_dir[keep_idx], graph.weight[keep_idx]), keep


def filter_directions_triplet(graph: ViewGraph, resid_tol: float = 0.05,
                              bad_frac: float = 0.5, min_tri: int = 2,
                              return_judged: bool = False):
    """Triplet-closure filtering of world-frame translation directions.

    Every triangle (a,b,c) of edges must admit POSITIVE scales x with
    x1 d_ab + x2 d_bc - x3 d_ac ~= 0 (the centers close the loop). The
    smallest-singular-vector solve of the 3x3 direction matrix gives the
    best closure: a triangle is inconsistent when its residual (smallest
    singular value) exceeds ``resid_tol`` or any scale is non-positive —
    reversed/random outlier directions fail the positivity test with very
    high margin. Edges whose inconsistent-triangle fraction exceeds
    ``bad_frac`` (given >= ``min_tri`` triangles) are rejected.

    The sharper half of the reference recipe's relative-translation
    filtering (`theia_flags.txt:93`); ``filter_directions_1dsfm`` covers
    triangle-poor graphs. Returns (filtered graph, keep mask [E])."""
    import collections

    edges = np.asarray(graph.edges)
    d = np.asarray(graph.rel_dir)
    E = len(edges)
    if E == 0:
        return graph, np.ones(0, bool)
    emap = {}
    for e, (i, j) in enumerate(edges):
        emap[(int(i), int(j))] = e
    nbrs = collections.defaultdict(set)
    for i, j in edges:
        nbrs[int(i)].add(int(j))
        nbrs[int(j)].add(int(i))

    def get(i, j):
        if (i, j) in emap:
            return emap[(i, j)], 1.0
        return emap[(j, i)], -1.0

    tri_edges = []
    tri_mats = []
    seen = set()
    for (i, j) in emap:
        for k in (nbrs[i] & nbrs[j]):
            tri = tuple(sorted((i, j, k)))
            if tri in seen:
                continue
            seen.add(tri)
            a, b, c = tri
            e1, s1 = get(a, b)
            e2, s2 = get(b, c)
            e3, s3 = get(a, c)
            tri_edges.append((e1, e2, e3))
            tri_mats.append(np.stack([s1 * d[e1], s2 * d[e2], -s3 * d[e3]],
                                     axis=1))
    if not tri_mats:
        if return_judged:
            return graph, np.ones(E, bool), np.zeros(E, bool)
        return graph, np.ones(E, bool)
    M = np.stack(tri_mats)                       # [T,3,3]
    _, S, Vt = np.linalg.svd(M)                  # batched
    x = Vt[:, -1, :]                             # [T,3] null-ish vector
    x = np.where(x[:, 2:3] < 0, -x, x)
    ok = (S[:, -1] < resid_tol) & (x > 1e-6).all(axis=1)
    # near-collinear triangles are closure-degenerate (rank<2 direction
    # matrix: any sign pattern closes with positive scales) — they carry
    # no information either way, so they vote in neither bad nor tot
    informative = S[:, 1] > 0.1
    te = np.asarray(tri_edges)                   # [T,3]

    # iterative EXPLAIN-AWAY attribution: a failing triangle containing an
    # already-marked edge is explained by it and votes against nobody
    # else. Without this, every bad edge's failing triangles implicate two
    # good members each; at 15% corruption that killed ~170 good edges of
    # 974 and degraded the downstream position solve 35x (measured; the
    # 1DSfM paper's aggregation faces the same attribution problem).
    fail = informative & ~ok
    passing = informative & ok
    marked = np.zeros(E, bool)
    frac = np.zeros(E)
    tot = np.zeros(E)
    for _ in range(4):
        mk = marked[te]                          # [T,3]
        bad = np.zeros(E)
        tot = np.zeros(E)
        for c in range(3):
            others = [i for i in range(3) if i != c]
            other_marked = mk[:, others].any(axis=1)
            vote_bad = fail & ~other_marked
            counted = passing | vote_bad
            np.add.at(bad, te[:, c], vote_bad.astype(float))
            np.add.at(tot, te[:, c], counted.astype(float))
        frac = bad / np.maximum(tot, 1e-12)
        new_marked = (tot >= min_tri) & (frac > bad_frac)
        if (new_marked == marked).all():
            break
        marked = new_marked
    keep = (tot < min_tri) | (frac <= bad_frac)
    # repair restores least-inconsistent edges first
    out_graph, out_keep = _keep_if_connected(graph, keep, quality=-frac)
    if return_judged:
        # judged = enough informative triangles to assess this edge
        return out_graph, out_keep, tot >= min_tri
    return out_graph, out_keep


def filter_directions_1dsfm(graph: ViewGraph, num_axes: int = 48,
                            threshold: float = 0.25, min_proj: float = 0.15,
                            seed: int = 0,
                            only: Optional[np.ndarray] = None
                            ) -> Tuple[ViewGraph, np.ndarray]:
    """1DSfM relative-translation outlier filtering (Wilson & Snavely,
    ECCV'14) — the role of Theia's
    ``--filter_relative_translations_with_1dsfm=true`` in the pinned recipe
    (`/root/reference/rig_calibrator/theia_flags.txt:93`).

    World-frame pairwise directions are projected onto ``num_axes`` random
    unit axes; each projection induces a weighted ordering problem (edge
    i->j if d_e.u > 0, weight |d_e.u|) solved by the greedy
    minimum-feedback-arc heuristic; edges that land backward in the
    consensus ordering accumulate inconsistency weight. An edge whose
    weighted backward fraction exceeds ``threshold`` is rejected.

    Call AFTER rotation averaging + ``rel_dir_to_world`` (directions must
    be in a common frame). Returns (filtered graph, keep mask [E])."""
    edges = np.asarray(graph.edges)
    d = np.asarray(graph.rel_dir)
    E = len(edges)
    if E == 0:
        return graph, np.ones(0, bool)
    V = int(edges.max()) + 1
    rng = np.random.default_rng(seed)
    bad_acc = np.zeros(E)
    tot_acc = np.zeros(E)
    for _ in range(num_axes):
        u = rng.standard_normal(3)
        u /= np.linalg.norm(u)
        p = d @ u
        active = np.abs(p) > min_proj
        if int(active.sum()) < 2:
            continue
        src = np.where(p > 0, edges[:, 0], edges[:, 1])[active]
        dst = np.where(p > 0, edges[:, 1], edges[:, 0])[active]
        w = np.abs(p)[active]
        order = _eades_order(src, dst, w, V)
        pos = np.empty(V, np.int64)
        pos[order] = np.arange(V)
        back = (pos[dst] < pos[src]).astype(float)
        idx = np.nonzero(active)[0]
        bad_acc[idx] += w * back
        tot_acc[idx] += w
    frac = bad_acc / np.maximum(tot_acc, 1e-12)
    keep = frac <= threshold
    if only is not None:
        # restrict removals to the `only` edges (the triplet-unjudged set
        # in run_global_sfm — on triangle-rich graphs the ordering
        # consensus has a high false-positive rate: measured 197 good
        # edges removed of 911 at V=200, degrading positions 35x, while
        # catching 7 of the 41 harmful directions the triplet missed)
        keep = keep | ~np.asarray(only, bool)
    # repair restores least-backward edges first
    return _keep_if_connected(graph, keep, quality=-frac)


def _masked_median(x, mask):
    """Median of x over mask (masked entries sort to +inf)."""
    v = jnp.sort(jnp.where(mask, x, jnp.inf))
    n = jnp.sum(mask)
    return v[jnp.clip(n // 2, 0, x.shape[0] - 1)]


def position_estimation(graph: ViewGraph, rotations: jnp.ndarray, num_views: int,
                        irls_rounds: int = 24, trim_stages: int = 0,
                        floor_frac: float = 0.1, k_scale: float = 2.0,
                        trim_at: float = 5.0) -> jnp.ndarray:
    """Camera centers [V,3] from pairwise world-frame baseline directions —
    LUD alternation (Ozyesil & Singer CVPR'15), the role of Theia's
    least-unsquared-deviation position estimator pinned by the reference
    recipe (`theia_flags.txt:26-165`, position_estimator defaults).

    Alternate (a) per-edge scales s_e = max(<c_j - c_i, d_e>, floor) with a
    positive relative floor (an edge cannot invert or vanish), and
    (b) a robustly-weighted graph-Laplacian least-squares solve for c with
    targets s_e d_e (matrix-free CG; soft-L1 weights scaled by the MEDIAN
    residual per round). ``trim_stages`` outer stages permanently drop
    edges whose residual exceeds ``trim_at`` x median and re-converge —
    default OFF: trimming guts sparse graphs (16-view gap-chain err 0.29
    with 3 stages vs 0.000 without) and the gated eigen polish below
    already removes outlier influence on dense ones.

    Why not the eigenvector relaxation (rounds 1-4 used the smallest
    eigenvector of the projected quadratic form sum w |P_e (c_j - c_i)|^2):
    at reference scale the relaxation has CHEAPER spurious collapse modes
    than the true configuration once a few percent of directions are
    grossly wrong — measured V=800 / 4.2k edges / 4% random-direction
    outliers: true-configuration Rayleigh energy 3.21 vs 0.031 for the
    minimizer, ATE 0.26 of the trajectory diameter, unrecoverable by any
    IRLS reweighting because the basin itself is wrong. The LUD linear
    solves have no such mode (given scales the problem is strictly convex)
    and measure ATE 0.022 on the same graph — and run ~4x faster (CG vs
    a dense [3V,3V] eigh). One jitted dispatch for the whole solve.
    """
    edges = jnp.asarray(graph.edges)
    d = jnp.asarray(graph.rel_dir)
    base_w0 = jnp.asarray(graph.weight, d.dtype)
    return _position_lud(edges, d, base_w0, num_views, irls_rounds,
                         trim_stages, floor_frac, k_scale, trim_at)


@_functools.partial(jax.jit, static_argnames=("V", "irls_rounds",
                                              "trim_stages"))
def _position_lud(edges, d, base_w0, V, irls_rounds, trim_stages,
                  floor_frac, k_scale, trim_at):
    i_idx = edges[:, 0]
    j_idx = edges[:, 1]

    def solve(w, b, c0):
        def matvec(c):
            diff = c[j_idx] - c[i_idx]
            out = jnp.zeros((V, 3), d.dtype)
            out = out.at[i_idx].add(-w[:, None] * diff)
            out = out.at[j_idx].add(w[:, None] * diff)
            return out + 1e-9 * c
        rhs = jnp.zeros((V, 3), d.dtype)
        rhs = rhs.at[i_idx].add(-w[:, None] * b)
        rhs = rhs.at[j_idx].add(w[:, None] * b)
        c, _ = jax.scipy.sparse.linalg.cg(matvec, rhs, x0=c0, maxiter=300,
                                          tol=1e-10)
        return c

    def scales_resid(c, bw):
        diff = c[j_idx] - c[i_idx]
        proj = jnp.sum(diff * d, axis=-1)
        med_s = jnp.maximum(_masked_median(jnp.abs(proj), bw > 0), 1e-9)
        s = jnp.maximum(proj, floor_frac * med_s)
        rres = (jnp.linalg.norm(diff - s[:, None] * d, axis=-1) / med_s)
        medr = jnp.maximum(_masked_median(rres, bw > 0), 0.02)
        return s, rres, medr

    s0 = jnp.ones(edges.shape[0], d.dtype)
    c = solve(base_w0, s0[:, None] * d, jnp.zeros((V, 3), d.dtype))
    bw = base_w0

    def irls_round(_, carry):
        c, bw = carry
        s, rres, medr = scales_resid(c, bw)
        w = bw / jnp.sqrt(1.0 + (rres / (k_scale * medr)) ** 2)
        return solve(w, s[:, None] * d, c), bw

    for t in range(trim_stages + 1):
        c, bw = jax.lax.fori_loop(0, irls_rounds, irls_round, (c, bw))
        if t < trim_stages:
            s, rres, medr = scales_resid(c, bw)
            # absolute floor: only grossly wrong edges (>~17 deg angular
            # equivalent) are ever cut — relative-only trimming on sparse
            # graphs cut structurally-necessary good edges (measured:
            # 16-view gap-{2,3,8} chain err 0.46 after 3 stages vs 0.000
            # with the floor)
            cut = jnp.maximum(trim_at * medr, 0.3)
            bw = bw * (rres < cut)
            c = solve(bw, s[:, None] * d, c)

    # EXACTNESS POLISH: one projected-eigen solve with HARD-gated final
    # weights (outliers beyond trim_at x median get weight zero — soft
    # weights alone re-admit enough outlier energy for the relaxation's
    # collapse mode to win again at V=800). The alternation converges only
    # linearly (0.09 residual error left on an exact 12-view ring after 24
    # rounds); the eigen form is exact in one shot on the cleaned graph.
    # The polish is ACCEPTED only if it does not worsen the robust
    # objective — the safety net against any remaining collapse mode.
    s, rres, medr = scales_resid(c, bw)
    w_fin = (bw * (rres < jnp.maximum(trim_at * medr, 0.3))
             / jnp.sqrt(1.0 + (rres / (k_scale * medr)) ** 2))
    P = jnp.eye(3, dtype=d.dtype)[None] - jnp.einsum("ei,ej->eij", d, d)
    M = jnp.zeros((V, V, 3, 3), d.dtype)
    wP = w_fin[:, None, None] * P
    M = M.at[i_idx, i_idx].add(wP).at[j_idx, j_idx].add(wP)
    M = M.at[i_idx, j_idx].add(-wP).at[j_idx, i_idx].add(-wP)
    Mfull = M.transpose(0, 2, 1, 3).reshape(3 * V, 3 * V)
    vals, vecs = jnp.linalg.eigh(Mfull[3:, 3:])
    c_e = jnp.concatenate([jnp.zeros((1, 3), d.dtype),
                           vecs[:, 0].reshape(V - 1, 3)])
    # align the eigenvector (sign/scale-free) with the LUD solution
    num = jnp.sum(c_e * c)
    den = jnp.maximum(jnp.sum(c_e * c_e), 1e-12)
    c_e = c_e * (num / den)

    def robust_cost(cc):
        # SIGN-FREE angular residual (sin of the angle between the edge
        # and its direction line): direction REVERSALS are harmless to
        # positions (P is sign-invariant) but would dominate a
        # sign-sensitive cost and make it prefer wrong configurations
        # that appease them.
        diff = cc[j_idx] - cc[i_idx]
        nrm = jnp.maximum(jnp.linalg.norm(diff, axis=-1), 1e-12)
        perp = diff - jnp.sum(diff * d, axis=-1, keepdims=True) * d
        rr = jnp.linalg.norm(perp, axis=-1) / nrm
        return jnp.sum(base_w0 * jnp.sqrt(1.0 + (rr / 0.05) ** 2))

    c = jnp.where(robust_cost(c_e) <= robust_cost(c), c_e, c)

    return c - c[0]


def global_poses(graph: ViewGraph, num_views: int) -> jnp.ndarray:
    """Full init: rotations + positions -> world->cam poses [V,7]."""
    q = rotation_averaging(graph, num_views)
    c = position_estimation(graph, q, num_views)
    # world->cam: t = -R c
    t = -pose_mod.quat_rotate(q, c)
    return pose_mod.make_pose(t, q)


def _pair_track_ranges(x1, x2, R_ij, t_ij, inliers):
    """Two-view midpoint triangulation with unit baseline: per-correspondence
    ranges (distance from each camera center) in a common metric where
    ||c_j - c_i|| = 1. Returns (range_i [K], range_j [K], valid [K])."""
    d1 = np.concatenate([x1, np.ones((len(x1), 1))], axis=1)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = np.concatenate([x2, np.ones((len(x2), 1))], axis=1)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    R = np.asarray(R_ij)
    c = -R.T @ np.asarray(t_ij)              # camera-j center in frame i
    d2i = d2 @ R                             # R^T d2, per row
    # min || a d1 - (c + b d2i) ||^2 over (a, b)
    d11 = np.sum(d1 * d1, axis=1)
    d22 = np.sum(d2i * d2i, axis=1)
    d12 = np.sum(d1 * d2i, axis=1)
    c1 = d1 @ c
    c2 = d2i @ c
    det = d11 * d22 - d12 * d12
    det = np.where(np.abs(det) > 1e-12, det, 1e-12)
    a = (c1 * d22 - c2 * d12) / det
    b = (c1 * d12 - c2 * d11) / det
    pt = 0.5 * (a[:, None] * d1 + (c[None, :] + b[:, None] * d2i))
    r_i = np.linalg.norm(pt, axis=1)
    r_j = np.linalg.norm(pt - c[None, :], axis=1)
    valid = np.asarray(inliers, bool) & (a > 1e-6) & (b > 1e-6)
    return r_i, r_j, valid


@jax.jit
def _two_view_ransac_jit(x1, x2, valid, threshold=1e-3):
    """Essential AND homography RANSAC + decompositions, compiled once per
    padded match-count bucket. ``threshold`` is the (squared, unit-plane)
    inlier gate of both models — a traced value, so changing it never
    recompiles. The caller model-selects: on near-planar scenes the linear
    8-point essential problem is degenerate and its rotation can be 10+
    degrees off while fitting every correspondence; the homography
    decomposition is the stable estimate there."""
    from multiview_tpu.sfm import ransac as ransac_mod

    res = ransac_mod.ransac_essential(x1, x2, valid=valid,
                                      threshold=threshold)
    R, t = ransac_mod.decompose_essential(res.model, x1, x2, res.inliers)
    res_h = ransac_mod.ransac_homography(x1, x2, valid=valid,
                                         threshold=threshold)
    R_h, t_h, _ = ransac_mod.decompose_homography(res_h.model, x1, x2,
                                                  res_h.inliers)
    return (res.inliers, res.num_inliers, R, t,
            res_h.inliers, res_h.num_inliers, R_h, t_h)


@jax.jit
def _two_view_ransac_batched(x1, x2, valid):
    """vmapped _two_view_ransac_jit over a [B,K,2] pair bucket: ALL pairs
    of one padded size run as a single device dispatch (the per-pair loop
    paid a full dispatch round-trip per pair — measured 12 s for 9 pairs
    through this environment's remote tunnel, ~2 s batched)."""
    return jax.vmap(lambda a, b, v: _two_view_ransac_jit(a, b, v))(
        x1, x2, valid)


def _ransac_device():
    """Placement for the two-view RANSAC batches: the HOST CPU backend
    when one is registered alongside an accelerator.

    The kernels are thousands of tiny ([8,9]/[4,?]/3x3) SVDs — the one
    op class accelerators run orders of magnitude slower than LAPACK
    (measured: ~16 s of a 5-image sfm-init on the TPU vs <1 s on host;
    the reference likewise solves two-view geometry on CPU,
    interest_point.cc/essential). Committed CPU inputs make the jitted
    batch compile and run on host; on a CPU-only session this is a
    no-op. The main BA/mapping compute path is unaffected."""
    try:
        if jax.default_backend() != "cpu":
            return jax.devices("cpu")[0]
    except RuntimeError:
        pass
    return None


def view_graph_from_matches(pair_data, num_views: int, dtype=jnp.float64,
                            pair_pids=None):
    """Build a ViewGraph from per-pair unit-plane correspondences.

    pair_data: {(i,j): (x1 [K,2], x2 [K,2])} normalized (unit-plane) coords.
    Essential+homography RANSAC and decompositions run as one vmapped
    batch per padded match-count bucket; model selection and the scale
    bookkeeping stay host-side.

    With ``pair_pids`` ({(i,j): [K] track ids}), also returns per-edge track
    ranges ``[{view: {pid: range}}]`` in the edge's unit-baseline metric —
    the raw material for baseline-scale recovery (edge_scales_from_ranges).
    """
    from multiview_tpu.utils.padding import pad_rows_pow2

    items = []
    for (i, j), (x1, x2) in pair_data.items():
        K = len(x1)
        if K < 8:
            continue
        # pad to a power-of-2 bucket: one compiled RANSAC+decompose per
        # bucket size instead of one per distinct match count
        items.append(((i, j), K,
                      pad_rows_pow2(np.asarray(x1, float)),
                      pad_rows_pow2(np.asarray(x2, float)),
                      pad_rows_pow2(np.ones(K, bool), fill=False)))
    buckets = {}
    for it in items:
        buckets.setdefault(it[2].shape[0], []).append(it)
    results = {}
    dev = _ransac_device()
    for group in buckets.values():
        stacks = (np.stack([g[2] for g in group]),
                  np.stack([g[3] for g in group]),
                  np.stack([g[4] for g in group]))
        if dev is not None:
            # host numpy -> host CPU device directly: no accelerator
            # round-trip on the path host placement is meant to speed up
            args = tuple(jax.device_put(a, dev) for a in stacks)
        else:
            args = tuple(jnp.asarray(a) for a in stacks)
        outs = _two_view_ransac_batched(*args)
        outs = [np.asarray(o) for o in outs]
        for r, g in enumerate(group):
            results[g[0]] = tuple(o[r] for o in outs)

    edges, rots, dirs, weights, ranges = [], [], [], [], []
    for (i, j), K, x1p, x2p, vp in items:
        (inl, n_inl, R_e, t_e, inl_h, n_inl_h, R_h, t_h) = results[(i, j)]
        # model selection: when one homography explains (almost) as many
        # correspondences as the essential matrix, the pair is planar-
        # dominated and the H decomposition is the reliable (R, t). Only
        # the POSE comes from H — the inlier set stays the union of both
        # models so legitimate off-plane inliers still seed tracks and the
        # downstream scale estimation (dropping them would starve
        # _pair_track_ranges of exactly the points with parallax).
        if int(n_inl) > 0 and int(n_inl_h) > 0.8 * int(n_inl):
            R_ij, t_ij = R_h, t_h
            inl = inl | inl_h
            n_inl = jnp.sum(inl)
        else:
            R_ij, t_ij = R_e, t_e
        if int(n_inl) < 16:
            continue
        x1, x2 = x1p[:K], x2p[:K]
        res_inliers = np.asarray(inl)[:K]
        q_ij = pose_mod.matrix_to_quat(R_ij)
        edges.append((i, j))
        rots.append(np.asarray(q_ij))
        # direction of c_j - c_i in world: needs global rotations, which we
        # don't have yet; store the direction in cam-i frame and fix it up in
        # rel_dir_world() after rotation averaging.
        # camera-j center in cam-i frame: c_j^(i) = -R_ij^T t_ij
        cji = -np.asarray(R_ij).T @ np.asarray(t_ij)
        n = np.linalg.norm(cji)
        dirs.append(cji / max(n, 1e-12))
        weights.append(float(n_inl))
        if pair_pids is not None:
            r_i, r_j, valid = _pair_track_ranges(
                np.asarray(x1), np.asarray(x2), R_ij, t_ij, res_inliers)
            pids = np.asarray(pair_pids[(i, j)])
            ranges.append({
                i: {int(p): float(r) for p, r, v in zip(pids, r_i, valid) if v},
                j: {int(p): float(r) for p, r, v in zip(pids, r_j, valid) if v},
            })

    graph = ViewGraph(
        edges=jnp.asarray(np.asarray(edges, np.int32)),
        rel_rot=jnp.asarray(np.stack(rots), dtype),
        rel_dir=jnp.asarray(np.stack(dirs), dtype),  # cam-i frame!
        weight=jnp.asarray(np.asarray(weights), dtype))
    if pair_pids is not None:
        return graph, ranges
    return graph


def edge_scales_from_ranges(graph: ViewGraph, ranges) -> np.ndarray:
    """Per-edge baseline lengths (up to one global scale) from shared tracks.

    Two edges sharing a view see common tracks at ranges inversely
    proportional to their baseline scales: s_e * range_e(p, v) =
    s_f * range_f(p, v) = the true range. Each shared (edge, edge, view)
    triple contributes log s_e - log s_f = median_p log(range_f / range_e);
    the log-scale LS system is solved host-side (E x E, E = #edges).
    Returns scales [E] with geometric mean 1. Edges with no shared-track
    constraint keep scale 1 (the direction-only behavior).
    """
    E = len(ranges)
    rows, rhs = [], []
    for e in range(E):
        for f in range(e + 1, E):
            for v in ranges[e]:
                if v not in ranges[f]:
                    continue
                common = set(ranges[e][v]) & set(ranges[f][v])
                if len(common) < 3:
                    continue
                logs = [np.log(ranges[f][v][p] / ranges[e][v][p])
                        for p in common
                        if ranges[f][v][p] > 1e-9 and ranges[e][v][p] > 1e-9]
                if not logs:
                    continue
                row = np.zeros(E)
                row[e] = 1.0
                row[f] = -1.0
                rows.append(row)
                rhs.append(np.median(logs))
    if not rows:
        return np.ones(E)
    # gauge: mean log scale = 0
    rows.append(np.ones(E) / E)
    rhs.append(0.0)
    A = np.stack(rows)
    b = np.asarray(rhs)
    logs, *_ = np.linalg.lstsq(A, b, rcond=None)
    return np.exp(logs - logs.mean())


def position_estimation_with_scales(graph: ViewGraph, scales,
                                    irls_rounds: int = 8,
                                    loss_scale: float = 0.05) -> jnp.ndarray:
    """Camera centers from full baseline vectors b_e = s_e d_e (world frame):
    min sum_e w_e |c_j - c_i - b_e|^2, IRLS soft-L1 (the LUD role with known
    per-edge scales — determined even for collinear trajectories, where
    direction-only averaging is degenerate). Matrix-free CG on the weighted
    graph Laplacian; gauge fixed by centering on c_0."""
    edges = jnp.asarray(graph.edges)
    i_idx = edges[:, 0]
    j_idx = edges[:, 1]
    d = jnp.asarray(graph.rel_dir)
    b = jnp.asarray(scales, d.dtype)[:, None] * d        # [E,3]
    base_w = jnp.asarray(graph.weight, d.dtype)
    V = int(jnp.max(edges)) + 1

    def solve(w, c0):
        def matvec(c):
            diff = c[j_idx] - c[i_idx]
            out = jnp.zeros((V, 3), d.dtype)
            out = out.at[i_idx].add(-w[:, None] * diff)
            out = out.at[j_idx].add(w[:, None] * diff)
            return out + 1e-9 * c
        rhs = jnp.zeros((V, 3), d.dtype)
        rhs = rhs.at[i_idx].add(-w[:, None] * b)
        rhs = rhs.at[j_idx].add(w[:, None] * b)
        c, _ = jax.scipy.sparse.linalg.cg(matvec, rhs, x0=c0, maxiter=200,
                                          tol=1e-10)
        return c

    c = solve(base_w, jnp.zeros((V, 3), d.dtype))
    w = base_w
    for _ in range(irls_rounds):
        resid = jnp.linalg.norm(c[j_idx] - c[i_idx] - b, axis=-1)
        scale_norm = jnp.maximum(jnp.mean(jnp.linalg.norm(b, axis=-1)), 1e-12)
        w = base_w / jnp.sqrt(1.0 + (resid / (loss_scale * scale_norm)) ** 2)
        c = solve(w, c)
    return c - c[0]


def rel_dir_to_world(graph: ViewGraph, rotations: jnp.ndarray) -> ViewGraph:
    """Rotate per-edge baseline directions from cam-i frame into world frame
    using the averaged global rotations: d_world = R_i^T d_cam_i."""
    qi = rotations[graph.edges[:, 0]]
    d_world = pose_mod.quat_rotate(pose_mod.quat_conj(qi), graph.rel_dir)
    return graph._replace(rel_dir=d_world)


def largest_component_views(pair_data, num_views: int) -> np.ndarray:
    """Boolean [V] membership mask of the largest connected component of the
    view graph (host union-find). Views with no edges form singletons."""
    return _largest_component_from_edges(
        np.asarray([k for k in pair_data.keys()], np.int64), num_views)


def _largest_component_from_edges(edges: np.ndarray,
                                  num_views: int) -> np.ndarray:
    from multiview_tpu import native

    edges = np.asarray(edges, np.int64).reshape(-1, 2)
    if len(edges) == 0:
        out = np.zeros(num_views, bool)
        out[:1] = True
        return out
    roots = native.union_find_roots(num_views, edges)
    vals, counts = np.unique(roots, return_counts=True)
    # among components that have edges, pick the largest
    has_edge = np.zeros(num_views, bool)
    has_edge[edges.reshape(-1)] = True
    sizes = {int(v): int(c) for v, c in zip(vals, counts)}
    best = max((r for r in vals if has_edge[int(r)] or sizes[int(r)] > 1),
               key=lambda r: sizes[int(r)], default=int(roots[0]))
    return roots == best


def run_global_sfm(pair_data, num_views: int, dtype=jnp.float64,
                   pair_pids=None, return_mask: bool = False):
    """pair correspondences -> initial world->cam poses [V,7] (up to scale).

    With ``pair_pids`` (track ids per pair correspondence), per-edge baseline
    scales are recovered from shared-track range ratios and positions come
    from full baseline vectors — robust to collinear trajectories.

    A disconnected view graph is reconstructed on its largest connected
    component (Theia likewise estimates and exports only the views it can
    register; views outside the component get identity poses and a False
    entry in the mask). With ``return_mask`` returns (poses [V,7],
    registered [V] bool)."""
    member = largest_component_views(pair_data, num_views)

    def _reconstruct_component(member):
        import sys
        print(f"Warning: view graph is disconnected; reconstructing the "
              f"largest connected component ({int(member.sum())}/{num_views} "
              f"views)", file=sys.stderr)
        remap = -np.ones(num_views, np.int64)
        remap[member] = np.arange(int(member.sum()))
        sub_pairs = {(int(remap[i]), int(remap[j])): v
                     for (i, j), v in pair_data.items()
                     if member[i] and member[j]}
        sub_pids = None
        if pair_pids is not None:
            sub_pids = {(int(remap[i]), int(remap[j])): v
                        for (i, j), v in pair_pids.items()
                        if member[i] and member[j]}
        sub = run_global_sfm(sub_pairs, int(member.sum()), dtype,
                             pair_pids=sub_pids)
        sub = np.asarray(sub)
        poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], sub.dtype),
                        (num_views, 1))
        poses[member] = sub
        poses = jnp.asarray(poses)
        return (poses, member) if return_mask else poses

    if not member.all():
        return _reconstruct_component(member)

    import os as _os
    import time as _time
    _prof = bool(_os.environ.get("MV_PROFILE"))
    _t = [_time.perf_counter()]

    def _mk(name):
        if _prof:
            now = _time.perf_counter()
            print(f"[global-sfm] {name}: {now - _t[0]:.2f} s")
            _t[0] = now

    ranges = None
    if pair_pids is not None:
        graph, ranges = view_graph_from_matches(pair_data, num_views, dtype,
                                                pair_pids=pair_pids)
    else:
        graph = view_graph_from_matches(pair_data, num_views, dtype)
    _mk("view_graph")
    # pair_data connectivity (checked above) is necessary but NOT
    # sufficient: view_graph_from_matches drops edges (min-match,
    # RANSAC/essential gates), so the BUILT graph can still be
    # disconnected — first observed on the 298-image interleaved-rig
    # scene, where cross-sensor pairs carry matches that fail the
    # two-view gates. Reconstruct the largest component of the KEPT
    # edges (Theia likewise registers only what connects).
    gmember = _largest_component_from_edges(np.asarray(graph.edges),
                                            num_views)
    if not gmember.all():
        return _reconstruct_component(gmember)
    full_edges = np.asarray(graph.edges)
    q, graph = robust_rotation_averaging(graph, num_views)
    _mk("rotation_averaging")
    graph = rel_dir_to_world(graph, q)
    # relative-translation outlier rejection before position estimation
    # (theia_flags.txt:93): triplet closure (sharp where triangles exist)
    # then 1DSfM projection consensus (covers triangle-poor graphs); keeps
    # IRLS from anchoring on corrupted direction edges
    graph, keep_tri, judged = filter_directions_triplet(graph,
                                                        return_judged=True)
    # 1DSfM consensus judges ONLY the edges the triplet could not
    # (too few informative triangles) — on triangle-rich graphs its
    # ordering-based vote is far noisier than triplet closure
    # higher threshold in the restricted role: the ordering consensus is
    # noisiest exactly on the long unjudged closures (measured V=200: at
    # 0.25 it removed 61 good / caught 14 and positions degraded 35x; at
    # 0.45 positions are unharmed). Triangle-free graphs (judged empty)
    # still get the full-graph sweep, where backward-consensus margins
    # are much larger.
    graph, _ = filter_directions_1dsfm(
        graph, seed=0, threshold=0.45,
        only=~judged[np.asarray(keep_tri, bool)])
    _mk("direction_filters")
    if ranges is not None:
        if graph.edges.shape[0] < len(full_edges):
            kept = {tuple(e) for e in np.asarray(graph.edges)}
            ranges = [r for e, r in zip(full_edges, ranges)
                      if tuple(e) in kept]
        scales = edge_scales_from_ranges(graph, ranges)
        _mk("edge_scales")
        # mean baseline 1 (same normalization as direction-only path)
        c = position_estimation_with_scales(graph, scales / scales.mean())
        _mk("positions")
    else:
        c = position_estimation(graph, q, num_views)
        _mk("positions")
    t = -pose_mod.quat_rotate(q, c)
    poses = pose_mod.make_pose(t, q)
    if return_mask:
        return poses, np.ones(num_views, bool)
    return poses
