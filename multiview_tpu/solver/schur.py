"""Matrix-free Schur-complement Levenberg-Marquardt for bundle adjustment.

The TPU-native counterpart of Ceres' ITERATIVE_SCHUR + SCHUR_JACOBI (the
reference's solver choice, `/root/reference/rig_calibrator/bin/rig_calibrator.cc:1909-1919`):
structure points are eliminated exactly, and the reduced camera system is
solved by preconditioned CG — but no sparse matrix is ever assembled.

How each piece maps to JAX:

- J products: ``jax.linearize`` of the residual function at (cam, points)
  gives J·x; its transpose gives Jᵀ·r. A vjp w.r.t. the points array
  returns the per-point-accumulated gradient [P,3] directly — autodiff does
  the segment-sum that Ceres does by hand.
- Point blocks Hpp [P,3,3] and the exact camera Jacobi diagonal come from
  per-observation block Jacobians: one vmapped ``jacfwd`` over rows of each
  observation family (static shapes, MXU/VPU friendly) scattered with
  ``segment_sum``.
- Schur matvec S·x = Jcᵀ(Jc x) + λDc x − JcᵀJp (Hpp+λDp)⁻¹ JpᵀJc x is four
  linearized products plus an einsum against the closed-form SPD block
  inverses of Hpp+λDp (``inv3x3_spd``, computed once per LM iteration) —
  all fused by XLA into one compiled while_loop body with zero host
  round-trips.

Under a sharded observation layout (parallel/sharding.py) every reduction
(vjp accumulations, segment sums, CG dot products) lowers to psum/all-reduce
collectives over the device mesh, which is exactly the distributed
Schur-complement BA design from SURVEY.md 2.3.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.geometry import distortion as dist_mod
from multiview_tpu.solver import losses
from multiview_tpu.calib import problem as prob


# ----------------------------------------------------------------------------
# Section offsets of the camera-side parameter vector (pack_state order,
# points excluded)
# ----------------------------------------------------------------------------


class CamLayout(NamedTuple):
    world_to_ref: int
    ref_to_cam: int
    offsets: int
    focal: int
    ctr: int
    dist: Tuple[int, ...]
    d2i: int
    dscale: int
    total: int


def cam_layout(template: prob.RigState) -> CamLayout:
    off = 0

    def sec(n):
        nonlocal off
        start = off
        off += n
        return start

    w = sec(template.world_to_ref.size)
    r = sec(template.ref_to_cam.size)
    o = sec(template.timestamp_offsets.size)
    f = sec(template.focal.size)
    c = sec(template.optical_center.size)
    d = tuple(sec(int(x.size)) for x in template.dist)
    d2i = sec(template.depth_to_image.size)
    ds = sec(template.depth_scale.size)
    return CamLayout(w, r, o, f, c, d, d2i, ds, off)


# ----------------------------------------------------------------------------
# Per-row pixel residual + its block Jacobian (for Hpp and the Jacobi diag)
# ----------------------------------------------------------------------------


def _pixel_row_residual(beg_pose, end_pose, rig, offset, focal, ctr, dist, point,
                        pix, dt_cam, dt_bracket, mask, dist_half, model: str,
                        robust_threshold: float):
    """One observation's robustified residual [2] as an explicit function of
    the parameter blocks it touches (BracketedCamError semantics)."""
    w2c = pose_mod.world_to_cam_from_bracket(beg_pose, end_pose, rig, dt_cam,
                                             dt_bracket, offset)
    Xc = pose_mod.pose_apply(w2c, point)
    z = Xc[2]
    z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    focal2 = jnp.stack([focal, focal])
    undist_c = focal2 * (Xc[:2] / z)
    pred = dist_mod.distort_centered(model, dist, undist_c, focal2, ctr, dist_half)
    res = pred + dist_half - pix
    s = jnp.sum(res * res)
    tiny = 1e-20
    ratio = losses.rho("cauchy", s, robust_threshold) / jnp.maximum(s, tiny)
    w = jnp.sqrt(jnp.where(s > tiny, ratio, 1.0))
    return res * (w * mask)


def _pixel_row_blocks(state: prob.RigState, obs: prob.PixelObs, model: str,
                      opts: prob.BAOptions):
    """Vmapped block Jacobians of every row: returns
    (J_cam_blocks [N,2,B], J_pt [N,2,3], res [N,2]) where B = 25 + d
    (beg7,end7,rig7,offset1,focal1,ctr2,dist d). The residual rides along as
    the jacrev aux so the blocks path never re-executes the residual graph."""
    s = obs.sensor
    d = state.dist[s]

    def row(beg_pose, end_pose, rig, offset, focal, ctr, dist, point,
            pix, dt_cam, dt_bracket, mask):
        def f(blocks):
            bp, ep, rg, of, fo, ct, di, pt = blocks
            res = _pixel_row_residual(
                bp, ep, rg, of, fo, ct, di, pt, pix, dt_cam, dt_bracket, mask,
                obs.dist_half_size, model, opts.robust_threshold)
            return res, res

        blocks = (beg_pose, end_pose, rig, offset, focal, ctr, dist, point)
        # reverse mode: 2 output rows vs ~33 input tangents for forward mode
        jac, res = jax.jacrev(f, has_aux=True)(blocks)
        j_cam = jnp.concatenate(
            [jac[0], jac[1], jac[2], jac[3][:, None], jac[4][:, None], jac[5],
             jac[6].reshape(2, -1)], axis=-1)
        return j_cam, jac[7], res

    mask_f = obs.mask.astype(state.dtype)
    # optimization_barrier: keep the per-row pose/point gathers as plain
    # row gathers in their natural layout. Without it XLA fuses the gather
    # into the jacrev consumers' (transposed, 1-D-tiled) layouts — measured
    # 19.2 ms for the [N,7] pose gather at 384k obs vs ~0.7 ms unfused.
    beg, end, pts = jax.lax.optimization_barrier(
        (state.world_to_ref[obs.beg_idx], state.world_to_ref[obs.end_idx],
         state.points[obs.point_idx]))
    return jax.vmap(row, in_axes=(0, 0, None, None, None, None, None, 0, 0, 0, 0, 0))(
        beg, end,
        state.ref_to_cam[s], state.timestamp_offsets[s], state.focal[s],
        state.optical_center[s], d, pts,
        obs.pix, obs.dt_cam, obs.dt_bracket, mask_f)


def _depth_row_residual(beg_pose, end_pose, rig, offset, d2i, dscale, point,
                        depth_xyz, target_xyz, dt_cam, dt_bracket, mask,
                        weight: float, affine: bool, use_point: bool,
                        robust_threshold: float):
    """One depth observation's robustified residual [3].

    use_point=True  -> BracketedDepthError: weight*(X_tri - world(depth_pt))
    use_point=False -> BracketedDepthMeshError with target_xyz the mesh point.
    (rig_calibrator.cc:522-705)
    """
    w2c = pose_mod.world_to_cam_from_bracket(beg_pose, end_pose, rig, dt_cam,
                                             dt_bracket, offset)
    if affine:
        L = pose_mod.affine_linear(d2i) * dscale
        t = pose_mod.affine_t(d2i)
    else:
        L = pose_mod.quat_to_matrix(pose_mod.pose_q(d2i)) * dscale
        t = pose_mod.pose_t(d2i)
    M_cam = L @ depth_xyz + t
    M_world = pose_mod.pose_apply(pose_mod.pose_inverse(w2c), M_cam)
    tgt = point if use_point else target_xyz
    res = weight * (tgt - M_world)
    s = jnp.sum(res * res)
    tiny = 1e-20
    ratio = losses.rho("cauchy", s, robust_threshold) / jnp.maximum(s, tiny)
    w = jnp.sqrt(jnp.where(s > tiny, ratio, 1.0))
    return res * (w * mask)


def _depth_row_blocks(state: prob.RigState, obs: prob.DepthObs, opts: prob.BAOptions,
                      mesh_variant: bool):
    """Vmapped block Jacobians for depth rows: (J_cam [N,3,B], J_pt [N,3,3],
    res [N,3]) with B = 7+7+7 + (7|12) + 1 + 1. For the mesh variant J_pt is
    zeros."""
    s = obs.sensor
    weight = opts.depth_mesh_weight if mesh_variant else opts.depth_tri_weight
    affine = opts.affine_depth_to_image
    use_point = not mesh_variant
    mesh_xyz = obs.mesh_xyz if obs.mesh_xyz is not None else jnp.zeros_like(obs.depth_xyz)
    row_mask = obs.mask
    if mesh_variant and obs.mesh_mask is not None:
        row_mask = row_mask & obs.mesh_mask
        mesh_xyz = jnp.where(obs.mesh_mask[:, None], mesh_xyz, 0.0)

    def row(beg_pose, end_pose, rig, offset, d2i, dscale, point,
            depth_xyz, target_xyz, dt_cam, dt_bracket, mask):
        def f(blocks):
            bp, ep, rg, of, dd, ds, pt = blocks
            res = _depth_row_residual(bp, ep, rg, of, dd, ds, pt, depth_xyz,
                                      target_xyz, dt_cam, dt_bracket, mask,
                                      weight, affine, use_point,
                                      opts.robust_threshold)
            return res, res

        blocks = (beg_pose, end_pose, rig, offset, d2i, dscale, point)
        jac, res = jax.jacrev(f, has_aux=True)(blocks)
        j_cam = jnp.concatenate(
            [jac[0], jac[1], jac[2], jac[3][:, None], jac[4], jac[5][:, None]],
            axis=-1)
        return j_cam, jac[6], res

    mask_f = row_mask.astype(state.dtype)
    # see _pixel_row_blocks: barrier keeps row gathers in natural layout
    beg, end, pts = jax.lax.optimization_barrier(
        (state.world_to_ref[obs.beg_idx], state.world_to_ref[obs.end_idx],
         state.points[obs.point_idx]))
    return jax.vmap(row, in_axes=(0, 0, None, None, None, None, 0, 0, 0, 0, 0, 0))(
        beg, end,
        state.ref_to_cam[s], state.timestamp_offsets[s],
        state.depth_to_image[s], state.depth_scale[s],
        pts, obs.depth_xyz, mesh_xyz,
        obs.dt_cam, obs.dt_bracket, mask_f)


def _prior_row_blocks(st: prob.RigState, prior: prob.XyzPriorObs,
                      weight: float, th: float):
    """Vmapped point-block Jacobians + aux residuals of an xyz-prior family
    (XYZError): (J_pt [M,3,3], res [M,3]). Must stay numerically identical
    to ``prob.xyz_prior_residuals`` — the blocks-mode gradient derives from
    these aux residuals while the LM accept cost uses the vectorized path."""
    def row(point, ref, mask):
        def f(p):
            res = weight * (p - ref)
            if th <= 0:
                out = res * mask
                return out, out
            s = jnp.sum(res * res)
            tiny = 1e-20
            ratio = losses.rho("cauchy", s, th) / jnp.maximum(s, tiny)
            w = jnp.sqrt(jnp.where(s > tiny, ratio, 1.0))
            out = res * (w * mask)
            return out, out
        return jax.jacfwd(f, has_aux=True)(point)
    return jax.vmap(row)(st.points[prior.point_idx], prior.ref_xyz,
                         prior.mask.astype(st.dtype))


def _depth_row_cam_indices(template: prob.RigState, obs: prob.DepthObs,
                           layout: CamLayout) -> np.ndarray:
    """[N, B] indices into the camera vector for depth-row Jacobian columns:
    beg7, end7, rig7, offset1, d2i(7|12), scale1."""
    s = obs.sensor
    beg = np.asarray(obs.beg_idx)
    end = np.asarray(obs.end_idx)
    N = len(beg)
    nd = template.depth_to_image.shape[1]
    cols = [
        layout.world_to_ref + beg[:, None] * 7 + np.arange(7)[None, :],
        layout.world_to_ref + end[:, None] * 7 + np.arange(7)[None, :],
        np.broadcast_to(layout.ref_to_cam + s * 7 + np.arange(7), (N, 7)),
        np.broadcast_to(layout.offsets + s + np.zeros(1, int), (N, 1)),
        np.broadcast_to(layout.d2i + s * nd + np.arange(nd), (N, nd)),
        np.broadcast_to(layout.dscale + s + np.zeros(1, int), (N, 1)),
    ]
    return np.concatenate(cols, axis=-1).astype(np.int32)


def _pixel_row_cam_indices(template: prob.RigState, obs: prob.PixelObs,
                           layout: CamLayout) -> np.ndarray:
    """[N, B] int32 indices into the camera vector for each row's cam-block
    Jacobian columns (host-side, static)."""
    s = obs.sensor
    beg = np.asarray(obs.beg_idx)
    end = np.asarray(obs.end_idx)
    N = len(beg)
    d = int(template.dist[s].size)
    cols = []
    cols.append(layout.world_to_ref + beg[:, None] * 7 + np.arange(7)[None, :])
    cols.append(layout.world_to_ref + end[:, None] * 7 + np.arange(7)[None, :])
    cols.append(np.broadcast_to(layout.ref_to_cam + s * 7 + np.arange(7), (N, 7)))
    cols.append(np.broadcast_to(layout.offsets + s + np.zeros(1, int), (N, 1)))
    cols.append(np.broadcast_to(layout.focal + s + np.zeros(1, int), (N, 1)))
    cols.append(np.broadcast_to(layout.ctr + s * 2 + np.arange(2), (N, 2)))
    if d > 0:
        cols.append(np.broadcast_to(layout.dist[s] + np.arange(d), (N, d)))
    else:
        cols.append(np.zeros((N, 0), int))
    return np.concatenate(cols, axis=-1).astype(np.int32)


# ----------------------------------------------------------------------------
# The solver
# ----------------------------------------------------------------------------


def inv3x3_spd(A):
    """Batched closed-form inverse of damped SPD 3x3 blocks [P,3,3].

    Diagonally normalized adjugate: A = D An D with D = sqrt(diag(A)), so
    An has unit diagonal and |An_ij| <= 1 (no overflow however large the
    Jacobians get) and its determinant stays representable in f32 even
    for near-rank-2 blocks (det ~ damping ratio, >> f32 denormal range).
    One inverse per LM iteration replaces the batched LU
    ``jnp.linalg.solve`` that previously ran inside EVERY CG matvec —
    tiny batched LUs serialize on TPU while this is pure VPU work, and
    every downstream Hpp^-1 application becomes one einsum."""
    d = jnp.sqrt(jnp.clip(jnp.diagonal(A, axis1=-2, axis2=-1), 1e-32, None))
    S = d[..., :, None] * d[..., None, :]
    M = A / S
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    dd, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    c00 = e * i - f * h
    c10 = f * g - dd * i
    c20 = dd * h - e * g
    det = a * c00 + b * c10 + c * c20
    # zero-inverse ONLY for det <= 0: damping makes every live block SPD in
    # exact arithmetic (a fully-masked point's damped block is exactly
    # lam*eps*I -> An = I), so a nonpositive det is pure rounding noise on a
    # numerically singular block. Marginal-but-positive dets (rank-deficient
    # geometry at the lam floor, det ~ lam^2) still get an inverse — the
    # step may be poor, but the LM accept test rejects it and raises lam,
    # whereas freezing the block outright can stall convergence.
    ok = det > 0.0
    inv_det = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
    adj = jnp.stack([
        jnp.stack([c00, c * h - b * i, b * f - c * e], axis=-1),
        jnp.stack([c10, a * i - c * g, c * dd - a * f], axis=-1),
        jnp.stack([c20, b * g - a * h, a * e - b * dd], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None] / S


def _static_priors(obs, o: prob.BAOptions):
    """Prior families present in the problem (static structure)."""
    out = []
    if obs.mesh_tri is not None and o.mesh_tri_weight > 0:
        out.append((obs.mesh_tri, o.mesh_tri_weight, o.robust_threshold))
    if obs.tri_prior is not None and o.tri_weight > 0:
        out.append((obs.tri_prior, o.tri_weight, o.tri_robust_threshold))
    return out


class SchurLMResult(NamedTuple):
    cam: jnp.ndarray
    points: jnp.ndarray
    cost: jnp.ndarray
    initial_cost: jnp.ndarray
    iterations: jnp.ndarray
    lam: jnp.ndarray
    cg_iters_total: jnp.ndarray


def make_schur_solver(template: prob.RigState, observations: prob.Observations,
                      models: Sequence[str], opts: prob.BAOptions,
                      cam_mask: np.ndarray,
                      max_iterations: int = 20,
                      cg_iterations: int = 50,
                      cg_tolerance: float = 1e-8,
                      lam0: float = 1e-4,
                      lower: Optional[jnp.ndarray] = None,
                      upper: Optional[jnp.ndarray] = None,
                      linear_solver: str = "auto",
                      preconditioner: str = "auto",
                      debug_unroll_lm: int = 0,
                      debug_force_cg: Optional[int] = None):
    """Build a jitted Schur-LM solve function:
    (cam_vec0, points0, observations=None) -> result.

    cam_mask: free mask over the camera vector (points are always free).
    Supports every residual family of the reference problem: pixel
    reprojection, depth-vs-triangulated, depth-vs-mesh, and xyz priors
    (rig_calibrator.cc:419-751).

    The optional ``observations`` argument at solve time must keep the
    template's static family structure (which pixel/depth/prior families
    exist, their sensors and shapes), but its index arrays, masks, and
    measurements are all runtime values: one compiled solver serves outlier
    passes, re-bracketing, and incremental-SfM growth without recompiles.

    ``debug_unroll_lm`` / ``debug_force_cg`` are roofline instrumentation
    (scripts/bench_scaling.py --steady): XLA's HLO cost analysis counts each
    while-loop BODY once regardless of trip count, so the bytes/flops of a
    steady-state iteration cannot be read off the production executable.
    With debug_unroll_lm=k the outer LM loop runs as k Python-unrolled
    iterations (no early exit), and debug_force_cg=m replaces the CG loop
    with exactly m unrolled steps — cost analysis then counts every step,
    and differencing k=2 vs k=1 isolates one full steady-state iteration
    by construction. Not for production use (compile cost scales with k*m).
    """
    layout = cam_layout(template)
    num_points = template.points.shape[0]
    cam_free_default = jnp.asarray(cam_mask.astype(np.float64), template.dtype)

    # Linear-solver modes:
    #   "cg"         — jvp/vjp matvecs (re-executes the residual graph per
    #                  matvec; no extra memory)
    #   "cg_blocks"  — matvecs on the per-row block Jacobians that are
    #                  already materialized each LM iteration for Hpp/the
    #                  preconditioner. Pose-column gathers/reductions become
    #                  one-hot matmuls (MXU work, no serialized TPU
    #                  scatters); per-sensor constant columns are static
    #                  gathers + sum reductions. Removes every jvp/vjp pass
    #                  from the CG loop.
    #   "cg_dense_j" — densify per-family camera Jacobians [N,k,C] once per
    #                  LM iteration; CG matvecs become pure matmuls
    #                  (best when N*k*C fits HBM comfortably)
    #   "dense_schur"— assemble the reduced system explicitly + Cholesky
    if linear_solver == "auto":
        # measured on v5e: cg_blocks beats jvp/vjp cg 2.5-3.2x at every
        # tested scale (38k obs: 97 vs 39 iters/s; 1.57M obs: 3.2 vs 1.0)
        # with ~3-6x faster XLA compiles — the matvec is a handful of
        # skinny matmuls instead of 4 re-executions of the residual graph.
        # The one-hot selectors cost 2*N*R floats (3.2 GB at the largest
        # measured size, still a clear win); fall back to the zero-memory
        # matrix-free cg only when they would not fit comfortably (~2 GB).
        n_rows = (sum(len(o) for o in observations.pixels)
                  + 2 * sum(len(o) for o in observations.depths))
        r_ = template.world_to_ref.shape[0]
        linear_solver = "cg_blocks" if 2 * n_rows * r_ <= (1 << 29) else "cg"
    use_dense_schur = linear_solver == "dense_schur"
    use_dense_j = linear_solver == "cg_dense_j"
    use_blocks = linear_solver == "cg_blocks"

    # Bracket fold: bracketing only ever produces end_idx == beg_idx + 1
    # (two CONSECUTIVE ref timestamps, dense_map_utils.cc:1441-1658 /
    # calib/bracketing.py) or the degenerate end_idx == beg_idx whose
    # dt_bracket == 0 makes the end-pose Jacobian block EXACTLY zero
    # (alpha is where-forced to 0.0, so autodiff yields literal zeros —
    # geometry/pose.py interp_world_to_ref). Then the beg and end one-hot
    # selector matmuls fold into ONE against a packed [R,14] table
    # [W[r] | W[r+1]] (gather side) / one [R,N]@[N,14] matmul + an on-chip
    # shifted add (reduce side): the selector streams — the dominant HBM
    # traffic of every CG matvec at scale — halve with zero numerical
    # change (garbage W[r+1] values on degenerate rows multiply exact-zero
    # Jacobian entries). Detected from the BUILD-time observations; callers
    # passing different observations at solve time must keep the bracket
    # structure (index arrays are otherwise runtime values).
    import os as _os
    fold_brackets = False
    if use_blocks and not _os.environ.get("MV_NO_BRACKET_FOLD"):
        def _consecutive(o):
            try:
                b = np.asarray(o.beg_idx)
                e = np.asarray(o.end_idx)
            except Exception:       # traced template (structure-only)
                return False
            return b.size == 0 or bool(np.all((e == b) | (e == b + 1)))
        fold_brackets = (all(_consecutive(o) for o in observations.pixels)
                         and all(_consecutive(o) for o in observations.depths))

    # Preconditioner modes:
    #   "jacobi"       — scalar diagonal of B (+damping)
    #   "schur_jacobi" — Ceres' SCHUR_JACOBI analogue: exact-per-row 7x7
    #                    pose-block diagonal of the reduced camera system
    #                    S = B - E Hpp^-1 E^T (scalar for non-pose params)
    # measured on v5e (38k obs): with the default inexact forcing (0.1) CG
    # early-exits in ~4 iters and the block assembly overhead loses; at tight
    # tolerances schur_jacobi cuts CG ~25% and wins (+12% iters/s)
    if preconditioner == "auto":
        preconditioner = "jacobi" if cg_tolerance >= 0.01 else "schur_jacobi"
    use_block_precond = preconditioner == "schur_jacobi"

    num_ref = template.world_to_ref.shape[0]

    # Per-sensor constant Jacobian-column indices (host-static: they depend
    # only on the layout + sensor, never on which images an observation row
    # touches). Every camera-block family's columns are [beg_pose 0:7,
    # end_pose 7:14, per-sensor constants 14:].
    def _pixel_const_cols(s: int) -> np.ndarray:
        d = int(template.dist[s].size)
        return np.concatenate([
            layout.ref_to_cam + s * 7 + np.arange(7),
            [layout.offsets + s], [layout.focal + s],
            layout.ctr + s * 2 + np.arange(2),
            layout.dist[s] + np.arange(d)]).astype(np.int32)

    def _depth_const_cols(s: int) -> np.ndarray:
        nd = template.depth_to_image.shape[1]
        return np.concatenate([
            layout.ref_to_cam + s * 7 + np.arange(7),
            [layout.offsets + s],
            layout.d2i + s * nd + np.arange(nd),
            [layout.dscale + s]]).astype(np.int32)

    def _row_cols_jnp(obs, const_cols) -> jnp.ndarray:
        """[N,B] Jacobian column indices from the RUNTIME index arrays —
        traced values, so one compiled solver serves any index set of the
        same shape (mask updates, incremental-SfM growth, re-bracketing)."""
        seven = jnp.arange(7, dtype=jnp.int32)[None, :]
        N = obs.beg_idx.shape[0]
        return jnp.concatenate([
            layout.world_to_ref + obs.beg_idx.astype(jnp.int32)[:, None] * 7 + seven,
            layout.world_to_ref + obs.end_idx.astype(jnp.int32)[:, None] * 7 + seven,
            jnp.broadcast_to(jnp.asarray(const_cols), (N, len(const_cols))),
        ], axis=-1)

    # Static family structure aligned with family_blocks order: which obs
    # feeds each family and its constant columns. Solve-time observations
    # must keep this structure (families, sensors, shapes); index
    # values/masks/measurements are free to differ.
    fam_struct = []  # (obs_kind, obs_index, const_cols np[int32]) | None
    for i, o in enumerate(observations.pixels):
        fam_struct.append(("pix", i, _pixel_const_cols(o.sensor)))
    for i, o in enumerate(observations.depths):
        if opts.depth_tri_weight > 0.0:
            fam_struct.append(("depth", i, _depth_const_cols(o.sensor)))
        if o.mesh_xyz is not None and opts.depth_mesh_weight > 0.0:
            fam_struct.append(("depth", i, _depth_const_cols(o.sensor)))
    for _ in _static_priors(observations, opts):
        fam_struct.append(None)

    def unpack(cam_vec, points):
        st = prob.unpack_state(cam_vec, template, include_points=False)
        return dataclasses.replace(st, points=points)

    def residuals(cam_vec, points, obs):
        return prob.all_residuals(unpack(cam_vec, points), obs, models, opts)

    def cost_of(cam_vec, points, obs):
        r = residuals(cam_vec, points, obs)
        return 0.5 * jnp.sum(r * r)

    def family_blocks(cam_vec, points, obs_all):
        """Per-family row blocks (j_cam [N,k,B]|None, cols [N,B]|None,
        j_pt [N,k,3]|None, point_idx [N]|None) in exactly the concatenation
        order of all_residuals — the explicit sparse Jacobian, materialized
        once per LM iteration so every CG matvec is gathers + segment-sums
        instead of re-executing the residual graph. Also returns the flat
        residual vector (the jacrev primals) so the blocks path evaluates the
        residual graph exactly once per LM iteration."""
        st = unpack(cam_vec, points)
        fams = []
        res_parts = []
        fi = 0
        for obs in obs_all.pixels:
            j_cam, j_pt, r = _pixel_row_blocks(st, obs, models[obs.sensor], opts)
            cols = _row_cols_jnp(obs, fam_struct[fi][2])
            fi += 1
            fams.append((j_cam, cols, j_pt, obs.point_idx))
            res_parts.append(r.reshape(-1))
        for obs in obs_all.depths:
            if opts.depth_tri_weight > 0.0:
                j_cam, j_pt, r = _depth_row_blocks(st, obs, opts, mesh_variant=False)
                fams.append((j_cam, _row_cols_jnp(obs, fam_struct[fi][2]),
                             j_pt, obs.point_idx))
                res_parts.append(r.reshape(-1))
                fi += 1
            if obs.mesh_xyz is not None and opts.depth_mesh_weight > 0.0:
                j_cam, _, r = _depth_row_blocks(st, obs, opts, mesh_variant=True)
                fams.append((j_cam, _row_cols_jnp(obs, fam_struct[fi][2]),
                             None, None))
                res_parts.append(r.reshape(-1))
                fi += 1
        for prior, weight, th in _static_priors(obs_all, opts):
            jp, r = _prior_row_blocks(st, prior, weight, th)
            fams.append((None, None, jp, prior.point_idx))
            res_parts.append(r.reshape(-1))
        return fams, jnp.concatenate(res_parts)

    def hpp_and_diag(fams):
        """Hpp [P,3,3] and exact camera Jacobi diagonal [C] from the blocks."""
        hpp = jnp.zeros((num_points, 3, 3), template.dtype)
        cam_diag = jnp.zeros(layout.total, template.dtype)
        for j_cam, cols, j_pt, pidx in fams:
            if j_pt is not None and pidx is not None:
                hpp = hpp.at[pidx].add(jnp.einsum("nri,nrj->nij", j_pt, j_pt))
            if j_cam is not None:
                contrib = jnp.sum(j_cam * j_cam, axis=1)  # [N,B]
                cam_diag = cam_diag.at[cols.reshape(-1)].add(contrib.reshape(-1))
        return hpp, cam_diag

    def J_mv(fams, xc, xp):
        """J @ (xc, xp) -> flat residual-space vector (all_residuals order)."""
        parts = []
        for j_cam, cols, j_pt, pidx in fams:
            u = None
            if j_cam is not None:
                u = jnp.einsum("nkb,nb->nk", j_cam, xc[cols])
            if j_pt is not None:
                up = jnp.einsum("nkj,nj->nk", j_pt, xp[pidx])
                u = up if u is None else u + up
            parts.append(u.reshape(-1))
        return jnp.concatenate(parts)

    def JT_mv(fams, u):
        """J^T @ u -> (gc [C], gp [P,3])."""
        gc = jnp.zeros(layout.total, template.dtype)
        gp = jnp.zeros((num_points, 3), template.dtype)
        off = 0
        for j_cam, cols, j_pt, pidx in fams:
            k = (j_cam if j_cam is not None else j_pt).shape[1]
            n = (j_cam if j_cam is not None else j_pt).shape[0]
            ublock = jax.lax.dynamic_slice_in_dim(u, off, n * k).reshape(n, k)
            off += n * k
            if j_cam is not None:
                contrib = jnp.einsum("nkb,nk->nb", j_cam, ublock)
                gc = gc.at[cols.reshape(-1)].add(contrib.reshape(-1))
            if j_pt is not None:
                gp = gp.at[pidx].add(jnp.einsum("nkj,nk->nj", j_pt, ublock))
        return gc, gp

    def project(cam_vec):
        if lower is not None:
            cam_vec = jnp.maximum(cam_vec, lower)
        if upper is not None:
            cam_vec = jnp.minimum(cam_vec, upper)
        return cam_vec

    def _sort_rows_by_point(obs_all):
        """Permute every point-carrying family's rows so point_idx is
        non-decreasing (stable, traced, once per solve — not per LM
        iteration). Row order is solver-internal: the cost is a sum of
        squares and every J product permutes consistently, so results are
        unchanged. Sorted rows turn the point-side segment reductions into
        cumsum-boundary differences — measured 0.70 ms vs 3.2 ms for the
        TPU scatter-add emitter inside a compiled loop at 384k rows."""
        def sort_pix(o):
            perm = jnp.argsort(o.point_idx, stable=True)
            return dataclasses.replace(
                o,
                pix=o.pix[perm], beg_idx=o.beg_idx[perm],
                end_idx=o.end_idx[perm], point_idx=o.point_idx[perm],
                dt_cam=o.dt_cam[perm], dt_bracket=o.dt_bracket[perm],
                mask=o.mask[perm])

        def sort_depth(o):
            perm = jnp.argsort(o.point_idx, stable=True)
            return dataclasses.replace(
                o,
                depth_xyz=o.depth_xyz[perm], beg_idx=o.beg_idx[perm],
                end_idx=o.end_idx[perm], point_idx=o.point_idx[perm],
                dt_cam=o.dt_cam[perm], dt_bracket=o.dt_bracket[perm],
                mask=o.mask[perm],
                mesh_xyz=None if o.mesh_xyz is None else o.mesh_xyz[perm],
                mesh_mask=None if o.mesh_mask is None else o.mesh_mask[perm])

        return dataclasses.replace(
            obs_all,
            pixels=tuple(sort_pix(o) for o in obs_all.pixels),
            depths=tuple(sort_depth(o) for o in obs_all.depths))

    def _segment_ends(pidx):
        """[P] end offsets of each point's (sorted) row segment."""
        return jnp.searchsorted(pidx, jnp.arange(1, num_points + 1,
                                                 dtype=pidx.dtype))

    def _cumsum_reduce(contrib, ends):
        """Sorted-segment sum [N,K] -> [P,K] via cumulative-sum boundary
        differences (empty segments produce exact zeros)."""
        cs = jnp.cumsum(contrib, axis=0)
        # cumsum value at each segment's end boundary; 0 for boundaries at
        # the very start (ends == 0, i.e. leading empty segments)
        b = jnp.where((ends > 0)[:, None], cs[jnp.maximum(ends - 1, 0)], 0.0)
        prev = jnp.concatenate([jnp.zeros((1, contrib.shape[1]), contrib.dtype),
                                b[:-1]], axis=0)
        # ends is non-decreasing, so prev[p] is the cumsum at this
        # segment's start; empty segments difference to exactly 0
        return b - prev

    def lm_solve(cam0, points0, obs=None, cam_mask_rt=None):
        if obs is None:
            obs = observations
        if use_blocks:
            obs = _sort_rows_by_point(obs)
        # runtime free-mask override: incremental SfM freezes/unfreezes
        # camera blocks between calls without recompiling
        cam_free = (jnp.asarray(cam_mask_rt, template.dtype)
                    if cam_mask_rt is not None else cam_free_default)
        dtype = cam0.dtype

        # per-family (beg_idx, end_idx) for pose-block accumulation, in
        # exactly family_blocks' order (prior families carry no camera block
        # and are dropped by zip truncation below)
        fam_pose_idx = []
        for o in obs.pixels:
            fam_pose_idx.append((o.beg_idx, o.end_idx))
        for o in obs.depths:
            if opts.depth_tri_weight > 0.0:
                fam_pose_idx.append((o.beg_idx, o.end_idx))
            if o.mesh_xyz is not None and opts.depth_mesh_weight > 0.0:
                fam_pose_idx.append((o.beg_idx, o.end_idx))

        # per-family sorted-segment end offsets for the cumsum point
        # reductions (None -> fall back to scatter-add: depth-mesh rows
        # have no point block; prior families are tiny). Loop constants —
        # computed once per solve, not per LM iteration.
        fam_ends = []
        if use_blocks:
            for o in obs.pixels:
                fam_ends.append(_segment_ends(o.point_idx))
            for o in obs.depths:
                if opts.depth_tri_weight > 0.0:
                    fam_ends.append(_segment_ends(o.point_idx))
                if o.mesh_xyz is not None and opts.depth_mesh_weight > 0.0:
                    fam_ends.append(None)
            for _ in _static_priors(obs, opts):
                fam_ends.append(None)
        else:
            fam_ends = [None] * len(fam_struct)

        if use_blocks:
            # One-hot row->ref-pose selectors (loop constants): pose-column
            # gathers become [N,R]@[R,7] matmuls and the transposed
            # reductions become [R,N]@[N,7] matmuls — MXU work instead of
            # serialized TPU scatter-adds.
            # bf16 storage for f32 solves ON TPU only: 0/1 entries are
            # exact in bf16, and TPU matmuls at default precision round
            # f32 inputs to bf16 anyway (measured: identical result) — so
            # bf16 one-hots halve the dominant HBM stream of every
            # pose-column gather/reduction with zero numerical change on
            # TPU. Accumulation stays f32 via preferred_element_type.
            # Other backends (XLA:CPU computes full-f32 matmuls) and f64
            # solves keep full precision — quantizing there would be a
            # silent accuracy regression (advisor r2).
            # device platform (not backend name: the axon plugin registers
            # backend 'axon' whose devices still report platform 'tpu')
            on_tpu = jax.devices()[0].platform == "tpu"
            oh_dtype = (jnp.bfloat16
                        if (dtype == jnp.float32 and on_tpu) else dtype)

            def onehot(idx):
                r_ = jnp.arange(num_ref, dtype=jnp.int32)
                return (idx[:, None] == r_[None, :]).astype(oh_dtype)

            pix_oh = {}
            dep_oh = {}
            metas = []
            for fs in fam_struct:
                if fs is None:
                    metas.append(None)
                    continue
                kind, i, ccols = fs
                cache = pix_oh if kind == "pix" else dep_oh
                if i not in cache:
                    o = obs.pixels[i] if kind == "pix" else obs.depths[i]
                    cache[i] = (onehot(o.beg_idx),
                                None if fold_brackets else onehot(o.end_idx))
                metas.append(cache[i] + (jnp.asarray(ccols),))
        else:
            metas = [None] * len(fam_struct)

        # carried block Jacobians (use_blocks only): the LM loop carries
        # (j_cam list, j_pt list, residual) AT THE CURRENT STATE, so each
        # iteration runs family_blocks exactly ONCE — at the trial point,
        # whose aux residual gives the accept cost, and whose blocks become
        # the next iteration's blocks on accept. The previous structure ran
        # family_blocks(current) + a separate full residual eval (trial)
        # every iteration: ~1.6 residual-graph executions per iteration vs
        # 1 now. Column/point index tables are loop constants (obs-derived).
        if use_blocks:
            fams0, r0 = family_blocks(cam0, points0, obs)
            fam_cols = tuple(f[1] for f in fams0)
            fam_pidx = tuple(f[3] for f in fams0)
            jb0 = tuple(f[0] for f in fams0)
            jp0 = tuple(f[2] for f in fams0)
            c0 = 0.5 * jnp.sum(r0 * r0)
        else:
            jb0 = jp0 = ()
            r0 = jnp.zeros((0,), dtype)
            c0 = cost_of(cam0, points0, obs)

        class S(NamedTuple):
            cam: jnp.ndarray
            points: jnp.ndarray
            cost: jnp.ndarray
            lam: jnp.ndarray
            nu: jnp.ndarray
            it: jnp.ndarray
            cg_total: jnp.ndarray
            done: jnp.ndarray
            jb: tuple
            jp: tuple
            r: jnp.ndarray

        def cond(s):
            return (s.it < max_iterations) & (~s.done)

        zero_c = jnp.zeros(layout.total, dtype)
        zero_p = jnp.zeros((num_points, 3), dtype)

        def dense_families(fams):
            """Per-family dense camera Jacobians [N,k,C] (one scatter each;
            cheap when C is small). Everything downstream becomes matmuls."""
            out = []
            for j_cam, cols, j_pt, pidx in fams:
                if j_cam is None:
                    out.append(None)
                    continue
                N, k, B = j_cam.shape
                dense = jnp.zeros((N, k, layout.total), dtype)
                n_idx = jnp.arange(N)[:, None, None]
                k_idx = jnp.arange(k)[None, :, None]
                dense = dense.at[n_idx, k_idx, cols[:, None, :]].add(j_cam)
                out.append(dense)
            return out

        def body(s):
            reduce_cols = None
            if use_blocks:
                # zero jvp/vjp passes and zero residual-graph executions at
                # the current state: the carried blocks/residual (computed
                # as last iteration's trial) drive every J/J^T product
                lin = lin_t = None
                fams = tuple(
                    (jb, cols, jp, pidx)
                    for jb, cols, jp, pidx in zip(s.jb, fam_cols, s.jp,
                                                  fam_pidx))
                r = s.r

                def xr_of(j_cam, meta, xc):
                    """Gather each row's camera-param sub-vector [N,B] via
                    one-hot matmuls (row gathers of 7-wide slices measured
                    SLOWER than the [N,R]@[R,7] matmul on TPU — small-row
                    gathers don't vectorize; the matmul streams the bf16
                    one-hot at full HBM bandwidth). With fold_brackets the
                    beg/end matmuls collapse into one against the packed
                    [R,14] table [W[r] | W[r+1]] (see the fold note above)."""
                    ohb, ohe, ccols = meta
                    Wref = xc[:num_ref * 7].reshape(num_ref, 7)
                    const = jnp.broadcast_to(xc[ccols],
                                             (j_cam.shape[0], ccols.shape[0]))
                    if ohe is None:
                        Wnext = jnp.concatenate([Wref[1:], Wref[-1:]], axis=0)
                        Wcat = jnp.concatenate([Wref, Wnext],
                                               axis=1).astype(oh_dtype)
                        return jnp.concatenate(
                            [jnp.matmul(ohb, Wcat,
                                        preferred_element_type=dtype),
                             const], axis=-1)
                    Wb = Wref.astype(oh_dtype)
                    return jnp.concatenate(
                        [jnp.matmul(ohb, Wb, preferred_element_type=dtype),
                         jnp.matmul(ohe, Wb, preferred_element_type=dtype),
                         const], axis=-1)

                def reduce_cols(contribs):
                    """[(meta, [N,B])] -> [C]: one-hot matmuls for the pose
                    columns, plain sum reductions for the per-sensor static
                    columns. Folded: one [R,N]@[N,14] matmul per family; the
                    end-half lands on pose r+1 via an on-chip shifted add
                    (degenerate rows contribute exact zeros there)."""
                    gc = jnp.zeros(layout.total, dtype)
                    gpose = jnp.zeros((num_ref, 7), dtype)
                    for meta, contrib in contribs:
                        ohb, ohe, ccols = meta
                        cb = contrib.astype(oh_dtype)
                        if ohe is None:
                            g14 = jnp.matmul(ohb.T, cb[:, :14],
                                             preferred_element_type=dtype)
                            gpose = gpose + g14[:, :7]
                            gpose = gpose.at[1:].add(g14[:-1, 7:14])
                        else:
                            gpose = gpose \
                                + jnp.matmul(ohb.T, cb[:, :7],
                                             preferred_element_type=dtype) \
                                + jnp.matmul(ohe.T, cb[:, 7:14],
                                             preferred_element_type=dtype)
                        gc = gc.at[ccols].add(jnp.sum(contrib[:, 14:], axis=0))
                    return gc.at[:num_ref * 7].add(gpose.reshape(-1))

                def Jmv(xc, xp):
                    """J @ (xc, xp). Pass xc=None / xp=None to statically
                    skip that side (a zeros argument would still stream the
                    full [N,k,B] block tensors through the einsums — XLA
                    cannot DCE a runtime-zero operand)."""
                    parts = []
                    for (j_cam, cols, j_pt, pidx), meta in zip(fams, metas):
                        u = None
                        if j_cam is not None and xc is not None:
                            u = jnp.einsum("nkb,nb->nk", j_cam,
                                           xr_of(j_cam, meta, xc))
                        if j_pt is not None and xp is not None:
                            up = jnp.einsum("nkj,nj->nk", j_pt, xp[pidx])
                            u = up if u is None else u + up
                        if u is None:
                            blk = j_cam if j_cam is not None else j_pt
                            u = jnp.zeros(blk.shape[:2], dtype)
                        parts.append(u.reshape(-1))
                    return jnp.concatenate(parts)

                def _iter_ublocks(u):
                    """Slice the flat residual-space vector into per-family
                    [n,k] blocks alongside the family/meta/ends tuples."""
                    off = 0
                    for (j_cam, cols, j_pt, pidx), meta, ends in zip(
                            fams, metas, fam_ends):
                        blk = j_cam if j_cam is not None else j_pt
                        n, k = blk.shape[0], blk.shape[1]
                        ub = jax.lax.dynamic_slice_in_dim(u, off, n * k)
                        yield (j_cam, cols, j_pt, pidx), meta, ends, \
                            ub.reshape(n, k)
                        off += n * k

                def _pt_accum(gp, j_pt, pidx, ends, ub):
                    """Accumulate J_p^T u of one family into gp [P,3]."""
                    c = _pt_contrib(j_pt, ub)
                    if ends is not None:
                        return gp + _cumsum_reduce(c, ends)
                    return gp.at[pidx].add(c)

                def _pt_contrib(j_pt, ub):
                    """Per-row J_p^T u in rank-2 form: [N,3] via three
                    [N,k] multiply-reduces (an einsum over [N,k,3] keeps a
                    rank-3 intermediate whose (k,3) trailing dims pad to
                    (8,128) TPU tiles — measured ~14x wasted HBM traffic).
                    The optimization_barrier stops XLA from fusing this
                    computation INTO the downstream scatter-add's serial
                    emitter (measured: the fused scatter runs 2.6 ms at
                    384k obs vs ~0.04 ms for the scatter alone)."""
                    return jax.lax.optimization_barrier(jnp.stack(
                        [jnp.sum(j_pt[:, :, j] * ub, axis=1) for j in range(3)],
                        axis=-1))

                def JTmv_p(u):
                    """Point side only of J^T u (the camera-side streams of
                    a full transpose product are skipped statically)."""
                    gp = jnp.zeros((num_points, 3), dtype)
                    for (j_cam, cols, j_pt, pidx), meta, ends, ub in \
                            _iter_ublocks(u):
                        if j_pt is not None:
                            gp = _pt_accum(gp, j_pt, pidx, ends, ub)
                    return gp

                def JTmv_c(u):
                    """Camera side only of J^T u."""
                    contribs = []
                    for (j_cam, cols, j_pt, pidx), meta, ends, ub in \
                            _iter_ublocks(u):
                        if j_cam is not None:
                            contribs.append(
                                (meta, jnp.einsum("nkb,nk->nb", j_cam, ub)))
                    return reduce_cols(contribs)

                def JTmv(u):
                    gp = jnp.zeros((num_points, 3), dtype)
                    contribs = []
                    for (j_cam, cols, j_pt, pidx), meta, ends, ub in \
                            _iter_ublocks(u):
                        if j_cam is not None:
                            contribs.append(
                                (meta, jnp.einsum("nkb,nk->nb", j_cam, ub)))
                        if j_pt is not None:
                            gp = _pt_accum(gp, j_pt, pidx, ends, ub)
                    return reduce_cols(contribs), gp

                gc_raw, g_p = JTmv(r)
            else:
                # linearize once per iteration: the jvp/vjp matvecs fuse into
                # dense compiled ops with no extra memory footprint
                r, lin = jax.linearize(lambda c, p: residuals(c, p, obs),
                                       s.cam, s.points)
                lin_t = jax.linear_transpose(lin, s.cam, s.points)
                Jmv = lin

                def JTmv(u):
                    return lin_t(u)

                gc_raw, g_p = lin_t(r)
                fams, _ = family_blocks(s.cam, s.points, obs)

            g_c = gc_raw * cam_free

            if use_blocks:
                # Hpp accumulated in packed [P,9] rank-2 form: the outer
                # products are 9 [N,k] multiply-reduces and the scatter-add
                # streams [N,9] — an einsum to [N,3,3] + scatter pads the
                # (3,3) trailing dims to (8,128) TPU tiles (~14x traffic,
                # measured ~25 ms alone at 384k obs)
                hpp9 = jnp.zeros((num_points, 9), template.dtype)
                contribs = []
                for (j_cam, cols, j_pt, pidx), meta, ends in zip(
                        fams, metas, fam_ends):
                    if j_pt is not None and pidx is not None:
                        outer = jnp.stack(
                            [jnp.sum(j_pt[:, :, i] * j_pt[:, :, j], axis=1)
                             for i in range(3) for j in range(3)], axis=-1)
                        if ends is not None:
                            hpp9 = hpp9 + _cumsum_reduce(outer, ends)
                        else:
                            hpp9 = hpp9.at[pidx].add(outer)
                    if j_cam is not None:
                        contribs.append((meta, jnp.sum(j_cam * j_cam, axis=1)))
                hpp = hpp9.reshape(num_points, 3, 3)
                cam_diag = reduce_cols(contribs)
            else:
                hpp, cam_diag = hpp_and_diag(fams)
            cam_diag = jnp.clip(cam_diag, 1e-12, 1e32)
            pt_diag = jnp.clip(jnp.diagonal(hpp, axis1=-2, axis2=-1), 1e-12, 1e32)

            hpp_damped = hpp + jax.vmap(jnp.diag)(s.lam * pt_diag)
            hpp_inv = inv3x3_spd(hpp_damped)

            def solve3(rhs):
                """Hpp^-1 @ rhs [P,3] via the precomputed block inverses."""
                return jnp.einsum("pij,pj->pi", hpp_inv, rhs)

            # damped camera diagonal; frozen entries pinned to 1 (step 0)
            dc = s.lam * cam_diag * cam_free + (1.0 - cam_free)
            precond = 1.0 / (cam_diag * cam_free + dc)

            if use_block_precond:
                # SCHUR_JACOBI: per-row-exact 7x7 pose blocks of
                # S = B - E Hpp^-1 E^T (each row's point-block Schur
                # complement is PSD, so the accumulated blocks + damping are
                # SPD); non-pose parameters stay on the scalar diagonal.
                #
                # Assembled in PACKED RANK-2 form: every per-row quantity is
                # an [N] or [N,k] array and the 49 block entries are stacked
                # at the end. The einsum formulation materializes [N,7,7]
                # and [N,7,3] intermediates whose trailing dims pad to
                # (8,128) TPU tiles — profiled at ~20 ms per LM iteration at
                # 384k rows vs ~1 ms packed. Symmetry halves the products.
                free_pose = cam_free[:num_ref * 7].reshape(num_ref, 7)
                hinv9_all = hpp_inv.reshape(num_points, 9)
                blocks = jnp.zeros((num_ref, 7, 7), dtype)
                for (j_cam, cols, j_pt, pidx), pi, meta in zip(
                        fams, fam_pose_idx, metas):
                    if j_cam is None or pi is None:
                        continue
                    if j_pt is not None and pidx is not None:
                        hinv9 = jax.lax.optimization_barrier(hinv9_all[pidx])
                        jp = [j_pt[:, :, m] for m in range(3)]
                        H = [[hinv9[:, 3 * a + b] for b in range(3)]
                             for a in range(3)]
                    fold_rows = {}
                    for sl, idx, side in ((slice(0, 7), pi[0], 0),
                                          (slice(7, 14), pi[1], 1)):
                        # per-column free mask via a row gather of the pose
                        # free-mask table (a flat cam_free[cols] gather gets
                        # fused into pathological layouts — see the blocks
                        # builder)
                        fmask = jax.lax.optimization_barrier(
                            free_pose[pi[side]])          # [N,7]
                        jb = [j_cam[:, :, sl.start + i] * fmask[:, i:i + 1]
                              for i in range(7)]          # 7 x [N,k]
                        bb = {}
                        for i in range(7):
                            for j in range(i, 7):
                                bb[(i, j)] = jnp.sum(jb[i] * jb[j], axis=1)
                        if j_pt is not None and pidx is not None:
                            E = [[jnp.sum(jb[i] * jp[m], axis=1)
                                  for m in range(3)] for i in range(7)]
                            W = [[E[i][0] * H[0][m] + E[i][1] * H[1][m]
                                  + E[i][2] * H[2][m] for m in range(3)]
                                 for i in range(7)]
                            for i in range(7):
                                for j in range(i, 7):
                                    bb[(i, j)] = bb[(i, j)] - (
                                        W[i][0] * E[j][0] + W[i][1] * E[j][1]
                                        + W[i][2] * E[j][2])
                        rows49 = jnp.stack(
                            [bb[(min(i, j), max(i, j))]
                             for i in range(7) for j in range(7)], axis=-1)
                        if meta is not None and meta[1] is None:
                            fold_rows[side] = rows49
                        elif meta is not None:
                            # one-hot matmul segment-sum (no TPU scatter)
                            blocks = blocks + jnp.matmul(
                                meta[side].T,
                                rows49.astype(oh_dtype),
                                preferred_element_type=dtype,
                            ).reshape(num_ref, 7, 7)
                        else:
                            blocks = blocks.at[idx].add(
                                rows49.reshape(-1, 7, 7))
                    if fold_rows:
                        # folded: ONE [R,N]@[N,98] selector matmul covers
                        # both pose sides; the end-side half lands on pose
                        # r+1 via a shifted add (degenerate rows contribute
                        # exact zeros there — see the fold note)
                        g98 = jnp.matmul(
                            meta[0].T,
                            jnp.concatenate([fold_rows[0], fold_rows[1]],
                                            axis=-1).astype(oh_dtype),
                            preferred_element_type=dtype)
                        blocks = blocks + g98[:, :49].reshape(num_ref, 7, 7)
                        blocks = blocks.at[1:].add(
                            g98[:-1, 49:].reshape(num_ref - 1, 7, 7))
                blocks = blocks + jax.vmap(jnp.diag)(
                    dc[:num_ref * 7].reshape(num_ref, 7))
                pose_prec_inv = jnp.linalg.inv(blocks)
                rest_precond = precond[num_ref * 7:]

                def precond_apply(r):
                    rp = r[:num_ref * 7].reshape(num_ref, 7)
                    xp_ = jnp.einsum("rij,rj->ri", pose_prec_inv, rp)
                    return jnp.concatenate([xp_.reshape(-1),
                                            r[num_ref * 7:] * rest_precond])
            else:
                def precond_apply(r):
                    return precond * r

            if use_dense_j:
                # matmul-only matvecs from dense per-family camera Jacobians
                # [N,k,C]: one scatter per LM iteration (the densify), zero
                # scatters inside CG; the point side stays tiny gathers.
                dens = dense_families(fams)

                def Jx(xc, xp):
                    parts = []
                    for (j_cam, cols, j_pt, pidx), dense in zip(fams, dens):
                        u = None
                        if dense is not None:
                            u = jnp.einsum("nkc,c->nk", dense, xc,
                                           preferred_element_type=dtype)
                        if j_pt is not None:
                            up = jnp.einsum("nkj,nj->nk", j_pt, xp[pidx])
                            u = up if u is None else u + up
                        parts.append(u.reshape(-1))
                    return jnp.concatenate(parts)

                def JTu(u):
                    gc = jnp.zeros(layout.total, dtype)
                    gp = jnp.zeros((num_points, 3), dtype)
                    off = 0
                    for (j_cam, cols, j_pt, pidx), dense in zip(fams, dens):
                        blk = j_cam if j_cam is not None else j_pt
                        n, k = blk.shape[0], blk.shape[1]
                        ub = jax.lax.dynamic_slice_in_dim(u, off, n * k)
                        ub = ub.reshape(n, k)
                        off += n * k
                        if dense is not None:
                            gc = gc + jnp.einsum("nkc,nk->c", dense, ub,
                                                 preferred_element_type=dtype)
                        if j_pt is not None:
                            gp = gp.at[pidx].add(
                                jnp.einsum("nkj,nk->nj", j_pt, ub))
                    return gc, gp

                def schur_mv(x):
                    u = Jx(x * cam_free, zero_p)
                    _, v = JTu(u)
                    w = solve3(v)
                    z = Jx(zero_c, w)
                    gc, _ = JTu(u - z)
                    return gc * cam_free + dc * x

                w0 = solve3(g_p)
                gc0, _ = JTu(Jx(zero_c, w0))
                rhs = -(g_c - gc0 * cam_free)
            elif use_blocks:
                # side-split transposed products: each matvec streams the
                # camera blocks exactly twice and the point blocks exactly
                # twice — the full JTmv's discarded sides (a cam-side
                # reduction thrown away after the first product, a point
                # scatter after the last) were ~1/3 of the matvec traffic
                def schur_mv(x):
                    u = Jmv(x * cam_free, None)
                    w = solve3(JTmv_p(u))
                    z = Jmv(None, w)
                    gc = JTmv_c(u - z)
                    return gc * cam_free + dc * x

                # rhs = -(g_c - E Hpp^-1 g_p)
                w0 = solve3(g_p)
                gc0 = JTmv_c(Jmv(None, w0))
                rhs = -(g_c - gc0 * cam_free)
            else:
                def schur_mv(x):
                    u = Jmv(x * cam_free, zero_p)
                    _, v = JTmv(u)
                    w = solve3(v)
                    z = Jmv(zero_c, w)
                    gc, _ = JTmv(u - z)
                    return gc * cam_free + dc * x

                # rhs = -(g_c - E Hpp^-1 g_p)
                w0 = solve3(g_p)
                gc0, _ = JTmv(Jmv(zero_c, w0))
                rhs = -(g_c - gc0 * cam_free)

            def dense_schur_solve(rhs):
                """DENSE_SCHUR: assemble S = B - E Hpp^-1 E^T and Cholesky —
                the right linear solver for small camera-parameter counts
                (Ceres' DENSE_SCHUR analogue). All matmul/MXU work, no CG."""
                C = layout.total
                dens = dense_families(fams)
                B = jnp.zeros((C, C), dtype)
                E = jnp.zeros((num_points, C, 3), dtype)
                for (j_cam, cols, j_pt, pidx), dense in zip(fams, dens):
                    if dense is not None:
                        B = B + jnp.einsum("nkc,nkd->cd", dense, dense,
                                           preferred_element_type=dtype)
                    if dense is not None and j_pt is not None:
                        outer = jnp.einsum("nkb,nkj->nbj", j_cam, j_pt)
                        n_idx = pidx[:, None, None]
                        c_idx = cols[:, :, None]
                        j_idx = jnp.arange(3)[None, None, :]
                        E = E.at[n_idx, c_idx, j_idx].add(outer)
                T = jnp.einsum("pci,pij->pcj", E, hpp_inv)
                S = B - jnp.einsum("pcj,pdj->cd", T, E,
                                   preferred_element_type=dtype)
                # damping + freeze: zero frozen rows/cols, unit diagonal there
                S = S * cam_free[:, None] * cam_free[None, :] + jnp.diag(dc)
                Lc, lowflag = jax.scipy.linalg.cho_factor(S)
                x = jax.scipy.linalg.cho_solve((Lc, lowflag), rhs)
                return x * cam_free, jnp.asarray(0)

            # PCG on the reduced camera system
            def cg(rhs):
                x = jnp.zeros_like(rhs)
                rr = rhs
                zz = precond_apply(rr)
                p = zz
                rz = jnp.sum(rr * zz)
                norm0 = jnp.sum(rhs * rhs)

                def cg_body(carry):
                    x, rr, p, rz, k = carry
                    Ap = schur_mv(p)
                    denom = jnp.sum(p * Ap)
                    alpha = rz / jnp.where(denom > 0, denom, 1.0)
                    alpha = jnp.where(denom > 0, alpha, 0.0)
                    x = x + alpha * p
                    rr = rr - alpha * Ap
                    zz = precond_apply(rr)
                    rz_new = jnp.sum(rr * zz)
                    beta = rz_new / jnp.where(rz > 0, rz, 1.0)
                    p = zz + beta * p
                    return x, rr, p, rz_new, k + 1

                def cg_cond(carry):
                    x, rr, p, rz, k = carry
                    return (k < cg_iterations) & (jnp.sum(rr * rr) > cg_tolerance ** 2 * norm0)

                if debug_force_cg is not None:
                    carry = (x, rr, p, rz, jnp.asarray(0))
                    for _ in range(debug_force_cg):
                        carry = cg_body(carry)
                    x, rr, p, rz, k = carry
                else:
                    x, rr, p, rz, k = jax.lax.while_loop(
                        cg_cond, cg_body, (x, rr, p, rz, jnp.asarray(0)))
                return x, k

            if use_dense_schur:
                dc_step, cg_k = dense_schur_solve(rhs)
            else:
                dc_step, cg_k = cg(rhs)

            # back-substitute points: dp = Hpp^-1 (-g_p - Jp^T Jc dc)
            u = Jmv(dc_step * cam_free, None if use_blocks else zero_p)
            v = JTmv_p(u) if use_blocks else JTmv(u)[1]
            dp = solve3(-g_p - v)

            cam_new = project(s.cam + dc_step * cam_free)
            pts_new = s.points + dp
            if use_blocks:
                # ONE family_blocks per iteration: the trial point's blocks
                # + aux residual give the accept cost now and the next
                # iteration's Jacobians on accept
                fams_t, r_t = family_blocks(cam_new, pts_new, obs)
                new_cost = 0.5 * jnp.sum(r_t * r_t)
            else:
                new_cost = cost_of(cam_new, pts_new, obs)

            # exact model reduction: -g.d - 0.5|Jd|^2 - 0.5 lam d'Dd
            step_c = cam_new - s.cam
            if use_blocks and lower is None and upper is None:
                # unbounded: step_c == dc_step * cam_free, so the camera
                # half of J·d is exactly the backsubstitution product u —
                # reuse it instead of re-streaming every camera block
                Jd = u + Jmv(None, dp)
            else:
                Jd = Jmv(step_c, dp)
            pred = -(jnp.sum(step_c * g_c) + jnp.sum(dp * g_p)) \
                - 0.5 * jnp.sum(Jd * Jd) \
                - 0.5 * s.lam * (jnp.sum(cam_diag * step_c * step_c)
                                 + jnp.sum(pt_diag * dp * dp))
            good = (new_cost < s.cost) & jnp.isfinite(new_cost)

            rho = (s.cost - new_cost) / jnp.maximum(jnp.abs(pred), 1e-30)
            lam_dec = s.lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            lam_new = jnp.where(good, jnp.maximum(lam_dec, 1e-14), s.lam * s.nu)
            nu_new = jnp.where(good, jnp.asarray(2.0, dtype), s.nu * 2.0)

            rel_decrease = jnp.abs(s.cost - new_cost) / jnp.maximum(s.cost, 1e-30)
            done = (good & (rel_decrease < 1e-10)) | (s.lam > 1e12)

            if use_blocks:
                def sel(a, b):
                    return None if a is None else jnp.where(good, a, b)
                jb_new = tuple(sel(f[0], old)
                               for f, old in zip(fams_t, s.jb))
                jp_new = tuple(sel(f[2], old)
                               for f, old in zip(fams_t, s.jp))
                r_new = jnp.where(good, r_t, s.r)
            else:
                jb_new, jp_new, r_new = s.jb, s.jp, s.r

            return S(jnp.where(good, cam_new, s.cam),
                     jnp.where(good, pts_new, s.points),
                     jnp.where(good, new_cost, s.cost),
                     lam_new, nu_new, s.it + 1, s.cg_total + cg_k, done,
                     jb_new, jp_new, r_new)

        init = S(cam0, points0, c0, jnp.asarray(lam0, dtype), jnp.asarray(2.0, dtype),
                 jnp.asarray(0), jnp.asarray(0), jnp.asarray(False),
                 jb0, jp0, r0)
        if debug_unroll_lm > 0:
            out = init
            for _ in range(debug_unroll_lm):
                out = body(out)
        else:
            out = jax.lax.while_loop(cond, body, init)
        return SchurLMResult(out.cam, out.points, out.cost, c0, out.it, out.lam,
                             out.cg_total)

    return lm_solve
