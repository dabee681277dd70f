"""Incremental SfM pose initialization (Theia's INCREMENTAL estimator role).

The reference pins ``--reconstruction_estimator=GLOBAL``
(`/root/reference/rig_calibrator/theia_flags.txt:64`), but the engine it
wraps (TheiaSfM) equally offers INCREMENTAL, with its knobs pinned in the
same flagfile (`theia_flags.txt:106-114`:
``absolute_pose_reprojection_error_threshold``,
``partial_bundle_adjustment_num_views``,
``full_bundle_adjustment_growth_percent``,
``min_num_absolute_pose_inliers``). This module provides that capability
TPU-natively, as a robustness alternative when global averaging is weak
(low-overlap chains, rotation-dominant motion):

- the initial pair comes from per-pair batched-hypothesis essential RANSAC
  (sfm/ransac.py) with a baseline-angle quality gate;
- views register by batched-hypothesis DLT-PnP RANSAC (``ransac_pnp``);
- all tracks re-triangulate each round as ONE vmapped padded batch
  (geometry/triangulation.py);
- partial/full bundle adjustment runs on the Schur-LM solver through a
  SINGLE compiled executable: index arrays, observation masks, and the
  camera free-mask are runtime values (solver/schur.py), so the growing
  active set never triggers a recompile.

Everything operates on unit-plane (undistorted, focal-normalized)
observations with a single synthetic pinhole sensor (focal=1), matching
Theia's ``--intrinsics_to_optimize=NONE`` recipe (`theia_flags.txt:127`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.geometry import triangulation as tri_mod
from multiview_tpu.sfm import ransac as ransac_mod
from multiview_tpu.sfm.global_sfm import _two_view_ransac_jit
from multiview_tpu.utils.padding import pad_rows_pow2
from multiview_tpu.calib import problem as prob
from multiview_tpu.solver import schur


@dataclasses.dataclass(frozen=True)
class IncrementalOptions:
    """Knobs mirroring the Theia flagfile (theia_flags.txt:106-114), with
    the pixel threshold expressed on the unit plane (4 px at a 1024-wide
    image with f~1000 is ~4e-3)."""

    reproj_threshold: float = 4e-3       # absolute_pose_reprojection_error_threshold
    min_pnp_inliers: int = 30            # min_num_absolute_pose_inliers
    partial_ba_views: int = 20           # partial_bundle_adjustment_num_views
    full_ba_growth_percent: float = 5.0  # full_bundle_adjustment_growth_percent
    ba_iterations: int = 10
    min_init_angle_deg: float = 2.0      # initial-pair baseline quality gate
    essential_threshold: float = 1e-3    # Sampson gate for the view graph
    verbose: bool = False


@jax.jit
def _triangulate_all(poses, track_cam, track_uv, track_mask):
    """Re-triangulate every track against the current poses in one batch.

    poses [V,7]; track_cam [P,MV] view index per slot; track_uv [P,MV,2]
    unit-plane obs; track_mask [P,MV] slot usable (slot exists AND its view
    is registered AND the observation is not an outlier).
    """
    Pm = tri_mod.projection_matrix(jnp.ones((), poses.dtype), poses)
    xyz, min_depth, valid = tri_mod.triangulate_tracks(
        Pm[track_cam], track_uv, track_mask, 3)
    valid = valid & (min_depth > 0)
    # invalid tracks can triangulate to non-finite xyz, which would poison
    # even MASKED residuals (nan * 0 = nan) — pin them to the origin
    xyz = jnp.where((valid & jnp.all(jnp.isfinite(xyz), axis=-1))[:, None],
                    xyz, 0.0)
    return xyz, valid


@jax.jit
def _reproj_errors(poses, points, obs_cam, obs_pid, obs_uv):
    """Unit-plane reprojection error + camera-frame depth per observation."""
    Xc = pose_mod.pose_apply(poses[obs_cam], points[obs_pid])
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    err = jnp.linalg.norm(Xc[..., :2] / zs[..., None] - obs_uv, axis=-1)
    return err, z


@jax.jit
def _pnp_jit(X, x, valid, threshold):
    return ransac_mod.ransac_pnp(X, x, valid=valid, threshold=threshold)


def _median_ray_angle_deg(x1, x2, R, inl) -> float:
    """Median angle between corresponding viewing rays after rotation
    compensation — a proxy for triangulation conditioning of the pair."""
    f1 = np.concatenate([x1, np.ones((len(x1), 1))], axis=1)
    f2 = np.concatenate([x2, np.ones((len(x2), 1))], axis=1)
    f1 /= np.linalg.norm(f1, axis=1, keepdims=True)
    f2 /= np.linalg.norm(f2, axis=1, keepdims=True)
    a2 = f2 @ np.asarray(R)             # R^T f2 per row
    cosang = np.clip(np.sum(f1 * a2, axis=1), -1.0, 1.0)
    ang = np.degrees(np.arccos(cosang))
    sel = np.asarray(inl, bool)
    if not sel.any():
        return 0.0
    return float(np.median(ang[sel]))


def run_incremental_sfm(pair_data, num_views: int, track_obs,
                        opts: IncrementalOptions = IncrementalOptions(),
                        dtype=jnp.float64):
    """Incremental pose initialization.

    pair_data: {(i,j): (x1 [K,2], x2 [K,2])} unit-plane correspondences.
    track_obs: (obs_cam [M], obs_pid [M], obs_uv [M,2]) flat track
        observations in unit-plane coordinates; pids in [0, num_tracks).

    Returns (poses [V,7] world->cam, registered [V] bool, points [P,3],
    point_valid [P] bool). Unregistered views keep identity poses.
    """
    obs_cam, obs_pid, obs_uv = (np.asarray(track_obs[0], np.int32),
                                np.asarray(track_obs[1], np.int32),
                                np.asarray(track_obs[2], float))
    num_tracks = int(obs_pid.max()) + 1 if len(obs_pid) else 0
    M = len(obs_cam)

    # ---- per-track padded view tables (static for the run) ----
    from multiview_tpu.utils.padding import group_ranks
    counts = np.bincount(obs_pid, minlength=num_tracks)
    MV = max(2, int(counts.max()) if len(counts) else 2)
    track_cam = np.zeros((num_tracks, MV), np.int32)
    track_uv = np.zeros((num_tracks, MV, 2), float)
    track_slot = np.zeros((num_tracks, MV), bool)
    track_obs_row = np.full((num_tracks, MV), -1, np.int64)  # flat obs index
    # vectorized fill: rank of each observation within its track
    order, spid, rank = group_ranks(obs_pid)
    track_cam[spid, rank] = obs_cam[order]
    track_uv[spid, rank] = obs_uv[order]
    track_slot[spid, rank] = True
    track_obs_row[spid, rank] = order
    track_cam_j = jnp.asarray(track_cam)
    track_uv_j = jnp.asarray(track_uv, dtype)

    # ---- view graph: essential RANSAC per pair ----
    best = None  # (score, i, j, R, t)
    for (i, j), (x1, x2) in pair_data.items():
        if len(x1) < 8:
            continue
        x1p = pad_rows_pow2(np.asarray(x1, float))
        x2p = pad_rows_pow2(np.asarray(x2, float))
        vp = pad_rows_pow2(np.ones(len(x1), bool), fill=False)
        (inl, n_inl, R, t, inl_h, n_inl_h, R_h, t_h) = _two_view_ransac_jit(
            jnp.asarray(x1p), jnp.asarray(x2p), jnp.asarray(vp),
            opts.essential_threshold)
        # planar-dominated pair: the homography decomposition is the
        # reliable (R, t), but keep the union inlier set so off-plane
        # inliers still count toward the pair score and seeding
        # (see _two_view_ransac_jit / global_sfm.view_graph_from_matches)
        if int(n_inl) > 0 and int(n_inl_h) > 0.8 * int(n_inl):
            R, t = R_h, t_h
            inl = inl | inl_h
            n_inl = jnp.sum(inl)
        n_inl = int(n_inl)
        if n_inl < 16:
            continue
        ang = _median_ray_angle_deg(x1p, x2p, R, np.asarray(inl))
        ok_angle = ang >= opts.min_init_angle_deg
        score = (1 if ok_angle else 0, n_inl)
        if best is None or score > best[0]:
            best = (score, i, j, np.asarray(R), np.asarray(t))
    if best is None:
        raise ValueError("incremental SfM: no pair with enough inliers")
    _, vi, vj, R0, t0 = best

    poses = np.tile(np.asarray(pose_mod.pose_identity(dtype)), (num_views, 1))
    poses[vj] = np.asarray(pose_mod.make_pose(
        jnp.asarray(t0, dtype), pose_mod.matrix_to_quat(jnp.asarray(R0, dtype))))
    registered = np.zeros(num_views, bool)
    registered[[vi, vj]] = True
    reg_order = [vi, vj]
    obs_outlier = np.zeros(M, bool)

    # ---- the single BA executable for the whole run ----
    template = prob.identity_state(num_views, 1, max(num_tracks, 1), [0],
                                   dtype=dtype)
    zeros_m = jnp.zeros(M, dtype)
    pix_obs = prob.PixelObs(
        pix=jnp.asarray(obs_uv, dtype), beg_idx=jnp.asarray(obs_cam),
        end_idx=jnp.asarray(obs_cam), point_idx=jnp.asarray(obs_pid),
        dt_cam=zeros_m, dt_bracket=zeros_m,
        mask=jnp.ones(M, bool), dist_half_size=jnp.zeros(2, dtype), sensor=0)
    observations = prob.Observations(pixels=(pix_obs,), depths=())
    cam_mask_full = prob.build_mask(template, prob.FloatSpec(cam_poses=True),
                                    no_rig=True, include_points=False)
    ba_opts = prob.BAOptions(no_rig=True,
                             robust_threshold=0.5 * opts.reproj_threshold)
    solver = jax.jit(schur.make_schur_solver(
        template, observations, ("none",), ba_opts, cam_mask_full,
        max_iterations=opts.ba_iterations, cg_iterations=40,
        cg_tolerance=0.1))
    layout = schur.cam_layout(template)

    points = np.zeros((max(num_tracks, 1), 3))
    point_valid = np.zeros(max(num_tracks, 1), bool)

    def triangulate():
        nonlocal points, point_valid
        usable = (track_slot & registered[track_cam]
                  & ~np.where(track_obs_row >= 0,
                              obs_outlier[np.maximum(track_obs_row, 0)], True))
        xyz, valid = _triangulate_all(jnp.asarray(poses, dtype), track_cam_j,
                                      track_uv_j, jnp.asarray(usable))
        points = np.array(xyz)
        point_valid = np.array(valid)

    def run_ba(free_views):
        nonlocal poses, points
        cam_mask_rt = np.zeros(layout.total)
        for v in free_views:
            cam_mask_rt[layout.world_to_ref + 7 * v:
                        layout.world_to_ref + 7 * (v + 1)] = 1.0
        mask = (~obs_outlier & registered[obs_cam] & point_valid[obs_pid])
        obs_rt = dataclasses.replace(
            observations,
            pixels=(dataclasses.replace(pix_obs, mask=jnp.asarray(mask)),))
        st = dataclasses.replace(template,
                                 world_to_ref=jnp.asarray(poses, dtype),
                                 points=jnp.asarray(points, dtype))
        cam0 = prob.pack_state(st, include_points=False)
        res = solver(cam0, st.points, obs_rt, jnp.asarray(cam_mask_rt, dtype))
        out = prob.unpack_state(res.cam, template, include_points=False)
        poses = np.array(out.world_to_ref)
        points = np.array(res.points)
        if opts.verbose:
            print(f"  BA({len(free_views)} views free): "
                  f"{float(res.initial_cost):.3e} -> {float(res.cost):.3e}")

    def filter_outliers(threshold=None):
        nonlocal obs_outlier
        if threshold is None:
            threshold = opts.reproj_threshold
        err, z = _reproj_errors(jnp.asarray(poses, dtype),
                                jnp.asarray(points, dtype),
                                jnp.asarray(obs_cam), jnp.asarray(obs_pid),
                                jnp.asarray(obs_uv, dtype))
        err = np.asarray(err)
        active = registered[obs_cam] & point_valid[obs_pid]
        bad = active & ((err > threshold) | (np.asarray(z) <= 0))
        obs_outlier |= bad  # monotone, like the reference's outlier gates
        sel = active & ~obs_outlier
        return float(np.median(err[sel])) if sel.any() else 0.0

    triangulate()
    run_ba(reg_order)
    filter_outliers()
    triangulate()
    last_full = 2

    while True:
        # candidate views: enough usable 2D-3D correspondences
        usable_obs = (~obs_outlier & point_valid[obs_pid]
                      & ~registered[obs_cam])
        cand_counts = np.bincount(obs_cam[usable_obs], minlength=num_views)
        min_needed = max(6, opts.min_pnp_inliers)
        cands = [v for v in np.argsort(-cand_counts)
                 if not registered[v] and cand_counts[v] >= min_needed]
        if not cands:
            break
        newly = []
        for v in cands:
            rows = np.where(usable_obs & (obs_cam == v))[0]
            Xp = pad_rows_pow2(points[obs_pid[rows]])
            xp = pad_rows_pow2(obs_uv[rows])
            vp = pad_rows_pow2(np.ones(len(rows), bool), fill=False)
            res = _pnp_jit(jnp.asarray(Xp, dtype), jnp.asarray(xp, dtype),
                           jnp.asarray(vp), opts.reproj_threshold)
            if opts.verbose:
                print(f"  PnP view {v}: {int(res.num_inliers)}/{len(rows)} "
                      f"inliers (need {opts.min_pnp_inliers})")
            if int(res.num_inliers) < opts.min_pnp_inliers:
                continue
            poses[v] = np.asarray(res.pose)
            registered[v] = True
            reg_order.append(int(v))
            newly.append(int(v))
            # PnP outliers of this view are outliers for good
            bad_rows = rows[~np.asarray(res.inliers)[:len(rows)]]
            obs_outlier[bad_rows] = True
        if not newly:
            break
        if opts.verbose:
            print(f"registered {len(newly)} views "
                  f"({int(registered.sum())}/{num_views})")
        triangulate()
        n_reg = int(registered.sum())
        if n_reg >= last_full * (1.0 + opts.full_ba_growth_percent / 100.0):
            run_ba(reg_order)          # full BA
            last_full = n_reg
        else:
            run_ba(reg_order[-opts.partial_ba_views:])  # partial BA
        filter_outliers()
        triangulate()

    # final self-tightening refinement: the registration gate may be loose
    # (it admits observations the user-level threshold allows); once every
    # view is in, progressively tighten the outlier gate toward the data's
    # own noise floor (4x the active median error) and re-optimize — the
    # mismatches that survive a loose gate are what warp near-degenerate
    # geometry (planar scenes, collinear trajectories).
    med = filter_outliers()
    for frac in (1.0, 0.5, 0.25):
        run_ba(reg_order)
        thr = max(opts.reproj_threshold * frac, 4.0 * med)
        med = filter_outliers(thr)
        triangulate()
    run_ba(reg_order)
    filter_outliers()
    triangulate()
    return (jnp.asarray(poses, dtype), registered,
            jnp.asarray(points, dtype), point_valid)
