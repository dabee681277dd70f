"""Multi-pass rig calibration driver: triangulate -> optimize -> filter
outliers, repeated.

TPU re-design of the reference driver's optimization loop
(`/root/reference/rig_calibrator/bin/rig_calibrator.cc:1550-1990`):

  for pass in range(num_passes):
      points   = multiViewTriangulation(...)         -> batched vmapped kernel
      solve    = ceres ITERATIVE_SCHUR               -> LM (dense or Schur CG)
      outliers = flagOutliersByTriAngleAndReprojErr  -> vectorized gates

Outlier state is a monotone boolean mask on padded observation tensors
(inliers never return, rig_calibrator.cc:1528-1532) instead of nested maps.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.geometry import triangulation as tri_mod
from multiview_tpu.geometry import distortion as dist_mod
from multiview_tpu.solver.lm import levenberg_marquardt
from multiview_tpu.calib import problem as prob


# ----------------------------------------------------------------------------
# Track table: padded [P, V] view of the flat observation tensors
# ----------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TrackTable:
    """Maps each track (pid) to its observations in the concatenated global
    observation ordering (pixel obs of sensor 0, then sensor 1, ...).

    track_obs: [P, V] int32 indices into the global obs arrays (-1 = pad)
    track_valid: [P, V] bool
    """

    track_obs: np.ndarray
    track_valid: np.ndarray
    sensor_offsets: Tuple[int, ...]  # start of each sensor's block in global order

    @property
    def num_points(self) -> int:
        return self.track_obs.shape[0]

    @property
    def max_views(self) -> int:
        return self.track_obs.shape[1]


def build_track_table(observations: prob.Observations, num_points: int) -> TrackTable:
    """Host-side: group observation rows by point id into a padded table."""
    per_point: List[List[int]] = [[] for _ in range(num_points)]
    offset = 0
    offsets = []
    for obs in observations.pixels:
        offsets.append(offset)
        pidx = np.asarray(obs.point_idx)
        for row, pid in enumerate(pidx):
            per_point[int(pid)].append(offset + row)
        offset += len(pidx)
    max_views = max(1, max(len(v) for v in per_point))
    track_obs = np.full((num_points, max_views), -1, np.int32)
    track_valid = np.zeros((num_points, max_views), bool)
    for pid, rows in enumerate(per_point):
        track_obs[pid, :len(rows)] = rows
        track_valid[pid, :len(rows)] = True
    return TrackTable(track_obs, track_valid, tuple(offsets))


# ----------------------------------------------------------------------------
# Global (concatenated) per-observation quantities
# ----------------------------------------------------------------------------


def _global_w2c(state: prob.RigState, observations: prob.Observations):
    parts = []
    for obs in observations.pixels:
        parts.append(prob._world_to_cam_for(
            state, obs.sensor, obs.beg_idx, obs.end_idx, obs.dt_cam, obs.dt_bracket))
    return jnp.concatenate(parts, axis=0)


def _global_undist_pix(state: prob.RigState, observations: prob.Observations,
                       models: Sequence[str]):
    """Measured pixels converted DISTORTED -> UNDISTORTED_C under current
    intrinsics (multiViewTriangulation's per-ray prep,
    interest_point.cc:673-680)."""
    parts = []
    for obs in observations.pixels:
        s = obs.sensor
        focal2 = jnp.stack([state.focal[s], state.focal[s]])
        und = dist_mod.undistort_centered(
            models[s], state.dist[s], obs.pix - obs.dist_half_size,
            focal2, state.optical_center[s], obs.dist_half_size)
        parts.append(und)
    return jnp.concatenate(parts, axis=0)


def _global_mask(observations: prob.Observations) -> jnp.ndarray:
    return jnp.concatenate([obs.mask for obs in observations.pixels])


def _global_focal(state: prob.RigState, observations: prob.Observations):
    parts = []
    for obs in observations.pixels:
        parts.append(jnp.full(len(obs), state.focal[obs.sensor], state.dtype))
    return jnp.concatenate(parts)


def _host_mask(mask) -> np.ndarray:
    """Host copy of an observation mask. Masks sharded over a multi-process
    mesh have non-addressable shards (np.asarray would raise); replicate
    through the mesh first — every process computes identical mask updates
    from the same full view (the DCN half of the outlier passes)."""
    if getattr(mask, "is_fully_addressable", True):
        return np.asarray(mask)
    sharding = mask.sharding
    rep = jax.NamedSharding(sharding.mesh, jax.sharding.PartitionSpec())
    return np.asarray(jax.device_put(mask, rep))


def _resharded_like(old_mask, merged: np.ndarray):
    new_mask = jnp.asarray(merged)
    sharding = getattr(old_mask, "sharding", None)
    if sharding is not None and getattr(sharding, "mesh", None) is not None:
        new_mask = jax.device_put(new_mask, sharding)
    return new_mask


def _scatter_mask_updates(observations: prob.Observations,
                          new_global_mask: np.ndarray) -> prob.Observations:
    """Split a global mask back into per-sensor PixelObs masks (monotone AND)
    AND release the depth observations of features that just died.

    The reference re-adds ``BracketedDepthError`` blocks each pass only for
    features still flagged inlier (`rig_calibrator.cc:1759-1794`, inlier gate
    at `:1620-1621`) — a feature flagged outlier loses its depth constraint
    too. Here that is: each DepthObs row's mask is ANDed with the surviving
    pixel mask at its ``pix_row``; rows without pix_row bookkeeping fall back
    to track-level release (die when their whole track has no surviving pixel
    inliers). Updated masks keep the old masks' sharding (outlier passes must
    not silently unshard a mesh-distributed problem)."""
    out = []
    off = 0
    for obs in observations.pixels:
        n = len(obs)
        merged = _host_mask(obs.mask) & new_global_mask[off:off + n]
        out.append(dataclasses.replace(obs, mask=_resharded_like(obs.mask, merged)))
        off += n

    new_depths = []
    if observations.depths:
        # per-point survivor counts for the pix_row-less fallback
        alive_pid = None
        for dob in observations.depths:
            old = _host_mask(dob.mask)
            if dob.pix_row is not None:
                feat_alive = new_global_mask[np.asarray(dob.pix_row)]
            else:
                if alive_pid is None:
                    # size over BOTH pixel and depth point ids: a depth row
                    # may reference a point no pixel obs indexes (it must
                    # then read dead, not index out of bounds / wrap)
                    npts = 1 + max(
                        [int(np.asarray(o.point_idx).max(initial=-1))
                         for o in observations.pixels]
                        + [int(np.asarray(o.point_idx).max(initial=-1))
                           for o in observations.depths])
                    npts = max(npts, 1)
                    alive_pid = np.zeros(npts, bool)
                    o2 = 0
                    for o in observations.pixels:
                        pidx = np.asarray(o.point_idx)
                        sel = new_global_mask[o2:o2 + len(o)]
                        alive_pid[pidx[sel]] = True
                        o2 += len(o)
                dpid = np.asarray(dob.point_idx)
                feat_alive = (dpid >= 0) & alive_pid[np.clip(dpid, 0, npts - 1)]
            merged = old & feat_alive
            new_depths.append(dataclasses.replace(
                dob, mask=_resharded_like(dob.mask, merged)))
    return dataclasses.replace(observations, pixels=tuple(out),
                               depths=tuple(new_depths))


# ----------------------------------------------------------------------------
# Triangulation pass
# ----------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _retriangulate_jit(models: Tuple[str, ...], tri_iters: int):
    """One compiled dispatch for the whole per-pass triangulation phase —
    eager per-op execution through the remote-compile tunnel costs ~30 ms
    PER OP, so the ~40-op phase was ~1 s of pure dispatch latency per pass
    (VERDICT r4 #3). Observations/table arrays are runtime args: mask
    updates between passes reuse the executable."""
    def f(state, observations, idx, tvalid):
        w2c = _global_w2c(state, observations)          # [N,7]
        und = _global_undist_pix(state, observations, models)  # [N,2]
        mask = _global_mask(observations)               # [N]
        focal = _global_focal(state, observations)      # [N]
        P = tri_mod.projection_matrix(focal, w2c)       # [N,3,4]
        valid = tvalid & mask[idx]
        xyz, _, ok = tri_mod.triangulate_tracks(P[idx], und[idx], valid,
                                                tri_iters)
        return xyz, ok
    return jax.jit(f)


def retriangulate(state: prob.RigState, observations: prob.Observations,
                  models: Sequence[str], table: TrackTable,
                  tri_iters: int = 3):
    """Triangulate every track from its inlier observations.

    Returns (points [P,3], track_ok [P]). Tracks with <2 inliers or a
    non-finite solve get track_ok=False — the caller must mark all their
    features as outliers (multiViewTriangulation semantics,
    interest_point.cc:688-716).
    """
    fn = _retriangulate_jit(tuple(models), tri_iters)
    return fn(state, observations,
              jnp.asarray(np.maximum(table.track_obs, 0)),
              jnp.asarray(table.track_valid))


# ----------------------------------------------------------------------------
# Outlier gates
# ----------------------------------------------------------------------------


def flag_outliers_by_exclusion_dist(observations: prob.Observations,
                                    crop_sizes: Dict[int, Tuple[int, int]],
                                    image_sizes: Dict[int, Tuple[int, int]]
                                    ) -> prob.Observations:
    """Image-border / crop-window gate (flagOutlierByExclusionDist,
    rig_calibrator.cc:1003-1039)."""
    out = []
    for obs in observations.pixels:
        size = np.asarray(image_sizes[obs.sensor], float)
        crop = np.asarray(crop_sizes[obs.sensor], float)
        pix = np.asarray(obs.pix)
        good = np.all(np.abs(pix - size / 2.0) <= crop / 2.0, axis=-1)
        out.append(dataclasses.replace(obs, mask=jnp.asarray(np.asarray(obs.mask) & good)))
    return dataclasses.replace(observations, pixels=tuple(out))


def reprojection_errors(state: prob.RigState, observations: prob.Observations,
                        models: Sequence[str], opts: prob.BAOptions) -> jnp.ndarray:
    """Raw (non-robust) per-observation reprojection error norms, global order."""
    parts = []
    for obs in observations.pixels:
        r = prob.pixel_residuals(state, obs, models[obs.sensor], opts, robust=False)
        parts.append(jnp.linalg.norm(r, axis=-1))
    return jnp.concatenate(parts)


@functools.lru_cache(maxsize=None)
def _flag_outliers_jit(models: Tuple[str, ...], opts: prob.BAOptions):
    """Both outlier gates in ONE compiled dispatch (the whole
    angle-gate + reprojection-gate arithmetic; the host only applies the
    returned mask). Thresholds are traced scalars, observations/table are
    runtime args — one executable serves every pass."""
    def f(state, observations, idx, tvalid, track_of_obs, min_angle, max_err):
        w2c = _global_w2c(state, observations)
        mask = _global_mask(observations)
        valid = tvalid & mask[idx]

        # angle gate (whole track)
        poses_t = w2c[idx]                                  # [P,V,7]
        angles = jax.vmap(tri_mod.convergence_angles)(poses_t, state.points,
                                                      valid)
        bad_track = angles < min_angle                      # [P]
        angle_kill = (bad_track[jnp.maximum(track_of_obs, 0)]
                      & (track_of_obs >= 0))
        mask_after_angle = mask & ~angle_kill

        # reprojection gate (NaNs never pass, same comparison direction)
        parts = []
        for obs in observations.pixels:
            r = prob.pixel_residuals(state, obs, models[obs.sensor], opts,
                                     robust=False)
            parts.append(jnp.linalg.norm(r, axis=-1))
        errs = jnp.concatenate(parts)
        new_mask = mask_after_angle & (errs <= max_err)
        counts = jnp.stack([jnp.sum(mask), jnp.sum(mask_after_angle),
                            jnp.sum(new_mask)])
        return new_mask, counts
    return jax.jit(f)


def flag_outliers(state: prob.RigState, observations: prob.Observations,
                  models: Sequence[str], table: TrackTable, opts: prob.BAOptions,
                  min_triangulation_angle: float, max_reprojection_error: float,
                  verbose: bool = True) -> prob.Observations:
    """Triangulation-angle gate (whole track) then reprojection gate
    (per feature), in that order (flagOutliersByTriAngleAndReprojErr,
    rig_calibrator.cc:1045-1154)."""
    n_obs = sum(len(o) for o in observations.pixels)
    track_of_obs = np.full(n_obs, -1, np.int64)
    flat_idx = table.track_obs.ravel()
    flat_pid = np.repeat(np.arange(table.num_points), table.max_views)
    sel = flat_idx >= 0
    track_of_obs[flat_idx[sel]] = flat_pid[sel]

    fn = _flag_outliers_jit(tuple(models), opts)
    new_mask, counts = fn(state, observations,
                          jnp.asarray(np.maximum(table.track_obs, 0)),
                          jnp.asarray(table.track_valid),
                          jnp.asarray(track_of_obs),
                          min_triangulation_angle, max_reprojection_error)
    new_mask = np.asarray(new_mask)
    n_before, n_after_angle, n_after = (int(c) for c in np.asarray(counts))
    n_angle = n_before - n_after_angle
    n_reproj = n_after_angle - n_after

    if verbose and n_before > 0:
        print(f"Removed {n_angle} outlier features with small angle of convergence, "
              f"out of {n_before} ({100.0 * n_angle / max(n_before,1):.4g} %)")
        print(f"Removed {n_reproj} outlier features using reprojection error, out of "
              f"{n_after_angle} "
              f"({100.0 * n_reproj / max(n_after_angle,1):.4g} %)")

    return _scatter_mask_updates(observations, new_mask)


# ----------------------------------------------------------------------------
# Residual statistics (the reference's printed regression signal)
# ----------------------------------------------------------------------------


def _stats_group_list(state, observations, models, opts, sensor_names):
    """The (name, |vals|, mask) groups of the residual report — traceable
    (used both under jit and for the host name list)."""
    groups: List[Tuple[str, jnp.ndarray, jnp.ndarray]] = []

    def add(name, vals, mask):
        groups.append((name, jnp.abs(vals).ravel(), mask.ravel()))

    for obs in observations.pixels:
        r = prob.pixel_residuals(state, obs, models[obs.sensor], opts, robust=False)
        add(f"{sensor_names[obs.sensor]}_pix_x", r[:, 0], obs.mask)
        add(f"{sensor_names[obs.sensor]}_pix_y", r[:, 1], obs.mask)
    for obs in observations.depths:
        if opts.depth_tri_weight > 0:
            r = prob.depth_tri_residuals(state, obs, opts, robust=False)
            r = r / opts.depth_tri_weight
            for i, ax in enumerate("xyz"):
                add(f"depth_tri_{ax}_m", r[:, i], obs.mask)
        if obs.mesh_xyz is not None and opts.depth_mesh_weight > 0:
            r = prob.depth_mesh_residuals(state, obs, opts, robust=False)
            r = r / opts.depth_mesh_weight
            m = obs.mask if obs.mesh_mask is None else obs.mask & obs.mesh_mask
            for i, ax in enumerate("xyz"):
                add(f"depth_mesh_{ax}_m", r[:, i], m)
    if observations.mesh_tri is not None and opts.mesh_tri_weight > 0:
        r = prob.xyz_prior_residuals(state, observations.mesh_tri,
                                     opts.mesh_tri_weight,
                                     opts.robust_threshold, robust=False)
        r = r / opts.mesh_tri_weight
        for i, ax in enumerate("xyz"):
            add(f"mesh_tri_{ax}_m", r[:, i], observations.mesh_tri.mask)
    if observations.tri_prior is not None and opts.tri_weight > 0:
        r = prob.xyz_prior_residuals(state, observations.tri_prior,
                                     opts.tri_weight,
                                     opts.tri_robust_threshold, robust=False)
        r = r / opts.tri_weight
        for i, ax in enumerate("xyz"):
            add(f"tri_{ax}_m", r[:, i], observations.tri_prior.mask)
    return groups


def _masked_quantiles(vals, mask):
    """In-graph equivalent of sort(|vals|[mask]) indexed at
    [.25n, .5n, .75n, n-1]: masked entries sort to the tail as +inf."""
    v = jnp.sort(jnp.where(mask, vals, jnp.inf))
    n = jnp.sum(mask)
    idx = jnp.stack([(0.25 * n).astype(jnp.int32), (0.50 * n).astype(jnp.int32),
                     (0.75 * n).astype(jnp.int32), jnp.maximum(n - 1, 0)])
    q = v[jnp.clip(idx, 0, v.shape[0] - 1)]
    return jnp.where(n > 0, q, jnp.nan), n


@functools.lru_cache(maxsize=None)
def _residual_stats_jit(models: Tuple[str, ...], opts: prob.BAOptions,
                        sensor_names: Tuple[str, ...]):
    """The whole residual report (every family's residuals + masked
    percentiles) as ONE compiled dispatch returning a tiny [G,4] table —
    the eager per-family version cost ~100 tunnel round-trips per call."""
    def f(state, observations):
        groups = _stats_group_list(state, observations, models, opts,
                                   sensor_names)
        merged: Dict[str, list] = {}
        for name, vals, mask in groups:
            merged.setdefault(name, []).append((vals, mask))
        names = sorted(merged)
        qs, ns = [], []
        for name in names:
            vals = jnp.concatenate([v for v, _ in merged[name]])
            mask = jnp.concatenate([m for _, m in merged[name]])
            q, n = _masked_quantiles(vals, mask)
            qs.append(q)
            ns.append(n)
        return jnp.stack(qs), jnp.stack(ns)
    return jax.jit(f)


def _stats_names(observations, models, opts, sensor_names):
    """Host-side group-name list matching _residual_stats_jit's ordering
    (derived from the same group builder, without touching array values)."""
    names = []
    for obs in observations.pixels:
        names.append(f"{sensor_names[obs.sensor]}_pix_x")
        names.append(f"{sensor_names[obs.sensor]}_pix_y")
    for obs in observations.depths:
        if opts.depth_tri_weight > 0:
            names.extend(f"depth_tri_{ax}_m" for ax in "xyz")
        if obs.mesh_xyz is not None and opts.depth_mesh_weight > 0:
            names.extend(f"depth_mesh_{ax}_m" for ax in "xyz")
    if observations.mesh_tri is not None and opts.mesh_tri_weight > 0:
        names.extend(f"mesh_tri_{ax}_m" for ax in "xyz")
    if observations.tri_prior is not None and opts.tri_weight > 0:
        names.extend(f"tri_{ax}_m" for ax in "xyz")
    return sorted(set(names))


def residual_stats(state: prob.RigState, observations: prob.Observations,
                   models: Sequence[str], opts: prob.BAOptions,
                   sensor_names: Optional[Sequence[str]] = None,
                   tag: str = "") -> Dict[str, np.ndarray]:
    """25/50/75/100th percentile |residual| per residual class, inliers only
    (calc_residuals_stats, rig_calibrator.cc:753-789). Depth/mesh residuals
    are reported divided by their weight (residual_scales convention)."""
    S = state.num_sensors
    if sensor_names is None:
        sensor_names = [f"cam{i}" for i in range(S)]
    fn = _residual_stats_jit(tuple(models), opts, tuple(sensor_names))
    qs, ns = fn(state, observations)
    qs = np.asarray(qs)
    ns = np.asarray(ns)
    names = _stats_names(observations, models, opts, sensor_names)

    stats = {name: qs[i] for i, name in enumerate(names)}
    if tag:
        print(f"The 25, 50, 75, and 100th percentile residual stats {tag}")
        for i, name in enumerate(names):
            q = qs[i]
            print(f"{name}: {q[0]:.5g} {q[1]:.5g} {q[2]:.5g} {q[3]:.5g} "
                  f"({int(ns[i])} residuals)")
    return stats


# ----------------------------------------------------------------------------
# RPC inverse refit (updateRpcUndistortion)
# ----------------------------------------------------------------------------


def refit_rpc_undistortion(state: prob.RigState, models: Sequence[str],
                           float_spec: prob.FloatSpec,
                           cam_params: Optional[Sequence],
                           num_samples: int = 100,
                           verbose: bool = False) -> prob.RigState:
    """Refit the inverse (undistort) half of every floated RPC sensor's
    coefficient vector against the optimized forward half
    (``updateRpcUndistortion`` -> ``fitRpcUndist``,
    `/root/reference/camera_model/camera_params.cc:214-254`,
    `rpc_distortion.cc:658-721`). The forward half is what BA optimizes (it
    alone enters ``distort_centered``); the inverse is a fitted approximation
    that must track it. No-op for non-RPC sensors or when ``cam_params`` is
    not provided (the caller then has no image-geometry info to sample with).
    """
    if cam_params is None:
        return state
    from multiview_tpu.geometry import rpc_fit

    new_dist = list(state.dist)
    changed = False
    for s in getattr(float_spec, "distortion", ()):
        if models[s] != "rpc":
            continue
        coeffs = np.asarray(state.dist[s])
        n = len(coeffs) // 2
        cam = cam_params[s].with_intrinsics(
            focal=jnp.stack([state.focal[s], state.focal[s]]).astype(
                cam_params[s].dtype),
            optical_offset=state.optical_center[s].astype(cam_params[s].dtype),
            dist_coeffs=jnp.asarray(coeffs, cam_params[s].dtype))
        undist = rpc_fit.fit_rpc_undist(coeffs[:n], cam,
                                        num_samples=num_samples)
        new_dist[s] = jnp.asarray(np.concatenate([coeffs[:n], undist]),
                                  state.dtype)
        changed = True
        if verbose:
            err = rpc_fit.eval_rpc_dist_undist(
                cam.with_intrinsics(dist_coeffs=jnp.asarray(
                    np.asarray(new_dist[s]), cam_params[s].dtype)),
                np.asarray(new_dist[s]), num_samples=num_samples)
            print(f"Sensor {s}: max distort_undistort error after RPC "
                  f"inverse refit: {err:.6g} pixels")
    if not changed:
        return state
    return dataclasses.replace(state, dist=tuple(new_dist))


_SCHUR_SOLVER_CACHE: Dict[tuple, object] = {}


def _tree_sig(tree):
    leaves, td = jax.tree_util.tree_flatten(tree)
    return (str(td), tuple((tuple(np.shape(l)), str(np.asarray(l).dtype)
                            if not hasattr(l, "dtype") else str(l.dtype))
                           for l in leaves))


def _cached_schur_solver(template, obs_now, models, opts, cam_mask_vec,
                         num_iterations, cg_iterations, lo_c, up_c):
    """Jitted Schur solver cached across optimize_rig CALLS by problem
    STRUCTURE (shapes/dtypes/treedefs + the baked statics: mask, bounds,
    iteration budgets). A fresh jax.jit closure per call re-traces an
    identically-shaped solver (~8 s through this environment per trace) —
    sfm-init's two BA refinement rounds paid it twice. Observations stay
    runtime args, so cached solvers see every mask update."""
    key = (models, opts, num_iterations, cg_iterations,
           None if lo_c is None else (np.asarray(lo_c).tobytes(),
                                      np.asarray(up_c).tobytes()),
           np.asarray(cam_mask_vec).tobytes(),
           _tree_sig(template), _tree_sig(obs_now))
    fn = _SCHUR_SOLVER_CACHE.get(key)
    if fn is None:
        from multiview_tpu.solver import schur as schur_mod
        fn = jax.jit(schur_mod.make_schur_solver(
            template, obs_now, models, opts, cam_mask_vec,
            max_iterations=num_iterations, cg_iterations=cg_iterations,
            lower=lo_c, upper=up_c))
        _SCHUR_SOLVER_CACHE[key] = fn
    return fn


# ----------------------------------------------------------------------------
# The multi-pass driver
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class CalibratorResult:
    state: prob.RigState
    observations: prob.Observations
    stats_before: Dict[str, np.ndarray]
    stats_after: Dict[str, np.ndarray]
    lm_results: List


def optimize_rig(
    state: prob.RigState,
    observations: prob.Observations,
    models: Sequence[str],
    float_spec: prob.FloatSpec,
    opts: prob.BAOptions = prob.BAOptions(),
    num_passes: int = 2,           # FLAGS_calibrator_num_passes
    num_iterations: int = 20,      # FLAGS_num_iterations
    min_triangulation_angle: float = 0.5,
    max_reprojection_error: float = 25.0,
    parameter_tolerance: float = 1e-12,
    timestamp_offset_bounds: Optional[np.ndarray] = None,  # [S,2] lo/hi
    sensor_names: Optional[Sequence[str]] = None,
    backend: str = "auto",   # "schur" | "dense" | "auto"
    cg_iterations: int = 60,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    mesh_tri_verts: Optional[np.ndarray] = None,  # [T,3,3] for mesh constraints
    min_ray_dist: float = 0.0,
    max_ray_dist: float = 100.0,
    cam_params: Optional[Sequence] = None,  # per-sensor CameraParams (RPC refit)
    rpc_refit_samples: int = 100,
    verbose: bool = False,
    profile: bool = False,
) -> CalibratorResult:
    """The reference's per-pass loop (rig_calibrator.cc:1550-1990).

    Points are re-triangulated at the start of each pass; the tri prior
    (when tri_weight>0) anchors to the fresh triangulation. Backend "schur"
    (default when no depth constraints yet) runs the matrix-free
    Schur-complement LM — the ITERATIVE_SCHUR analogue; "dense" runs the
    jacrev LM."""
    from multiview_tpu.solver import schur as schur_mod

    if backend == "auto":
        backend = "schur"

    table = build_track_table(observations, state.points.shape[0])
    entry_sensors = None
    if opts.no_rig and float_spec.cam_pose_sensors is not None:
        # in no-rig mode world_to_ref entries are per-image; recover each
        # entry's sensor type from the observation index arrays
        entry_sensors = np.zeros(state.world_to_ref.shape[0], np.int32)
        for ob in observations.pixels:
            entry_sensors[np.asarray(ob.beg_idx)] = ob.sensor
    mask_vec = prob.build_mask(state, float_spec, no_rig=opts.no_rig,
                               entry_sensors=entry_sensors, models=models)
    cam_mask_vec = prob.build_mask(state, float_spec, no_rig=opts.no_rig,
                                   include_points=False,
                                   entry_sensors=entry_sensors, models=models)
    schur_solver = None

    lower = upper = None
    if timestamp_offset_bounds is not None and float_spec.timestamp_offsets:
        n = prob.pack_state(state).shape[0]
        lower = np.full(n, -np.inf)
        upper = np.full(n, np.inf)
        R = state.world_to_ref.size
        Sg = state.ref_to_cam.size
        off0 = R + Sg
        S = state.num_sensors
        lower[off0:off0 + S] = timestamp_offset_bounds[:, 0]
        upper[off0:off0 + S] = timestamp_offset_bounds[:, 1]
        lower = jnp.asarray(lower)
        upper = jnp.asarray(upper)

    stats_before = None
    lm_results = []

    start_pass = 0
    if resume and checkpoint_dir is not None:
        from multiview_tpu.calib import checkpoint as ckpt_mod
        done = ckpt_mod.latest_pass(checkpoint_dir)
        if done is not None:
            state, observations, done = ckpt_mod.load_checkpoint(
                checkpoint_dir, state, observations)
            start_pass = done + 1
            if verbose:
                print(f"Resumed from checkpoint after pass {done + 1}")

    import time as _time

    def _tick(phases, name, t0):
        t1 = _time.perf_counter()
        phases[name] = phases.get(name, 0.0) + (t1 - t0)
        return t1

    for pass_i in range(start_pass, num_passes):
        if verbose:
            print(f"\nOptimization pass {pass_i + 1} / {num_passes}")
        _ph = {}
        _t = _time.perf_counter()

        # triangulate with current cameras; kill tracks that fail. Dead
        # tracks are PINNED to their previous (finite) value — a masked
        # residual row still evaluates, and 0*NaN = NaN would poison both
        # the solve and the printed stats (incremental.py pin+mask pattern)
        xyz, ok = retriangulate(state, observations, models, table)
        ok_np = np.asarray(ok) & np.isfinite(np.asarray(xyz)).all(axis=-1)
        prev_pts = np.asarray(state.points)
        prev_pts = np.where(np.isfinite(prev_pts), prev_pts, 0.0)
        xyz = jnp.asarray(np.where(ok_np[:, None], np.asarray(xyz), prev_pts),
                          state.dtype)
        ok = jnp.asarray(ok_np)
        state = dataclasses.replace(state, points=xyz)
        bad = ~ok_np
        if bad.any():
            gmask = np.asarray(_global_mask(observations)).copy()
            track_rows = table.track_obs[bad]
            rows = track_rows[track_rows >= 0]
            gmask[rows] = False
            observations = _scatter_mask_updates(observations, gmask)

        _t = _tick(_ph, "triangulate", _t)
        obs_now = observations
        if opts.tri_weight > 0.0:
            tri_prior = prob.XyzPriorObs(
                ref_xyz=xyz, point_idx=jnp.arange(xyz.shape[0]),
                mask=jnp.asarray(np.asarray(ok)))
            obs_now = dataclasses.replace(obs_now, tri_prior=tri_prior)
        want_mesh_tri = mesh_tri_verts is not None and opts.mesh_tri_weight > 0.0
        want_depth_mesh = (mesh_tri_verts is not None
                           and opts.depth_mesh_weight > 0.0
                           and len(observations.depths) > 0
                           and all(d.pix_row is not None
                                   for d in observations.depths))
        if want_mesh_tri or want_depth_mesh:
            # per-pass ray/mesh intersections (meshTriangulations role)
            from multiview_tpu.calib import mesh_constraints
            obs_xyz, track_xyz = mesh_constraints.mesh_intersections(
                state, observations, models, mesh_tri_verts,
                min_ray_dist=min_ray_dist, max_ray_dist=max_ray_dist)
            if want_mesh_tri:
                valid = np.isfinite(track_xyz).all(axis=-1)
                mesh_prior = prob.XyzPriorObs(
                    ref_xyz=jnp.asarray(np.where(valid[:, None], track_xyz, 0.0),
                                        state.dtype),
                    point_idx=jnp.arange(state.points.shape[0]),
                    mask=jnp.asarray(valid))
                obs_now = dataclasses.replace(obs_now, mesh_tri=mesh_prior)
            if want_depth_mesh:
                # BracketedDepthMeshError: the pixel ray's mesh hit vs. the
                # depth measurement (rig_calibrator.cc:1797-1843)
                new_depths = []
                for dob in obs_now.depths:
                    hit_xyz = obs_xyz[np.asarray(dob.pix_row)]
                    hit = np.isfinite(hit_xyz).all(axis=-1)
                    new_depths.append(dataclasses.replace(
                        dob,
                        mesh_xyz=jnp.asarray(np.where(hit[:, None], hit_xyz, 0.0),
                                             state.dtype),
                        mesh_mask=jnp.asarray(hit)))
                obs_now = dataclasses.replace(obs_now, depths=tuple(new_depths))

        _t = _tick(_ph, "mesh_intersections", _t)
        template = state

        # evalResiduals before/after each pass (rig_calibrator.cc:1905,1969)
        if pass_i == 0:
            stats_before = residual_stats(state, obs_now, models, opts, sensor_names,
                                          tag="before opt" if verbose else "")
        elif verbose:
            residual_stats(state, obs_now, models, opts, sensor_names,
                           tag=f"before opt (pass {pass_i + 1})")

        _t = _tick(_ph, "residual_stats", _t)
        if backend == "schur":
            if schur_solver is None:
                lo_c = up_c = None
                if lower is not None:
                    nc = prob.pack_state(state, include_points=False).shape[0]
                    lo_c, up_c = lower[:nc], upper[:nc]
                schur_solver = _cached_schur_solver(
                    template, obs_now, tuple(models), opts, cam_mask_vec,
                    num_iterations, cg_iterations, lo_c, up_c)
            res = schur_solver(prob.pack_state(state, include_points=False),
                               state.points, obs_now)
            lm_results.append(res)
            state = dataclasses.replace(
                prob.unpack_state(res.cam, template, include_points=False),
                points=res.points)
        else:
            def residual_fn(vec):
                st = prob.unpack_state(vec, template)
                return prob.all_residuals(st, obs_now, models, opts)

            res = levenberg_marquardt(
                residual_fn, prob.pack_state(state),
                max_iterations=num_iterations,
                parameter_tolerance=parameter_tolerance,
                mask=jnp.asarray(mask_vec), lower=lower, upper=upper)
            lm_results.append(res)
            state = prob.unpack_state(res.x, template)

        _t = _tick(_ph, "solve", _t)
        # refit the RPC inverse for sensors whose distortion floated
        # (updateRpcUndistortion, rig_calibrator.cc:1944-1948): the undistort
        # half has zero gradient in BA, so it must be re-derived from the
        # optimized forward half or the next retriangulation (and the written
        # config) would use a stale inverse
        state = refit_rpc_undistortion(state, models, float_spec, cam_params,
                                       num_samples=rpc_refit_samples,
                                       verbose=verbose)

        if verbose and pass_i < num_passes - 1:
            residual_stats(state, obs_now, models, opts, sensor_names,
                           tag=f"after opt (pass {pass_i + 1})")

        _t = _tick(_ph, "rpc_refit+stats", _t)
        observations = flag_outliers(
            state, observations, models, table, opts,
            min_triangulation_angle, max_reprojection_error, verbose=verbose)
        _t = _tick(_ph, "flag_outliers", _t)
        if profile:
            total = sum(_ph.values())
            print(f"[profile] pass {pass_i + 1}: "
                  + " ".join(f"{k}={v:.2f}s" for k, v in _ph.items())
                  + f" total={total:.2f}s")

        if checkpoint_dir is not None:
            from multiview_tpu.calib import checkpoint as ckpt_mod
            ckpt_mod.save_checkpoint(checkpoint_dir, state, observations, pass_i)

    obs_final = observations
    if num_passes > start_pass:
        # include the last pass's prior/mesh families in the final stats
        # (fresh masks from flag_outliers + the pass's mesh intersections)
        depths_final = tuple(
            dataclasses.replace(d, mesh_xyz=dn.mesh_xyz, mesh_mask=dn.mesh_mask)
            for d, dn in zip(observations.depths, obs_now.depths))
        obs_final = dataclasses.replace(
            observations, depths=depths_final,
            mesh_tri=obs_now.mesh_tri, tri_prior=obs_now.tri_prior)
    stats_after = residual_stats(state, obs_final, models, opts, sensor_names,
                                 tag="after opt" if verbose else "")
    return CalibratorResult(state, observations, stats_before, stats_after, lm_results)
