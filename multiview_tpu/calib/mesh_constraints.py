"""Mesh-based BA constraints: per-observation ray/mesh intersections.

The role of ``meshTriangulations``
(`/root/reference/rig_calibrator/src/texture_processing.cc:1566-1625`): for
every inlier pixel observation, cast the camera ray against the input mesh;
per-track, average the per-view intersections into the mesh anchor point for
the XYZ mesh prior (mesh_tri), and keep per-observation points for the
depth-vs-mesh constraint. One batched ray-cast over all observations instead
of per-ray BVH walks.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.geometry import distortion as dist_mod
from multiview_tpu.calib import problem as prob
from multiview_tpu.calib import calibrator as cal
from multiview_tpu.texture import raycast


def mesh_intersections(state: prob.RigState, observations: prob.Observations,
                       models: Sequence[str], tri_verts: np.ndarray,
                       min_ray_dist: float = 0.0, max_ray_dist: float = 100.0
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-observation mesh hits + per-track averages.

    Returns (obs_mesh_xyz [N,3] with NaN where missed, track_mesh_xyz [P,3]
    averaged over hitting inlier views with NaN where none — the reference's
    bad_xyz sentinel becomes NaN).
    """
    w2c = cal._global_w2c(state, observations)          # [N,7]
    und = cal._global_undist_pix(state, observations, models)
    mask = np.asarray(cal._global_mask(observations))

    # rays: origin = camera center, direction = R^T [u/f, v/f, 1]
    c2w = pose_mod.pose_inverse(w2c)
    origins = pose_mod.pose_t(c2w)
    focal = cal._global_focal(state, observations)
    d_cam = jnp.concatenate([und / focal[:, None],
                             jnp.ones((und.shape[0], 1), und.dtype)], axis=-1)
    dirs = pose_mod.quat_rotate(pose_mod.pose_q(c2w), d_cam)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    t, tri_idx, hit = raycast.ray_mesh_intersect(
        origins, dirs, jnp.asarray(tri_verts, und.dtype),
        min_dist=min_ray_dist, max_dist=max_ray_dist)
    pts = np.asarray(origins + t[:, None] * dirs)
    hit = np.asarray(hit) & mask
    obs_xyz = np.where(hit[:, None], pts, np.nan)

    # per-track average over hits
    P_n = state.points.shape[0]
    pid = np.concatenate([np.asarray(o.point_idx) for o in observations.pixels])
    sums = np.zeros((P_n, 3))
    counts = np.zeros(P_n)
    np.add.at(sums, pid[hit], pts[hit])
    np.add.at(counts, pid[hit], 1.0)
    with np.errstate(invalid="ignore"):
        track_xyz = sums / counts[:, None]
    return obs_xyz, track_xyz


def build_mesh_prior(state: prob.RigState, observations: prob.Observations,
                     models: Sequence[str], tri_verts: np.ndarray,
                     min_ray_dist: float = 0.0, max_ray_dist: float = 100.0
                     ) -> prob.XyzPriorObs:
    """XyzPriorObs for the mesh-tri constraint (XYZError with
    FLAGS_mesh_tri_weight, rig_calibrator.cc:1865-1883)."""
    _, track_xyz = mesh_intersections(state, observations, models, tri_verts,
                                      min_ray_dist, max_ray_dist)
    valid = np.isfinite(track_xyz).all(axis=-1)
    safe = np.where(valid[:, None], track_xyz, 0.0)
    return prob.XyzPriorObs(
        ref_xyz=jnp.asarray(safe, state.dtype),
        point_idx=jnp.arange(state.points.shape[0]),
        mask=jnp.asarray(valid))
