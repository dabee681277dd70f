"""Synthetic calibration scenes with known ground truth.

The test strategy replacement for the reference's absent test suite
(SURVEY.md section 4): cube scenes with known rigs and distortions drive
unit/integration tests and benchmarks.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.calib import problem as prob


def look_at_pose(cam_pos: np.ndarray, target: np.ndarray, up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """world->cam pose (7,) with +z toward target."""
    cam_pos = np.asarray(cam_pos, float)
    z = np.asarray(target, float) - cam_pos
    z = z / np.linalg.norm(z)
    up = np.asarray(up, float)
    if abs(np.dot(up, z)) > 0.98:
        up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R_w2c = np.stack([x, y, z], axis=1).T
    t = -R_w2c @ cam_pos
    return np.asarray(pose_mod.make_pose(jnp.asarray(t), pose_mod.matrix_to_quat(jnp.asarray(R_w2c))))


def cube_points(n_per_face: int = 4, half: float = 0.5, seed: int = 0) -> np.ndarray:
    """Points jittered on the faces of a cube centered at origin."""
    rng = np.random.default_rng(seed)
    pts = []
    for axis in range(3):
        for sign in (-1.0, 1.0):
            uv = rng.uniform(-half, half, size=(n_per_face * n_per_face, 2))
            face = np.zeros((len(uv), 3))
            other = [a for a in range(3) if a != axis]
            face[:, other[0]] = uv[:, 0]
            face[:, other[1]] = uv[:, 1]
            face[:, axis] = sign * half
            pts.append(face)
    return np.concatenate(pts)


def ring_poses(n: int, radius: float = 3.0, height: float = 1.0,
               target=(0.0, 0.0, 0.0)) -> np.ndarray:
    """n world->cam poses on a ring looking at the target."""
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        pos = np.array([radius * np.cos(a), radius * np.sin(a), height])
        poses.append(look_at_pose(pos, np.asarray(target)))
    return np.stack(poses)


@dataclasses.dataclass
class CubeScene:
    """A single-sensor no-rig BA scene (BASELINE config 1)."""

    true_state: prob.RigState
    observations: prob.Observations
    models: Tuple[str, ...]
    image_size: Tuple[int, int]
    n_images: int
    n_points: int


def make_cube_scene(
    n_images: int = 10,
    n_per_face: int = 4,
    image_size: Tuple[int, int] = (1280, 960),
    focal: float = 600.0,
    dist_coeffs: Sequence[float] = (),
    pix_noise: float = 0.0,
    seed: int = 0,
    dtype=jnp.float64,
) -> CubeScene:
    """Generate a cube scene with all points observed in all images
    (fixed matches, the reference's config-1 equivalent)."""
    rng = np.random.default_rng(seed)
    pts = cube_points(n_per_face, seed=seed)
    P = len(pts)
    w2c = ring_poses(n_images)

    model = dist_mod_name(len(dist_coeffs))
    state = prob.RigState(
        world_to_ref=jnp.asarray(w2c, dtype),
        ref_to_cam=jnp.asarray(np.tile([0, 0, 0, 0, 0, 0, 1.0], (1, 1)), dtype),
        timestamp_offsets=jnp.zeros(1, dtype),
        focal=jnp.asarray([focal], dtype),
        optical_center=jnp.asarray([[image_size[0] / 2.0, image_size[1] / 2.0]], dtype),
        dist=(jnp.asarray(np.asarray(dist_coeffs, float), dtype),),
        depth_to_image=jnp.asarray(np.tile([0, 0, 0, 0, 0, 0, 1.0], (1, 1)), dtype),
        depth_scale=jnp.ones(1, dtype),
        points=jnp.asarray(pts, dtype),
    )

    # visibility: keep points in front of the camera and inside the image
    beg_idx, point_idx, pix_list = [], [], []
    opts = prob.BAOptions()
    half = np.asarray(image_size, float) / 2.0
    for cid in range(n_images):
        obs_tmp = prob.PixelObs(
            pix=jnp.zeros((P, 2), dtype),
            beg_idx=jnp.full(P, cid, jnp.int32),
            end_idx=jnp.full(P, cid, jnp.int32),
            point_idx=jnp.arange(P, dtype=jnp.int32),
            dt_cam=jnp.zeros(P, dtype),
            dt_bracket=jnp.zeros(P, dtype),
            mask=jnp.ones(P, bool),
            dist_half_size=jnp.asarray(half, dtype),
            sensor=0)
        res = prob.pixel_residuals(state, obs_tmp, model, opts, robust=False)
        pred = np.asarray(res) + np.zeros((P, 2))  # residual vs 0 = predicted pix
        Xc = np.asarray(pose_mod.pose_apply(state.world_to_ref[cid], state.points))
        vis = (Xc[:, 2] > 0.2) & np.all((pred >= 0) & (pred < image_size), axis=-1)
        ids = np.nonzero(vis)[0]
        beg_idx.append(np.full(len(ids), cid))
        point_idx.append(ids)
        pix_list.append(pred[ids] + pix_noise * rng.normal(size=(len(ids), 2)))

    beg = np.concatenate(beg_idx).astype(np.int32)
    pid = np.concatenate(point_idx).astype(np.int32)
    pix = np.concatenate(pix_list)

    obs = prob.PixelObs(
        pix=jnp.asarray(pix, dtype),
        beg_idx=jnp.asarray(beg),
        end_idx=jnp.asarray(beg),
        point_idx=jnp.asarray(pid),
        dt_cam=jnp.zeros(len(beg), dtype),
        dt_bracket=jnp.zeros(len(beg), dtype),
        mask=jnp.ones(len(beg), bool),
        dist_half_size=jnp.asarray(half, dtype),
        sensor=0)

    return CubeScene(
        true_state=state,
        observations=prob.Observations(pixels=(obs,)),
        models=(model,),
        image_size=image_size,
        n_images=n_images,
        n_points=P)


def dist_mod_name(n: int) -> str:
    from multiview_tpu.geometry.distortion import model_from_num_coeffs
    return model_from_num_coeffs(n)


def perturb_state(state: prob.RigState, pose_rot: float = 0.01, pose_trans: float = 0.02,
                  point_sigma: float = 0.02, seed: int = 1) -> prob.RigState:
    """Random perturbation of poses and points (the optimizer's starting point)."""
    rng = np.random.default_rng(seed)
    n = state.world_to_ref.shape[0]
    dq = pose_mod.quat_exp(jnp.asarray(rng.normal(size=(n, 3)) * pose_rot, state.dtype))
    dt = jnp.asarray(rng.normal(size=(n, 3)) * pose_trans, state.dtype)
    deltas = pose_mod.make_pose(dt, dq)
    new_poses = pose_mod.pose_compose(deltas, state.world_to_ref)
    new_points = state.points + jnp.asarray(
        rng.normal(size=state.points.shape) * point_sigma, state.dtype)
    return dataclasses.replace(state, world_to_ref=new_poses, points=new_points)
