"""Problem assembly: rig config + bracketed camera entries + tracks ->
RigState + Observations.

This is the glue the reference driver does inline (rig_calibrator.cc main,
:1269-1550): ref timestamps/poses from the bracketed entries, rig transforms
and intrinsics from the rig config, track rows bucketed per sensor into
padded observation tensors with pre-differenced timestamps.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.io import rig_config as rc
from multiview_tpu.calib import problem as prob
from multiview_tpu.calib.bracketing import CameraEntry
from multiview_tpu.sfm.tracks import TrackSet
from multiview_tpu.tools.common import cam_params_from_sensor


def affine_to_pose(M: np.ndarray) -> np.ndarray:
    return np.asarray(pose_mod.matrix_to_pose(jnp.asarray(M)))


def build_state(rig: rc.RigConfig, cams: Sequence[CameraEntry],
                world_to_cam: np.ndarray, ref_timestamps: np.ndarray,
                world_to_ref: np.ndarray, num_points: int,
                no_rig: bool = False, affine_depth: bool = False,
                dtype=jnp.float64) -> prob.RigState:
    """RigState from config + poses. In no-rig mode world_to_ref holds one
    pose per entry (=world_to_cam). The depth-to-image scale is always
    separated as det^(1/3) (rig_calibrator.cc:1447-1457), in both the rigid
    and the affine (--affine_depth_to_image) parametrization."""
    S = len(rig.sensors)
    rig_poses = np.stack([affine_to_pose(s.ref_to_sensor) for s in rig.sensors])
    if affine_depth:
        d2i = np.stack([
            np.concatenate([_unit_scale(s.depth_to_image)[0][:3, :3].reshape(9),
                            np.asarray(s.depth_to_image, float)[:3, 3]])
            for s in rig.sensors])
    else:
        d2i = np.stack([affine_to_pose(_unit_scale(s.depth_to_image)[0])
                        for s in rig.sensors])
    d2i_scale = np.asarray([_unit_scale(s.depth_to_image)[1] for s in rig.sensors])
    return prob.RigState(
        world_to_ref=jnp.asarray(world_to_cam if no_rig else world_to_ref, dtype),
        ref_to_cam=jnp.asarray(rig_poses, dtype),
        timestamp_offsets=jnp.asarray([s.timestamp_offset for s in rig.sensors], dtype),
        focal=jnp.asarray([s.focal_length for s in rig.sensors], dtype),
        optical_center=jnp.asarray(np.stack([s.optical_center for s in rig.sensors]),
                                   dtype),
        dist=tuple(jnp.asarray(s.distortion, dtype) for s in rig.sensors),
        depth_to_image=jnp.asarray(d2i, dtype),
        depth_scale=jnp.asarray(d2i_scale, dtype),
        points=jnp.zeros((num_points, 3), dtype),
    )


def _unit_scale(M: np.ndarray) -> Tuple[np.ndarray, float]:
    """Split an affine with uniform scale into (rigid 4x4, scale)."""
    M = np.asarray(M, float)
    scale = np.linalg.det(M[:3, :3]) ** (1.0 / 3.0)
    out = M.copy()
    if scale > 0:
        out[:3, :3] = M[:3, :3] / scale
    else:
        scale = 1.0
    return out, float(scale)


def build_observations(rig: rc.RigConfig, cams: Sequence[CameraEntry],
                       ref_timestamps: np.ndarray, trackset: TrackSet,
                       no_rig: bool = False, dtype=jnp.float64
                       ) -> Tuple[prob.Observations, int]:
    """Tracks -> per-sensor PixelObs with bracketing indices and
    pre-differenced timestamps. Returns (observations, num_points)."""
    S = len(rig.sensors)
    rows: Dict[int, Dict[str, list]] = {
        s: dict(pix=[], beg=[], end=[], pid=[], dtc=[], dtb=[]) for s in range(S)}

    for pid, track in enumerate(trackset.tracks):
        for cid, fid in track.items():
            cam = cams[cid]
            s = cam.camera_type
            if no_rig:
                beg = end = cid
                dtc = dtb = 0.0
            else:
                beg, end = cam.beg_ref_index, cam.end_ref_index
                dtc = cam.timestamp - ref_timestamps[beg]
                dtb = ref_timestamps[end] - ref_timestamps[beg]
            r = rows[s]
            r["pix"].append(trackset.keypoints[cid][fid])
            r["beg"].append(beg)
            r["end"].append(end)
            r["pid"].append(pid)
            r["dtc"].append(dtc)
            r["dtb"].append(dtb)

    pixel_obs = []
    for s in range(S):
        r = rows[s]
        if not r["pix"]:
            continue
        half = np.asarray(rig.sensors[s].image_size, float) / 2.0
        pixel_obs.append(prob.PixelObs(
            pix=jnp.asarray(np.stack(r["pix"]), dtype),
            beg_idx=jnp.asarray(np.asarray(r["beg"], np.int32)),
            end_idx=jnp.asarray(np.asarray(r["end"], np.int32)),
            point_idx=jnp.asarray(np.asarray(r["pid"], np.int32)),
            dt_cam=jnp.asarray(np.asarray(r["dtc"]), dtype),
            dt_bracket=jnp.asarray(np.asarray(r["dtb"]), dtype),
            mask=jnp.ones(len(r["pix"]), bool),
            dist_half_size=jnp.asarray(half, dtype),
            sensor=s))
    return prob.Observations(pixels=tuple(pixel_obs)), len(trackset.tracks)


def build_depth_observations(rig: rc.RigConfig, cams: Sequence[CameraEntry],
                             ref_timestamps: np.ndarray, trackset: TrackSet,
                             no_rig: bool = False, dtype=jnp.float64
                             ) -> Tuple[prob.DepthObs, ...]:
    """Attach depth measurements to track observations: for every track
    feature whose entry has a depth cloud, look up the cloud at the feature
    pixel (depthValue role, dense_map_utils.cc:1364-1391) and emit a
    BracketedDepthError row."""
    from multiview_tpu.utils.images import depth_value

    S = len(rig.sensors)
    rows = {s: dict(xyz=[], beg=[], end=[], pid=[], dtc=[], dtb=[], prow=[])
            for s in range(S)}
    # pixel-row counters replicate build_observations' per-sensor ordering so
    # each depth row knows its pixel observation (for mesh-intersection lookup)
    pix_counters = [0] * S
    for pid, track in enumerate(trackset.tracks):
        for cid, fid in track.items():
            cam = cams[cid]
            s = cam.camera_type
            my_pix_row = pix_counters[s]
            pix_counters[s] += 1
            if cam.depth_cloud is None:
                continue
            xyz = depth_value(np.asarray(cam.depth_cloud),
                              trackset.keypoints[cid][fid])
            if xyz is None:
                continue
            if no_rig:
                beg = end = cid
                dtc = dtb = 0.0
            else:
                beg, end = cam.beg_ref_index, cam.end_ref_index
                dtc = cam.timestamp - ref_timestamps[beg]
                dtb = ref_timestamps[end] - ref_timestamps[beg]
            r = rows[s]
            r["xyz"].append(xyz)
            r["beg"].append(beg)
            r["end"].append(end)
            r["pid"].append(pid)
            r["dtc"].append(dtc)
            r["dtb"].append(dtb)
            r["prow"].append(my_pix_row)

    # per-sensor pixel-row -> global row offsets (pixel obs only exist for
    # sensors with pixels; same skip rule as build_observations)
    offsets = {}
    acc = 0
    for s in range(S):
        if pix_counters[s] > 0:
            offsets[s] = acc
            acc += pix_counters[s]

    out = []
    for s in range(S):
        r = rows[s]
        if not r["xyz"]:
            continue
        n = len(r["xyz"])
        out.append(prob.DepthObs(
            depth_xyz=jnp.asarray(np.stack(r["xyz"]), dtype),
            beg_idx=jnp.asarray(np.asarray(r["beg"], np.int32)),
            end_idx=jnp.asarray(np.asarray(r["end"], np.int32)),
            point_idx=jnp.asarray(np.asarray(r["pid"], np.int32)),
            dt_cam=jnp.asarray(np.asarray(r["dtc"]), dtype),
            dt_bracket=jnp.asarray(np.asarray(r["dtb"]), dtype),
            mask=jnp.ones(n, bool),
            mesh_xyz=None,
            pix_row=jnp.asarray(np.asarray(r["prow"], np.int32) + offsets[s]),
            sensor=s))
    return tuple(out)


def ref_data_from_entries(cams: Sequence[CameraEntry], world_to_cam: np.ndarray
                          ) -> Tuple[np.ndarray, np.ndarray, Dict[int, int]]:
    """(ref_timestamps, world_to_ref [R,7], entry->ref-index map) from the
    reference-sensor entries. world_to_cam: [N,7] per entry."""
    ref_rows = [i for i, c in enumerate(cams) if c.camera_type == 0]
    # order by beg_ref_index (== the index into the original ref stream)
    ref_rows.sort(key=lambda i: cams[i].beg_ref_index)
    ref_ts = np.asarray([cams[i].timestamp for i in ref_rows])
    # the entries' beg_ref_index addresses the ref *stream*; build the dense
    # world_to_ref in that indexing
    n_ref = max(c.end_ref_index for c in cams) + 1
    world_to_ref = np.tile(np.asarray([0, 0, 0, 0, 0, 0, 1.0]), (n_ref, 1))
    ref_stamps = np.zeros(n_ref)
    for i in ref_rows:
        idx = cams[i].beg_ref_index
        world_to_ref[idx] = world_to_cam[i]
        ref_stamps[idx] = cams[i].timestamp
    return ref_stamps, world_to_ref, {i: cams[i].beg_ref_index for i in ref_rows}
