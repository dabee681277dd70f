"""Registration of the SfM solution to user-measured control points.

The role of ``registrationTransform``
(`/root/reference/rig_calibrator/src/interest_point.cc:1041-1245`): control
points are picked in image pairs (Hugin .pto) with known world coordinates
(xyz file); each is triangulated from the current cameras, a similarity
(Kabsch + scale) maps the triangulated set onto the measured set, and the
transform is applied to camera poses, structure points, and the rig
translations. The printed mean absolute error vs the control points is the
reference's registration quality metric.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.geometry import triangulation as tri_mod
from multiview_tpu.geometry import registration as reg_mod
from multiview_tpu.geometry.camera import CameraParams, DISTORTED, UNDISTORTED_C
from multiview_tpu.calib import problem as prob
from multiview_tpu.io import depth_io


def triangulate_control_points(control_images: List[str], control_rows: np.ndarray,
                               image_names: List[str], world_to_cam: np.ndarray,
                               cams_of_image: Sequence[int],
                               cam_params: Sequence[CameraParams]) -> np.ndarray:
    """Triangulate each Hugin control point from its two views."""
    name_to_cid = {}
    for cid, n in enumerate(image_names):
        name_to_cid[n] = cid
        # hugin projects often store basenames
        name_to_cid.setdefault(n.split("/")[-1], cid)

    out = []
    for row in control_rows:
        li, ri = int(row[0]), int(row[1])
        try:
            cidl = name_to_cid[control_images[li]]
            cidr = name_to_cid[control_images[ri]]
        except KeyError as e:
            raise ValueError(f"Control-point image not in the solution: {e}")
        pl = np.asarray(row[2:4], float)
        pr = np.asarray(row[4:6], float)
        cl = cam_params[cams_of_image[cidl]]
        cr = cam_params[cams_of_image[cidr]]
        ul = np.asarray(cl.convert(jnp.asarray(pl), DISTORTED, UNDISTORTED_C))
        ur = np.asarray(cr.convert(jnp.asarray(pr), DISTORTED, UNDISTORTED_C))
        xyz = tri_mod.triangulate_pair(
            float(cl.mean_focal), float(cr.mean_focal),
            jnp.asarray(world_to_cam[cidl]), jnp.asarray(world_to_cam[cidr]),
            jnp.asarray(ul), jnp.asarray(ur))
        out.append(np.asarray(xyz))
    return np.stack(out)


def register_state(state: prob.RigState, triangulated: np.ndarray,
                   measured: np.ndarray, verbose: bool = True
                   ) -> Tuple[prob.RigState, float, float]:
    """Similarity-align the solution to measured control points and apply to
    world_to_ref poses, points, and rig translations. Returns
    (new_state, scale, mean_abs_err_meters)."""
    scale, T = reg_mod.find_similarity_transform(jnp.asarray(triangulated),
                                                 jnp.asarray(measured))
    mapped = np.asarray(reg_mod.apply_similarity(scale, T, jnp.asarray(triangulated)))
    err = float(np.mean(np.linalg.norm(mapped - measured, axis=-1)))
    if verbose:
        print(f"Registration mean absolute error: {err:.6g} meters")

    new_poses = reg_mod.transform_cameras(scale, T, state.world_to_ref)
    new_points = reg_mod.transform_points(scale, T, state.points)
    new_rig = reg_mod.transform_rig(scale, state.ref_to_cam)
    new_state = dataclasses.replace(state, world_to_ref=new_poses,
                                    points=new_points, ref_to_cam=new_rig)
    return new_state, float(scale), err


def register_from_files(state: prob.RigState, hugin_file, xyz_file,
                        image_names: List[str], world_to_cam: np.ndarray,
                        cams_of_image: Sequence[int],
                        cam_params: Sequence[CameraParams],
                        verbose: bool = True):
    """File-level entry matching the reference flags --hugin_file/--xyz_file
    (rig_calibrator.cc:242-251)."""
    control_images, rows = depth_io.parse_hugin_control_points(hugin_file)
    measured = depth_io.parse_xyz(xyz_file)
    if len(measured) != len(rows):
        raise ValueError("Must have as many control points as measured xyz rows.")
    triangulated = triangulate_control_points(
        control_images, rows, image_names, world_to_cam, cams_of_image, cam_params)
    return register_state(state, triangulated, measured, verbose=verbose)
