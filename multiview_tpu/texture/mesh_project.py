"""Per-camera mesh forward projection — the calibrator's in-process texturing
path (``--out_texture_dir``).

Re-design of ``projectTexture`` (UV variant), ``meshProject`` and
``meshProjectCameras`` (`/root/reference/rig_calibrator/src/texture_processing.cc`
:991-1163, :1483-1561): for every camera, each mesh face facing the camera
within 75 degrees gets per-vertex UV coordinates into that camera's own
(distorted) image, provided all three vertices survive an occlusion ray test
and project inside the undistorted domain and the distorted crop window. The
output is one OBJ/MTL pair per camera whose texture is the camera image
itself, named ``<timestamp>_<sensor>`` exactly like the reference
(:1550-1556, ``%10.7f_%s``).

TPU mapping: the reference's OpenMP face loop with three sequential BVH rays
per face becomes two batched kernels — one occlusion ray cast over all
vertices at once and one vmapped projection of all vertices through the full
distortion model; the per-face gates reduce over the gathered per-vertex
results.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.geometry.camera import CameraParams, UNDISTORTED_C, DISTORTED
from multiview_tpu.texture import raycast


def project_texture_uv(vertices, faces, cam: CameraParams, world_to_cam,
                       image_shape: Tuple[int, int],
                       tri_soup: Optional[jnp.ndarray] = None,
                       max_angle_deg: float = 75.0):
    """Per-vertex UVs + per-face visibility for one camera (projectTexture UV
    variant, texture_processing.cc:991-1163).

    vertices [Nv,3], faces [F,3]; world_to_cam is a 7-vector pose;
    image_shape is (rows, cols) of the raw image (must be an integer multiple
    of the calibrated size, :1007-1021 — UVs are normalized by the
    *calibrated* dimensions). Returns (face_ok [F] bool, uv [Nv,2] float,
    cost [F] float).
    """
    verts = jnp.asarray(vertices)
    faces_j = jnp.asarray(faces)
    w2c = jnp.asarray(world_to_cam)

    calib_cols, calib_rows = cam.distorted_size
    raw_rows, raw_cols = int(image_shape[0]), int(image_shape[1])
    factor = raw_cols // max(calib_cols, 1)
    if (raw_cols != calib_cols * factor) or (raw_rows != calib_rows * factor):
        raise ValueError(
            f"Image size {raw_cols}x{raw_rows} must be an integer multiple of "
            f"the calibrated size {calib_cols}x{calib_rows} "
            "(texture_processing.cc:1014-1021)")
    if tri_soup is None:
        tri_soup = verts[faces_j]
    return _project_uv_jit(verts, faces_j, cam, w2c, tri_soup, max_angle_deg)


@functools.partial(jax.jit, static_argnames=("max_angle_deg",))
def _project_uv_jit(verts, faces_j, cam: CameraParams, w2c, tri_soup,
                    max_angle_deg: float):
    """The compiled body of project_texture_uv (one executable per mesh/cam
    shape, reused across all cameras of a sensor)."""
    calib_cols, calib_rows = cam.distorted_size
    c2w = pose_mod.pose_inverse(w2c)
    cam_ctr = pose_mod.pose_t(c2w)

    # ---- per-face geometry gates (:1038-1065) ----
    tri = verts[faces_j]
    ctr = jnp.mean(tri, axis=1)
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
    to_cam = cam_ctr[None, :] - ctr
    dist = jnp.linalg.norm(to_cam, axis=-1)
    cosang = jnp.sum(to_cam / jnp.maximum(dist[:, None], 1e-30) * n, axis=-1)
    facing = cosang > 0.0
    ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    angle_ok = ang <= jnp.deg2rad(max_angle_deg)
    cost = ang + dist                                   # :1063-1064

    # ---- per-vertex tests, each batched over the whole mesh ----
    # occlusion: ray vertex -> camera center must not hit the mesh first
    # (tmin = 1e-4 * ray length, tmax = ray length; :1077-1087)
    vdirs = cam_ctr[None, :] - verts
    vdist = jnp.linalg.norm(vdirs, axis=-1)
    vdirs = vdirs / jnp.maximum(vdist[:, None], 1e-30)
    # per-ray tmin excludes the vertex's own incident faces (self-hits at
    # t ~ 0 would otherwise mask the real occluder, since the intersect
    # returns the nearest hit)
    t, _, hit = raycast.ray_mesh_intersect(verts, vdirs, tri_soup,
                                           min_dist=(1e-4 * vdist)[:, None])
    occluded = hit & (t < vdist)

    # projection chain (:1095-1137)
    Xc = pose_mod.pose_apply(w2c, verts)
    z_ok = Xc[:, 2] > 0.0
    safe = jnp.where(z_ok[:, None], Xc, jnp.asarray([0.0, 0.0, 1.0], Xc.dtype))
    undist_c = cam.focal * (safe[:, :2] / safe[:, 2:3])
    in_undist = jnp.all(jnp.abs(undist_c) <= cam.undistorted_half_size, axis=-1)
    dist_pix = cam.convert(undist_c, UNDISTORTED_C, DISTORTED)
    half = jnp.asarray(cam.distorted_size, dist_pix.dtype) / 2.0
    crop_half = jnp.asarray(cam.distorted_crop_size, dist_pix.dtype) / 2.0
    in_crop = jnp.all(jnp.abs(dist_pix - half) <= crop_half, axis=-1)

    vert_ok = z_ok & in_undist & in_crop & ~occluded
    uv = jnp.stack([dist_pix[:, 0] / calib_cols,
                    1.0 - dist_pix[:, 1] / calib_rows], axis=-1)  # :1139-1143

    face_ok = facing & angle_ok & jnp.all(vert_ok[faces_j], axis=-1)
    return face_ok, uv, jnp.where(face_ok, cost, jnp.inf)


def write_obj_custom_uv(out_prefix, vertices: np.ndarray, faces: np.ndarray,
                        face_ok: np.ndarray, uv: np.ndarray,
                        image: np.ndarray) -> Path:
    """OBJ with per-vertex UVs + MTL + the camera image as texture
    (formObjCustomUV/formMtl + meshProject's imwrite,
    texture_processing.cc:897-943, :1517-1527)."""
    out_prefix = Path(out_prefix)
    out_prefix.parent.mkdir(parents=True, exist_ok=True)
    # append (don't with_suffix: the %10.7f timestamp contains a '.')
    obj_path = Path(str(out_prefix) + ".obj")
    mtl_path = Path(str(out_prefix) + ".mtl")
    png_path = Path(str(out_prefix) + ".png")

    from PIL import Image
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(img).save(png_path)

    with open(mtl_path, "w") as m:
        m.write(f"newmtl textured\nmap_Kd {png_path.name}\n")
    sel = np.nonzero(np.asarray(face_ok))[0]
    uv = np.asarray(uv)
    with open(obj_path, "w") as o:
        o.write(f"mtllib {mtl_path.name}\nusemtl textured\n")
        for v in np.asarray(vertices):
            o.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in uv:
            o.write(f"vt {t[0]} {t[1]}\n")
        for f in sel:
            a, b, c = (int(i) + 1 for i in faces[f])
            o.write(f"f {a}/{a} {b}/{b} {c}/{c}\n")
    return obj_path


def mesh_project(vertices, faces, cam: CameraParams, world_to_cam,
                 image: np.ndarray, out_prefix,
                 tri_soup: Optional[jnp.ndarray] = None) -> Path:
    """One camera: project + write OBJ/MTL/texture (meshProject,
    texture_processing.cc:1483-1528)."""
    face_ok, uv, _ = project_texture_uv(vertices, faces, cam, world_to_cam,
                                        np.asarray(image).shape[:2], tri_soup)
    return write_obj_custom_uv(out_prefix, np.asarray(vertices),
                               np.asarray(faces), np.asarray(face_ok),
                               np.asarray(uv), image)


def mesh_project_cameras(sensor_names: Sequence[str],
                         cams: Sequence[CameraParams],
                         images: Sequence[np.ndarray],
                         timestamps: Sequence[float],
                         cam_types: Sequence[int],
                         world_to_cam, vertices, faces, out_dir) -> None:
    """All cameras -> ``<out_dir>/<timestamp>_<sensor>.{obj,mtl,png}``
    (meshProjectCameras, texture_processing.cc:1532-1561; the 10.7f
    timestamp format matches the reference filenames)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    verts = jnp.asarray(vertices)
    tri_soup = verts[jnp.asarray(faces)]
    for cid in range(len(images)):
        s = int(cam_types[cid])
        prefix = out_dir / f"{timestamps[cid]:10.7f}_{sensor_names[s]}"
        print(f"Creating texture for: {prefix}")
        mesh_project(verts, faces, cams[s], world_to_cam[cid], images[cid],
                     prefix, tri_soup=tri_soup)
