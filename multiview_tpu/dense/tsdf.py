"""TSDF fusion of depth data into a voxel volume.

The voxblox role (SURVEY.md 2.2: TSDF integration of point clouds into a
mesh, fed by PCD files + cam2world transforms from the calibrator's
``exportToVoxblox``, `/root/reference/rig_calibrator/src/dense_map_utils.cc:1185-1291`).

TPU-first design: voxblox ray-marches each point on CPU; here integration is
*projective* — every voxel projects into the frame's depth image and updates
itself independently (KinectFusion-style). That turns integration into one
dense, regular [X,Y,Z] kernel per frame with no scatter at all: ideal for
the VPU, trivially sharded across chips along the X slab axis (each device
owns a contiguous slab; no cross-device communication during integration).

Unstructured point clouds are first rasterized to a virtual depth image
(scatter-min z-buffer) using the same camera models as everywhere else.
Weights carry per-point intensity/color just like the ISAAC voxblox fork
(intensity in normal_x, dense_map_utils.cc:1242-1266).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TsdfGrid:
    """Dense truncated signed-distance volume.

    tsdf/weight/intensity: [X,Y,Z] float32. origin: world position of voxel
    (0,0,0) center. Static metadata: voxel_size, truncation distance.
    """

    tsdf: jnp.ndarray
    weight: jnp.ndarray
    intensity: jnp.ndarray
    origin: jnp.ndarray  # [3]

    voxel_size: float = dataclasses.field(metadata=dict(static=True), default=0.05)
    truncation: float = dataclasses.field(metadata=dict(static=True), default=0.2)

    @property
    def shape(self):
        return self.tsdf.shape


def make_grid(shape: Tuple[int, int, int], origin, voxel_size: float,
              truncation: Optional[float] = None, dtype=jnp.float32) -> TsdfGrid:
    if truncation is None:
        truncation = 4.0 * voxel_size
    z = jnp.zeros(shape, dtype)
    return TsdfGrid(tsdf=z, weight=z, intensity=z,
                    origin=jnp.asarray(origin, dtype),
                    voxel_size=float(voxel_size), truncation=float(truncation))


def voxel_centers(grid: TsdfGrid) -> jnp.ndarray:
    """[X,Y,Z,3] world coordinates of voxel centers."""
    X, Y, Z = grid.shape
    ii = jnp.arange(X)
    jj = jnp.arange(Y)
    kk = jnp.arange(Z)
    gi, gj, gk = jnp.meshgrid(ii, jj, kk, indexing="ij")
    idx = jnp.stack([gi, gj, gk], axis=-1).astype(grid.tsdf.dtype)
    return grid.origin + (idx + 0.5) * grid.voxel_size


@functools.partial(jax.jit, static_argnames=("max_range", "max_weight"))
def integrate_depth_image(grid: TsdfGrid, depth: jnp.ndarray, focal, center,
                          cam_to_world_pose, max_range: float = 10.0,
                          max_weight: float = 100.0,
                          intensity_img: Optional[jnp.ndarray] = None) -> TsdfGrid:
    """Projective TSDF update from one depth image.

    depth: [H,W] metric depth along +z (0 or inf = invalid). focal [2],
    center [2] pinhole intrinsics of the (undistorted) depth camera.
    cam_to_world_pose: [7]. Voxels behind the surface beyond the truncation
    band are untouched; in front, sdf clamps to +trunc (free space carving).
    """
    H, W = depth.shape
    dtype = grid.tsdf.dtype
    X, Y, Z = grid.shape
    w2c = pose_mod.pose_inverse(jnp.asarray(cam_to_world_pose, dtype))
    # Separable voxel-center projection: three [X,Y,Z] component arrays via
    # per-axis broadcasts instead of one [X,Y,Z,3] tensor — a trailing dim
    # of 3 is tiled to 128 on TPU (~40x HBM waste at real volume sizes).
    R = pose_mod.quat_to_matrix(pose_mod.pose_q(w2c))
    t = pose_mod.pose_t(w2c)
    xw = grid.origin[0] + (jnp.arange(X, dtype=dtype) + 0.5) * grid.voxel_size
    yw = grid.origin[1] + (jnp.arange(Y, dtype=dtype) + 0.5) * grid.voxel_size
    zw = grid.origin[2] + (jnp.arange(Z, dtype=dtype) + 0.5) * grid.voxel_size

    def cam_coord(i):
        return (R[i, 0] * xw[:, None, None] + R[i, 1] * yw[None, :, None]
                + R[i, 2] * zw[None, None, :] + t[i])

    z = cam_coord(2)
    zsafe = jnp.where(z > 1e-6, z, 1.0)
    u = cam_coord(0) / zsafe * focal[0] + center[0]
    v = cam_coord(1) / zsafe * focal[1] + center[1]
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    in_img = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) & (z > 1e-6)

    d_meas = depth[vi, ui]
    valid_meas = (d_meas > 1e-6) & jnp.isfinite(d_meas) & (d_meas < max_range)

    sdf = d_meas - z
    trunc = jnp.asarray(grid.truncation, dtype)
    update = in_img & valid_meas & (sdf > -trunc)
    sdf = jnp.clip(sdf, -trunc, trunc) / trunc         # normalized [-1,1]

    # linear weight drop behind the surface (voxblox-style)
    w_new = jnp.where(update, 1.0, 0.0).astype(dtype)
    w_tot = grid.weight + w_new
    safe = jnp.maximum(w_tot, 1e-12)
    tsdf = (grid.tsdf * grid.weight + sdf * w_new) / safe
    tsdf = jnp.where(w_tot > 0, tsdf, grid.tsdf)

    if intensity_img is not None:
        inten_meas = intensity_img[vi, ui]
        inten = (grid.intensity * grid.weight + inten_meas * w_new) / safe
        inten = jnp.where(w_tot > 0, inten, grid.intensity)
    else:
        inten = grid.intensity

    return dataclasses.replace(grid, tsdf=tsdf,
                               weight=jnp.minimum(w_tot, max_weight),
                               intensity=inten)


def _fill_depth_holes(depth: jnp.ndarray, rounds: int = 2) -> jnp.ndarray:
    """Fill empty z-buffer pixels from valid 3x3 neighbors (min depth wins);
    a sparse scatter leaves holes the projective update would read as
    'no measurement'."""
    big = jnp.asarray(jnp.inf, depth.dtype)
    d = jnp.where(depth > 0, depth, big)
    for _ in range(rounds):
        shifts = [d]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                shifts.append(jnp.roll(d, (dy, dx), axis=(0, 1)))
        m = shifts[0]
        for s in shifts[1:]:
            m = jnp.minimum(m, s)
        d = jnp.where(jnp.isfinite(d), d, m)
    return jnp.where(jnp.isfinite(d), d, 0.0)


@functools.partial(jax.jit, static_argnames=("image_size", "fill_rounds"))
def rasterize_cloud_to_depth(points_cam: jnp.ndarray, focal, center,
                             image_size: Tuple[int, int],
                             intensities: Optional[jnp.ndarray] = None,
                             fill_rounds: int = 2):
    """Unstructured cam-frame points -> z-buffer depth image (scatter-min)
    with hole-filling dilation.

    Bridges the voxblox PCD-cloud input path into the projective integrator.
    Returns (depth [H,W], intensity [H,W] or None).
    """
    W, H = image_size
    z = points_cam[:, 2]
    ok = z > 1e-6
    u = jnp.clip(jnp.round(points_cam[:, 0] / jnp.where(ok, z, 1.0) * focal[0]
                           + center[0]).astype(jnp.int32), 0, W - 1)
    v = jnp.clip(jnp.round(points_cam[:, 1] / jnp.where(ok, z, 1.0) * focal[1]
                           + center[1]).astype(jnp.int32), 0, H - 1)
    flat = v * W + u
    big = jnp.asarray(jnp.inf, points_cam.dtype)
    zbuf = jnp.full(H * W, big, points_cam.dtype)
    zbuf = zbuf.at[flat].min(jnp.where(ok, z, big))
    depth = jnp.where(jnp.isfinite(zbuf), zbuf, 0.0).reshape(H, W)
    if fill_rounds > 0:
        depth = _fill_depth_holes(depth, fill_rounds)
    inten_img = None
    if intensities is not None:
        # keep the intensity of the winning (nearest) point per pixel
        won = zbuf[flat] == jnp.where(ok, z, big)
        ibuf = jnp.zeros(H * W, points_cam.dtype)
        ibuf = ibuf.at[flat].max(jnp.where(won & ok, intensities, 0.0))
        inten_img = ibuf.reshape(H, W)
    return depth, inten_img


def integrate_point_cloud(grid: TsdfGrid, points_cam: jnp.ndarray,
                          cam_to_world_pose, focal=(300.0, 300.0),
                          center=None, image_size: Tuple[int, int] = (640, 480),
                          intensities: Optional[jnp.ndarray] = None,
                          max_range: float = 10.0) -> TsdfGrid:
    """Integrate an unstructured cam-frame point cloud (the
    voxblox-index.txt path): rasterize to a virtual pinhole depth image,
    then run the projective update."""
    if center is None:
        center = (image_size[0] / 2.0, image_size[1] / 2.0)
    focal = jnp.asarray(focal, grid.tsdf.dtype)
    center = jnp.asarray(center, grid.tsdf.dtype)
    # pad the cloud to a power-of-2 row count (z=0 rows are ignored) so
    # varying per-frame cloud sizes reuse one compiled rasterizer
    from multiview_tpu.utils.padding import pad_rows_pow2
    n = points_cam.shape[0]
    if n & (n - 1):
        points_cam = jnp.asarray(pad_rows_pow2(np.asarray(points_cam)))
        if intensities is not None:
            intensities = jnp.asarray(pad_rows_pow2(np.asarray(intensities)))
    depth, inten = rasterize_cloud_to_depth(points_cam, focal, center, image_size,
                                            intensities)
    return integrate_depth_image(grid, depth, focal, center, cam_to_world_pose,
                                 max_range=max_range, intensity_img=inten)
