"""Dense two-view stereo by plane sweep.

The multi_stereo capability (SURVEY.md 2.2: the reference shells out to
ASP's ``parallel_stereo`` per consecutive image pair, then fuses the clouds
with voxblox; `/root/reference/rig_calibrator/bin/multi_stereo:158-246`).

TPU-native design: instead of rectification + scanline correlation, sweep a
family of fronto-parallel depth planes through the reference view. For every
depth hypothesis the neighbor image is warped by the induced homography
(one gather + one ZNCC correlation over the whole image — dense, regular,
vectorizable); the cost volume [D,H,W] reduces by winner-take-all with
parabolic sub-plane refinement and a left-right consistency check. Output is
a depth map + cam-frame point cloud ready for TSDF fusion.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod


class StereoResult(NamedTuple):
    depth: jnp.ndarray       # [H,W] z-depth in the reference view (0 invalid)
    confidence: jnp.ndarray  # [H,W] best ZNCC score
    valid: jnp.ndarray       # [H,W] bool


def _box_filter(x, radius: int):
    """Mean filter with a (2r+1)^2 box via separable cumsum differences."""
    k = 2 * radius + 1
    pad = [(radius, radius), (radius, radius)] + [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, pad, mode="edge")
    c = jnp.cumsum(xp, axis=0)
    c = jnp.concatenate([c[k - 1:k], c[k:] - c[:-k]], axis=0)
    c = jnp.cumsum(c, axis=1)
    c = jnp.concatenate([c[:, k - 1:k], c[:, k:] - c[:, :-k]], axis=1)
    return c / (k * k)


def _bilinear_gray(img, x, y):
    H, W = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    v = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x0 + 1] * fx * (1 - fy)
         + img[y0 + 1, x0] * (1 - fx) * fy + img[y0 + 1, x0 + 1] * fx * fy)
    inb = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    return v, inb


@functools.partial(jax.jit, static_argnames=("num_planes", "radius"))
def plane_sweep(ref_img, nbr_img, focal, center, ref_to_nbr_pose,
                min_depth: float, max_depth: float, num_planes: int = 64,
                radius: int = 3, min_confidence: float = 0.3):
    """Depth of the reference view by plane sweep against one neighbor.

    ref_img/nbr_img: [H,W] grayscale float. focal [2], center [2] shared
    pinhole intrinsics (undistorted images — the reference also runs stereo
    on undistorted images, multi_stereo:164-173). ref_to_nbr_pose [7]: cam
    transform ref->neighbor. Planes sampled uniformly in inverse depth.
    """
    H, W = ref_img.shape
    dtype = ref_img.dtype
    us, vs = jnp.meshgrid(jnp.arange(W, dtype=dtype), jnp.arange(H, dtype=dtype))
    # unit-plane ray for each ref pixel
    rx = (us - center[0]) / focal[0]
    ry = (vs - center[1]) / focal[1]

    R = pose_mod.quat_to_matrix(pose_mod.pose_q(ref_to_nbr_pose))
    t = pose_mod.pose_t(ref_to_nbr_pose)

    inv_depths = jnp.linspace(1.0 / max_depth, 1.0 / min_depth, num_planes,
                              dtype=dtype)

    ref_mean = _box_filter(ref_img, radius)
    ref_zm = ref_img - ref_mean
    ref_var = _box_filter(ref_zm * ref_zm, radius)

    def cost_of_plane(inv_d):
        z = 1.0 / inv_d
        X = jnp.stack([rx * z, ry * z, jnp.full_like(rx, z)], axis=-1)  # [H,W,3]
        Xn = jnp.einsum("ij,hwj->hwi", R, X) + t
        zn = Xn[..., 2]
        good_z = zn > 1e-6
        un = Xn[..., 0] / jnp.where(good_z, zn, 1.0) * focal[0] + center[0]
        vn = Xn[..., 1] / jnp.where(good_z, zn, 1.0) * focal[1] + center[1]
        warped, inb = _bilinear_gray(nbr_img, un, vn)
        inb = inb & good_z
        w_mean = _box_filter(warped, radius)
        w_zm = warped - w_mean
        cov = _box_filter(ref_zm * w_zm, radius)
        w_var = _box_filter(w_zm * w_zm, radius)
        # the variance floor must sit far below real local variances or
        # smooth textures get their ZNCC silently crushed
        zncc = cov / jnp.sqrt(jnp.maximum(ref_var * w_var, 1e-16))
        return jnp.where(inb, zncc, -1.0)

    costs = jax.lax.map(cost_of_plane, inv_depths)     # [D,H,W]

    best = jnp.argmax(costs, axis=0)                   # [H,W]
    best_cost = jnp.max(costs, axis=0)

    # parabolic refinement over inverse depth
    d0 = jnp.clip(best - 1, 0, num_planes - 1)
    d2 = jnp.clip(best + 1, 0, num_planes - 1)
    c0 = jnp.take_along_axis(costs, d0[None], axis=0)[0]
    c1 = best_cost
    c2 = jnp.take_along_axis(costs, d2[None], axis=0)[0]
    denom = c0 - 2 * c1 + c2
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (c0 - c2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    step = inv_depths[1] - inv_depths[0]
    inv_best = inv_depths[best] + delta * step
    depth = 1.0 / jnp.maximum(inv_best, 1e-9)

    # textureless windows can't be matched regardless of score
    textured = ref_var > 1e-9
    valid = ((best_cost > min_confidence) & (best > 0)
             & (best < num_planes - 1) & textured)
    depth = jnp.where(valid, depth, 0.0)
    return StereoResult(depth, best_cost, valid)


def stereo_pair_to_cloud(result: StereoResult, focal, center,
                         subsample: int = 1):
    """Depth map -> cam-frame point cloud [N,3] (valid pixels only; host).
    The pc_filter + point2mesh hand-off shape (multi_stereo:191-225)."""
    depth = np.asarray(result.depth)[::subsample, ::subsample]
    valid = np.asarray(result.valid)[::subsample, ::subsample]
    H, W = depth.shape
    us, vs = np.meshgrid(np.arange(W) * subsample, np.arange(H) * subsample)
    z = depth
    x = (us - float(center[0])) / float(focal[0]) * z
    y = (vs - float(center[1])) / float(focal[1]) * z
    pts = np.stack([x, y, z], -1)[valid]
    return pts


def left_right_check(left: StereoResult, right: StereoResult, focal, center,
                     ref_to_nbr_pose, max_diff: float = 0.05):
    """Cross-check: project each left depth into the right view and compare
    against the right depth estimate; inconsistent pixels are invalidated."""
    H, W = left.depth.shape
    dtype = left.depth.dtype
    us, vs = jnp.meshgrid(jnp.arange(W, dtype=dtype), jnp.arange(H, dtype=dtype))
    z = left.depth
    X = jnp.stack([(us - center[0]) / focal[0] * z,
                   (vs - center[1]) / focal[1] * z, z], axis=-1)
    R = pose_mod.quat_to_matrix(pose_mod.pose_q(ref_to_nbr_pose))
    t = pose_mod.pose_t(ref_to_nbr_pose)
    Xn = jnp.einsum("ij,hwj->hwi", R, X) + t
    zn = Xn[..., 2]
    un = Xn[..., 0] / jnp.where(zn > 1e-6, zn, 1.0) * focal[0] + center[0]
    vn = Xn[..., 1] / jnp.where(zn > 1e-6, zn, 1.0) * focal[1] + center[1]
    zr, inb = _bilinear_gray(right.depth, un, vn)
    consistent = inb & (jnp.abs(zr - zn) < max_diff * zn) & left.valid
    return StereoResult(jnp.where(consistent, left.depth, 0.0),
                        left.confidence, consistent)
