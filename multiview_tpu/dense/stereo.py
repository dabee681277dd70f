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


def _sgm_dir_scan(cost_xyd, p1, p2):
    """One-directional SGM aggregation along axis 0 of [X, Y, D]
    (a lax.scan whose carry is the whole previous line [Y, D] — every
    per-pixel recurrence of a scanline runs in parallel on the VPU)."""

    def step(L_prev, C):
        m = jnp.min(L_prev, axis=-1, keepdims=True)
        lm1 = jnp.concatenate([L_prev[:, :1], L_prev[:, :-1]], axis=1) + p1
        lp1 = jnp.concatenate([L_prev[:, 1:], L_prev[:, -1:]], axis=1) + p1
        L = C + jnp.minimum(jnp.minimum(L_prev, m + p2),
                            jnp.minimum(lm1, lp1)) - m
        return L, L

    L0 = cost_xyd[0]
    _, Ls = jax.lax.scan(step, L0, cost_xyd[1:])
    return jnp.concatenate([L0[None], Ls], axis=0)


def sgm_aggregate(cost_hwd, p1: float = 0.03, p2: float = 0.3):
    """4-path semi-global matching aggregation of a [H,W,D] matching-cost
    volume (lower = better).

    The reference's dense-stereo engine (ASP ``parallel_stereo``,
    `/root/reference/rig_calibrator/bin/multi_stereo:184-189`) offers SGM
    cost aggregation on top of raw correlation; this is the TPU equivalent:
    Hirschmuller's L_r recurrence over the left/right/up/down paths, each
    path one ``lax.scan`` whose carry is an entire scanline so the recurrence
    is sequential only in the scan direction.
    """
    down = _sgm_dir_scan(cost_hwd, p1, p2)
    up = _sgm_dir_scan(cost_hwd[::-1], p1, p2)[::-1]
    cwd = jnp.swapaxes(cost_hwd, 0, 1)                 # [W,H,D]
    right = jnp.swapaxes(_sgm_dir_scan(cwd, p1, p2), 0, 1)
    left = jnp.swapaxes(_sgm_dir_scan(cwd[::-1], p1, p2)[::-1], 0, 1)
    return down + up + right + left


@functools.partial(jax.jit, static_argnames=("num_planes", "radius", "aggregate"))
def plane_sweep(ref_img, nbr_img, focal, center, ref_to_nbr_pose,
                min_depth: float, max_depth: float, num_planes: int = 64,
                radius: int = 3, min_confidence: float = 0.3,
                aggregate: str = "none", sgm_p1: float = 0.03,
                sgm_p2: float = 0.3):
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

    costs = jax.lax.map(cost_of_plane, inv_depths)     # [D,H,W] zncc (higher better)

    if aggregate == "sgm":
        # aggregate 1-zncc (lower better), pick by the aggregated cost
        agg = sgm_aggregate(jnp.transpose(1.0 - costs, (1, 2, 0)),
                            sgm_p1, sgm_p2)            # [H,W,D]
        scores = jnp.transpose(-agg, (2, 0, 1))        # [D,H,W] higher better
    else:
        scores = costs

    best = jnp.argmax(scores, axis=0)                  # [H,W]
    best_cost = jnp.take_along_axis(costs, best[None], axis=0)[0]  # raw zncc

    # parabolic refinement over inverse depth (on the selection scores)
    d0 = jnp.clip(best - 1, 0, num_planes - 1)
    d2 = jnp.clip(best + 1, 0, num_planes - 1)
    c0 = jnp.take_along_axis(scores, d0[None], axis=0)[0]
    c1 = jnp.take_along_axis(scores, best[None], axis=0)[0]
    c2 = jnp.take_along_axis(scores, d2[None], axis=0)[0]
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
