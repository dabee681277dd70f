"""Similarity registration (rotation + translation + scale) of point sets.

Re-design of ``Find3DAffineTransform``
(`/root/reference/rig_calibrator/src/interest_point.cc:831-887`): the same
Kabsch-with-scale estimate, as one batched JAX function. The reference
estimates scale from the ratio of sums of consecutive-point distances (not
the Umeyama variance ratio); we reproduce that so registration against the
same control points yields the same transform.
"""

from __future__ import annotations

import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod


def find_similarity_transform(src, dst, weights=None):
    """Find scale * R @ x + t best mapping ``src`` points to ``dst``.

    src, dst: [N,3]. Returns (scale, pose[7]) such that
    T(x) = scale * R x + t with (R, t) packed as a rigid pose.

    Mirrors `interest_point.cc:831-887`:
    1. scale = sum |dst[i+1]-dst[i]| / sum |src[i+1]-src[i]|
    2. Kabsch on (src, dst/scale) centroids-removed
    3. t = scale*(ctr_dst/scale - R ctr_src)
    """
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    if weights is None:
        weights = jnp.ones(src.shape[0], src.dtype)
    wsum = jnp.sum(weights)

    dist_in = jnp.sum(jnp.linalg.norm(src[1:] - src[:-1], axis=-1))
    dist_out = jnp.sum(jnp.linalg.norm(dst[1:] - dst[:-1], axis=-1))
    scale = dist_out / jnp.maximum(dist_in, 1e-30)

    local_out = dst / scale
    in_ctr = jnp.sum(src * weights[:, None], axis=0) / wsum
    out_ctr = jnp.sum(local_out * weights[:, None], axis=0) / wsum
    a = (src - in_ctr) * weights[:, None]
    b = local_out - out_ctr

    cov = a.T @ b  # = local_in * local_out^T in the reference's convention
    U, _, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
    R = Vt.T @ D @ U.T

    t = scale * (out_ctr - R @ in_ctr)
    return scale, pose_mod.make_pose(t, pose_mod.matrix_to_quat(R))


def apply_similarity(scale, pose, points):
    """T(x) = scale * R x + t."""
    return scale * pose_mod.quat_rotate(pose_mod.pose_q(pose), points) + pose_mod.pose_t(pose)


def transform_cameras(scale, pose, world_to_cam_poses):
    """Apply a similarity world-transform to world->cam poses.

    Mirrors ``TransformCameras`` (`interest_point.cc:997-1017`): with
    T(x) = s R x + t, the new world_to_cam is
    (R_c (x - t_new)/s ... ) i.e. rotation R_c R^-1, translation
    t_c*s ... Concretely: new_w2c(x) = w2c(T^{-1}(x)) scaled so camera
    centers land at T(center); rotation composes with R^T and translation
    scales by s.
    """
    R = pose_mod.quat_to_matrix(pose_mod.pose_q(pose))
    t = pose_mod.pose_t(pose)
    Rc = pose_mod.quat_to_matrix(pose_mod.pose_q(world_to_cam_poses))  # [N,3,3]
    tc = pose_mod.pose_t(world_to_cam_poses)                           # [N,3]
    # x_cam = Rc x_w + tc ; x_w = (R^T (x_new - t))/s
    # => x_cam*s = Rc R^T x_new - Rc R^T t + s tc
    new_R = jnp.einsum("nij,kj->nik", Rc, R)
    new_t = scale * tc - jnp.einsum("nij,j->ni", new_R, t)
    q = pose_mod.matrix_to_quat(new_R)
    return pose_mod.make_pose(new_t, q)


def transform_points(scale, pose, points):
    """Apply similarity to triangulated points (``TransformPoints``)."""
    return apply_similarity(scale, pose, points)


def transform_rig(scale, ref_to_cam_poses):
    """Scale the translation component of rig extrinsics (``TransformRig``,
    `interest_point.cc:1020-1023`): rotations unchanged, translations * scale."""
    t = pose_mod.pose_t(ref_to_cam_poses) * scale
    return pose_mod.make_pose(t, pose_mod.pose_q(ref_to_cam_poses))
