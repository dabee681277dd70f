"""Quaternion / rigid-pose algebra as pure JAX functions.

Pose layout follows the reference parameter-array convention
(`/root/reference/rig_calibrator/src/dense_map_utils.cc:159-178`):
a rigid pose is 7 numbers ``[tx, ty, tz, qx, qy, qz, qw]`` — translation
first, then a (not-necessarily-normalized) quaternion in xyzw order.
``pose_*`` functions normalize the quaternion on decode, matching
``array_to_rigid_transform``.

An "affine" pose is 12 numbers: row-major 3x3 linear part then translation
(`transform_utils.cc:44-72` / ``affine_transform_to_array``).

All functions are shape-polymorphic over leading batch dimensions and are
safe to ``vmap``/``jit``; no Python branching on traced values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ----------------------------------------------------------------------------
# Quaternions (xyzw layout)
# ----------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_normalize(q):
    """Normalize quaternion; guards against zero norm."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, jnp.finfo(q.dtype).tiny)


def quat_mul(a, b):
    """Hamilton product a*b, xyzw layout. Rotation by (a*b) = rotate by b then a."""
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v by unit quaternion q. q: [...,4], v: [...,3]."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # v' = v + 2*qw*(qv x v) + 2*qv x (qv x v)
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_to_matrix(q):
    """Unit quaternion (xyzw) -> rotation matrix [...,3,3]."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """Rotation matrix [...,3,3] -> unit quaternion xyzw.

    Branch-free Shepperd method: computes all four candidate quaternions and
    selects the best-conditioned one, so it is jit/vmap-safe and
    differentiable away from the switch boundaries.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each valid when its pivot is largest.
    qw_w = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2
    qx_x = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2
    qy_y = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2
    qz_z = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2

    tiny = jnp.finfo(m.dtype).tiny

    def safe(x, d):
        return x / jnp.maximum(4.0 * d, tiny)

    cand_w = jnp.stack(
        [safe(m21 - m12, qw_w), safe(m02 - m20, qw_w), safe(m10 - m01, qw_w), qw_w], axis=-1)
    cand_x = jnp.stack(
        [qx_x, safe(m01 + m10, qx_x), safe(m02 + m20, qx_x), safe(m21 - m12, qx_x)], axis=-1)
    cand_y = jnp.stack(
        [safe(m01 + m10, qy_y), qy_y, safe(m12 + m21, qy_y), safe(m02 - m20, qy_y)], axis=-1)
    cand_z = jnp.stack(
        [safe(m02 + m20, qz_z), safe(m12 + m21, qz_z), qz_z, safe(m10 - m01, qz_z)], axis=-1)

    pivots = jnp.stack([qw_w, qx_x, qy_y, qz_z], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [...,4cand,4]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    return quat_normalize(q)


def quat_slerp(q0, q1, alpha):
    """Spherical linear interpolation between unit quaternions (xyzw).

    Matches Eigen's Quaternion::slerp semantics used by ``linearInterp``
    (`dense_map_utils.cc:315-329`): takes the short path, falls back to lerp
    for nearly-parallel quaternions.
    """
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.clip(jnp.abs(dot), 0.0, 1.0)

    # Near-parallel quaternions fall back to lerp. The arccos gradient blows
    # up as dot -> 1, so the unselected branch must see a safe dot (the
    # where-NaN autodiff pitfall). The threshold must be representable in the
    # working dtype: in f32, 1 - 1e-9 rounds to 1.0 and the guard would never
    # fire, leaving a 0/0 at exactly-parallel quaternions.
    eps = 16.0 * jnp.finfo(q0.dtype).eps
    near = dot > 1.0 - eps
    dot_safe = jnp.where(near, 0.0, dot)
    theta = jnp.arccos(dot_safe)
    sin_theta = jnp.sin(theta)
    safe_sin = jnp.where(near, 1.0, sin_theta)
    # alpha: scalar or batch matching q's leading dims; lift to [...,1]
    a = jnp.asarray(alpha, q0.dtype)[..., None]
    w0 = jnp.where(near, 1.0 - a, jnp.sin((1.0 - a) * theta) / safe_sin)
    w1 = jnp.where(near, a, jnp.sin(a * theta) / safe_sin)
    return quat_normalize(w0 * q0 + w1 * q1)


# ----------------------------------------------------------------------------
# Rigid poses: [tx,ty,tz,qx,qy,qz,qw]
# ----------------------------------------------------------------------------

POSE_SIZE = 7       # reference NUM_RIGID_PARAMS (dense_map_utils.h:54)
AFFINE_SIZE = 12    # reference NUM_AFFINE_PARAMS (dense_map_utils.h:55)


def pose_identity(dtype=jnp.float32):
    return jnp.array([0, 0, 0, 0, 0, 0, 1], dtype=dtype)


def pose_t(p):
    return p[..., :3]


def pose_q(p):
    """Quaternion part, normalized on read (mirrors array_to_rigid_transform)."""
    return quat_normalize(p[..., 3:7])


def make_pose(t, q):
    return jnp.concatenate([t, q], axis=-1)


def pose_apply(p, x):
    """Apply rigid transform to point(s): R x + t."""
    return quat_rotate(pose_q(p), x) + pose_t(p)


def pose_compose(a, b):
    """Compose: (a*b)(x) = a(b(x))."""
    qa, qb = pose_q(a), pose_q(b)
    t = quat_rotate(qa, pose_t(b)) + pose_t(a)
    return make_pose(t, quat_mul(qa, qb))


def pose_inverse(p):
    q = pose_q(p)
    qi = quat_conj(q)
    return make_pose(-quat_rotate(qi, pose_t(p)), qi)


def pose_to_matrix(p):
    """[...,7] -> [...,4,4] homogeneous matrix."""
    R = quat_to_matrix(pose_q(p))
    t = pose_t(p)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose(m):
    """[...,3|4,4] homogeneous (or 3x4) matrix -> [...,7]."""
    R = m[..., :3, :3]
    t = m[..., :3, 3]
    return make_pose(t, matrix_to_quat(R))


def pose_interp(alpha, p0, p1):
    """slerp rotation + lerp translation, matching ``linearInterp``
    (`dense_map_utils.cc:315-329`)."""
    a = jnp.asarray(alpha, p0.dtype)[..., None]
    t = (1.0 - a) * pose_t(p0) + a * pose_t(p1)
    q = quat_slerp(pose_q(p0), pose_q(p1), alpha)
    return make_pose(t, q)


# ----------------------------------------------------------------------------
# Affine transforms: [r00..r22 row-major, tx,ty,tz]
# ----------------------------------------------------------------------------


def affine_identity(dtype=jnp.float32):
    return jnp.concatenate([jnp.eye(3, dtype=dtype).reshape(9), jnp.zeros(3, dtype=dtype)])


def affine_linear(a):
    return a[..., :9].reshape(a.shape[:-1] + (3, 3))


def affine_t(a):
    return a[..., 9:12]


def make_affine(linear, t):
    return jnp.concatenate([linear.reshape(linear.shape[:-2] + (9,)), t], axis=-1)


def affine_apply(a, x):
    return jnp.einsum("...ij,...j->...i", affine_linear(a), x) + affine_t(a)


def affine_compose(a, b):
    L = affine_linear(a) @ affine_linear(b)
    t = jnp.einsum("...ij,...j->...i", affine_linear(a), affine_t(b)) + affine_t(a)
    return make_affine(L, t)


def affine_inverse(a):
    Li = jnp.linalg.inv(affine_linear(a))
    return make_affine(Li, -jnp.einsum("...ij,...j->...i", Li, affine_t(a)))


def pose_to_affine(p, scale=None):
    L = quat_to_matrix(pose_q(p))
    if scale is not None:
        L = L * jnp.asarray(scale)[..., None, None]
    return make_affine(L, pose_t(p))


# ----------------------------------------------------------------------------
# Bracketed-pose interpolation (the core of the rig BA residuals)
# ----------------------------------------------------------------------------


def interp_world_to_ref(beg_pose, end_pose, dt_cam, dt_bracket, ref_to_cam_offset):
    """Interpolated world->ref pose at a camera timestamp between two bracketing
    reference poses.

    Mirrors ``calc_interp_world_to_ref`` (`bin/rig_calibrator.cc:322-353`) but
    takes *pre-differenced* small timestamps for f32 safety on TPU:

      dt_cam     = cam_stamp - beg_ref_stamp   (host-precomputed, small)
      dt_bracket = end_ref_stamp - beg_ref_stamp

    alpha = (dt_cam - ref_to_cam_offset) / dt_bracket. The degenerate
    dt_bracket == 0 case returns beg_pose (the reference-camera convention,
    rig_calibrator.cc:355-374).
    """
    degenerate = dt_bracket == 0.0
    safe_len = jnp.where(degenerate, 1.0, dt_bracket)
    alpha = (dt_cam - ref_to_cam_offset) / safe_len
    alpha = jnp.where(degenerate, 0.0, alpha)
    return pose_interp(alpha, beg_pose, end_pose)


def world_to_cam_from_bracket(beg_pose, end_pose, ref_to_cam, dt_cam, dt_bracket,
                              ref_to_cam_offset):
    """world->cam = ref_to_cam * interp(world->ref), the bracketed-camera pose
    used by every rig residual (``calc_world_to_cam_trans``,
    `bin/rig_calibrator.cc:362-390`).

    For the reference camera pass dt_bracket == 0; then the result is
    beg_pose exactly (ref_to_cam is expected to be identity there, and we
    honor the reference's convention of ignoring it entirely).
    """
    interp = interp_world_to_ref(beg_pose, end_pose, dt_cam, dt_bracket, ref_to_cam_offset)
    composed = pose_compose(ref_to_cam, interp)
    degenerate = jnp.asarray(dt_bracket == 0.0)[..., None]
    return jnp.where(degenerate, interp, composed)


# ----------------------------------------------------------------------------
# Rotation utilities for averaging / rig init
# ----------------------------------------------------------------------------


def quat_log(q):
    """Log map of unit quaternion -> rotation vector (axis*angle, 3)."""
    q = quat_normalize(q)
    q = jnp.where(q[..., 3:4] < 0, -q, q)  # take w >= 0 branch
    v = q[..., :3]
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    n = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(n, w)
    scale = jnp.where(n < 1e-12, 2.0 / jnp.maximum(w, 1e-12), angle / jnp.maximum(n, 1e-12))
    return v * scale[..., None]


def quat_exp(rvec):
    """Exp map rotation vector -> unit quaternion (xyzw)."""
    angle = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-12
    k = jnp.where(small, 0.5, jnp.sin(half) / jnp.maximum(angle, 1e-30))
    w = jnp.cos(half)
    return jnp.concatenate([rvec * k, w], axis=-1)


def quat_mean(qs, weights=None, iters: int = 4):
    """Karcher-style mean of unit quaternions via iterative log/exp averaging.

    Used by the rig initializer, replacing the reference's per-entry
    transform median (``calc_rig_using_word_to_cam``,
    `bin/rig_calibrator.cc:1190-1265`) with a proper rotation average.
    """
    qs = quat_normalize(qs)
    if weights is None:
        weights = jnp.ones(qs.shape[:-1], qs.dtype)
    wsum = jnp.sum(weights) + jnp.finfo(qs.dtype).tiny
    mean = quat_normalize(jnp.sum(qs * weights[..., None], axis=0))

    def body(_, mean):
        # rotate all into tangent space of current mean
        rel = quat_mul(quat_conj(mean), qs)
        tang = quat_log(rel)
        avg = jnp.sum(tang * weights[..., None], axis=0) / wsum
        return quat_normalize(quat_mul(mean, quat_exp(avg)))

    return jax.lax.fori_loop(0, iters, body, mean)
