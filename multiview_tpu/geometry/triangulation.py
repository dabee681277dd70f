"""N-view triangulation as batched, mask-aware JAX functions.

Re-design of openMVG's iterated weighted linear triangulation
(`/root/reference/openMVG/multiview/triangulation_nview.cc:87-146`) and the
calibrator's wrappers (`/root/reference/rig_calibrator/src/interest_point.cc:
337-423,649-722`): instead of per-point C++ loops over std::maps, every track
is a fixed-width padded row of a dense tensor and a single vmapped kernel
triangulates all of them at once (3x3 normal-equation solves on the VPU).

Conventions (matching ``dense_map::Triangulate``, interest_point.cc:399-423):
pixels are *undistorted centered*; the projection matrix is K [R|t] with
K = diag(f, f, 1) (mean focal, zero center) and [R|t] = world_to_cam.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod


def projection_matrix(focal, world_to_cam_pose):
    """P = K [R|t], K = diag(f,f,1) (`interest_point.cc:343-352`).

    focal: scalar (mean focal), world_to_cam_pose: [...,7] -> [...,3,4].
    """
    R = pose_mod.quat_to_matrix(pose_mod.pose_q(world_to_cam_pose))
    t = pose_mod.pose_t(world_to_cam_pose)
    Rt = jnp.concatenate([R, t[..., None]], axis=-1)  # [...,3,4]
    f = jnp.asarray(focal)[..., None, None]
    scale = jnp.stack([jnp.squeeze(f, (-1, -2)),
                       jnp.squeeze(f, (-1, -2)),
                       jnp.ones_like(jnp.squeeze(f, (-1, -2)))], axis=-1)
    return Rt * scale[..., None]


def triangulate_track(P, pix, mask, iters: int = 3):
    """Iterated weighted linear triangulation of one track.

    P    : [V,3,4] projection matrices (padded rows arbitrary)
    pix  : [V,2]   undistorted centered pixels
    mask : [V]     validity of each view (False rows are ignored)

    Returns (xyz [3], min_depth, valid). ``valid`` is False when fewer than
    two masked views remain or the solve produced non-finite values — the
    same conditions under which the reference marks a whole track outlier
    (`interest_point.cc:688-716`).

    Mirrors ``Triangulation::compute`` (`triangulation_nview.cc:87-146`):
    weights start at 1 and are updated to 1/z after each solve; default
    iters=3 matches the reference default (`triangulation_nview.hpp:67`).
    """
    dtype = P.dtype
    w0 = mask.astype(dtype)

    def solve(weights):
        # v1 = w*(P0 - px*P2), v2 = w*(P1 - py*P2) rows, 3 leading cols
        v1 = weights[:, None] * (P[:, 0, :3] - pix[:, 0:1] * P[:, 2, :3])  # [V,3]
        v2 = weights[:, None] * (P[:, 1, :3] - pix[:, 1:2] * P[:, 2, :3])  # [V,3]
        b1 = weights * (pix[:, 0] * P[:, 2, 3] - P[:, 0, 3])
        b2 = weights * (pix[:, 1] * P[:, 2, 3] - P[:, 1, 3])
        AtA = jnp.einsum("vi,vj->ij", v1, v1) + jnp.einsum("vi,vj->ij", v2, v2)
        Atb = jnp.einsum("vi,v->i", v1, b1) + jnp.einsum("vi,v->i", v2, b2)
        # guard singular systems; validity is checked at the end
        AtA = AtA + 1e-30 * jnp.eye(3, dtype=dtype)
        return jnp.linalg.solve(AtA, Atb)

    def body(_, carry):
        weights, _ = carry
        X = solve(weights)
        z = P[:, 2, :3] @ X + P[:, 2, 3]
        safe_z = jnp.where(jnp.abs(z) > 1e-30, z, 1e-30)
        new_w = w0 / safe_z  # masked views stay at weight 0
        return new_w, X

    _, X = jax.lax.fori_loop(0, iters, body, (w0, jnp.zeros(3, dtype)))

    z = P[:, 2, :3] @ X + P[:, 2, 3]
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    min_depth = jnp.min(jnp.where(mask, z, big))
    nviews = jnp.sum(mask)
    valid = (nviews >= 2) & jnp.all(jnp.isfinite(X))
    return X, min_depth, valid


triangulate_tracks = jax.vmap(triangulate_track, in_axes=(0, 0, 0, None))


def triangulate_pair(focal1, focal2, w2c1, w2c2, pix1, pix2, iters: int = 3):
    """Two-view convenience wrapper (``TriangulatePair``,
    `interest_point.cc:374-397`)."""
    P = jnp.stack([projection_matrix(focal1, w2c1), projection_matrix(focal2, w2c2)])
    pix = jnp.stack([pix1, pix2])
    mask = jnp.ones(2, bool)
    X, _, _ = triangulate_track(P, pix, mask, iters)
    return X


def convergence_angles(w2c_poses, xyz, mask):
    """Max pairwise angle (degrees) between rays from cameras to a point.

    Used by the min-triangulation-angle outlier gate
    (`bin/rig_calibrator.cc:1045-1119`). w2c_poses: [V,7], xyz: [3], mask: [V].
    Returns the maximum convergence angle over valid view pairs (0 if <2 views).
    """
    cam_ctr = pose_mod.pose_t(pose_mod.pose_inverse(w2c_poses))  # [V,3]
    rays = xyz[None, :] - cam_ctr                                # [V,3]
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-30)
    cosang = jnp.clip(rays @ rays.T, -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(cosang))
    pair_ok = mask[:, None] & mask[None, :]
    ang = jnp.where(pair_ok, ang, 0.0)
    return jnp.max(ang)
