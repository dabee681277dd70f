"""Rig bundle-adjustment problem: state pytrees, observation tensors,
parameter packing/masking, and batched residual assembly.

This is the TPU-native redesign of the Ceres problem built by the reference
driver (`/root/reference/rig_calibrator/bin/rig_calibrator.cc:1610-1904`):
instead of per-observation cost functors over pointer-indexed parameter
blocks, the state is a pytree of dense arrays, observations are padded
tensors with index arrays, and each residual family is one vmapped JAX
function. Robustness is the square-root-of-rho formulation of the same
Cauchy loss the reference attaches to every block
(`GetLossFunction("cauchy", robust_threshold)`, rig_calibrator.cc:1684).

Residual families (parity):
- pixel reprojection  <-> BracketedCamError       (rig_calibrator.cc:419-514)
- depth-vs-triangulated <-> BracketedDepthError   (rig_calibrator.cc:522-609)
- depth-vs-mesh       <-> BracketedDepthMeshError (rig_calibrator.cc:615-705)
- xyz prior (mesh-tri and tri regularization) <-> XYZError (:709-751)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.geometry import distortion as dist_mod
from multiview_tpu.solver import losses


# ----------------------------------------------------------------------------
# State
# ----------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigState:
    """All optimizable state of a rig BA problem.

    In rig mode, ``world_to_ref`` holds one pose per *reference-sensor*
    keyframe; in no-rig mode it holds one pose per camera image (the
    reference's world_to_cam_vec, rig_calibrator.cc:857-867) and the
    bracketing degenerates.
    """

    world_to_ref: jnp.ndarray       # [R,7]
    ref_to_cam: jnp.ndarray         # [S,7] rig transforms (identity for ref sensor)
    timestamp_offsets: jnp.ndarray  # [S]
    focal: jnp.ndarray              # [S] single focal per sensor (ref: block size 1)
    optical_center: jnp.ndarray     # [S,2]
    dist: Tuple[jnp.ndarray, ...]   # per-sensor coeff vectors (static ragged lengths)
    depth_to_image: jnp.ndarray     # [S,7] rigid or [S,12] affine
    depth_scale: jnp.ndarray        # [S]
    points: jnp.ndarray             # [P,3] triangulated points

    @property
    def num_sensors(self) -> int:
        return self.focal.shape[0]

    @property
    def dtype(self):
        return self.world_to_ref.dtype


def identity_state(num_ref: int, num_sensors: int, num_points: int,
                   dist_sizes: Sequence[int], affine_depth: bool = False,
                   dtype=jnp.float64) -> RigState:
    return RigState(
        world_to_ref=jnp.tile(pose_mod.pose_identity(dtype), (num_ref, 1)),
        ref_to_cam=jnp.tile(pose_mod.pose_identity(dtype), (num_sensors, 1)),
        timestamp_offsets=jnp.zeros(num_sensors, dtype),
        focal=jnp.ones(num_sensors, dtype),
        optical_center=jnp.zeros((num_sensors, 2), dtype),
        dist=tuple(jnp.zeros(d, dtype) for d in dist_sizes),
        depth_to_image=(jnp.tile(pose_mod.affine_identity(dtype), (num_sensors, 1))
                        if affine_depth
                        else jnp.tile(pose_mod.pose_identity(dtype), (num_sensors, 1))),
        depth_scale=jnp.ones(num_sensors, dtype),
        points=jnp.zeros((num_points, 3), dtype),
    )


# ----------------------------------------------------------------------------
# Observations
# ----------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PixelObs:
    """Pixel reprojection observations for ONE sensor (static shapes).

    Index arrays address RigState fields; timestamps are pre-differenced on
    host (f32-safe small numbers): dt_cam = cam_stamp - beg_ref_stamp,
    dt_bracket = end_ref_stamp - beg_ref_stamp (0 => degenerate/no-rig/ref).
    """

    pix: jnp.ndarray             # [N,2] measured DISTORTED pixels
    beg_idx: jnp.ndarray         # [N] int32 into world_to_ref
    end_idx: jnp.ndarray         # [N]
    point_idx: jnp.ndarray       # [N] int32 into points
    dt_cam: jnp.ndarray          # [N]
    dt_bracket: jnp.ndarray      # [N]
    mask: jnp.ndarray            # [N] bool inlier mask
    dist_half_size: jnp.ndarray  # [2] distorted image half-size of this sensor

    sensor: int = dataclasses.field(metadata=dict(static=True), default=0)

    def __len__(self):
        return self.pix.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DepthObs:
    """Depth-cloud observations for one sensor: measured depth point must
    agree with the triangulated point (BracketedDepthError) and optionally
    with a mesh intersection (BracketedDepthMeshError when mesh_xyz given)."""

    depth_xyz: jnp.ndarray   # [N,3] point in depth-cloud coordinates
    beg_idx: jnp.ndarray
    end_idx: jnp.ndarray
    point_idx: jnp.ndarray
    dt_cam: jnp.ndarray
    dt_bracket: jnp.ndarray
    mask: jnp.ndarray
    mesh_xyz: Optional[jnp.ndarray] = None  # [N,3] for the mesh variant
    # mesh variant only fires where the pixel ray actually hit the mesh
    # (reference: have_depth_mesh_constraint requires mesh_xyz != bad_xyz,
    # rig_calibrator.cc:1800-1805)
    mesh_mask: Optional[jnp.ndarray] = None  # [N] bool
    # row of the matching pixel observation in the global concatenated pixel
    # ordering (host-side bookkeeping to look up per-obs mesh intersections)
    pix_row: Optional[jnp.ndarray] = None    # [N] int32

    sensor: int = dataclasses.field(metadata=dict(static=True), default=0)

    def __len__(self):
        return self.depth_xyz.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class XyzPriorObs:
    """Per-point positional priors: mesh intersections (mesh_tri) or the
    initial triangulation (tri regularization), XYZError parity."""

    ref_xyz: jnp.ndarray     # [M,3]
    point_idx: jnp.ndarray   # [M]
    mask: jnp.ndarray        # [M]


@dataclasses.dataclass(frozen=True)
class BAOptions:
    robust_threshold: float = 3.0        # FLAGS_robust_threshold default
    depth_tri_weight: float = 0.0        # FLAGS_depth_tri_weight
    depth_mesh_weight: float = 0.0       # FLAGS_depth_mesh_weight
    mesh_tri_weight: float = 0.0         # FLAGS_mesh_tri_weight
    tri_weight: float = 0.0              # FLAGS_tri_weight
    tri_robust_threshold: float = 0.1    # FLAGS_tri_robust_threshold
    affine_depth_to_image: bool = False
    no_rig: bool = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Observations:
    """All observation tensors of a problem (tuples are per-sensor)."""

    pixels: Tuple[PixelObs, ...]
    depths: Tuple[DepthObs, ...] = ()
    mesh_tri: Optional[XyzPriorObs] = None
    tri_prior: Optional[XyzPriorObs] = None


# ----------------------------------------------------------------------------
# Residual assembly
# ----------------------------------------------------------------------------


def _robustify(res_blocks, mask, loss_scale, loss: str = "cauchy"):
    """Square-root robustification: scale each residual block so its squared
    norm equals rho(|r|^2). Exact-gradient version of Ceres' loss handling.
    Masked blocks go to zero (outliers contribute nothing,
    rig_calibrator.cc:1620-1621 'deal with inliers only')."""
    s = jnp.sum(res_blocks * res_blocks, axis=-1)
    # w = sqrt(rho(s)/s), safe at s=0 where rho(s)/s -> rho'(0) = 1.
    # Both the ratio and the sqrt argument are guarded so the unselected
    # branch has finite gradients (where-NaN pitfall).
    tiny = 1e-20
    ratio = losses.rho(loss, s, loss_scale) / jnp.maximum(s, tiny)
    w = jnp.sqrt(jnp.where(s > tiny, ratio, 1.0))
    return res_blocks * (w * mask.astype(res_blocks.dtype))[..., None]


def _world_to_cam_for(state: RigState, sensor: int, beg_idx, end_idx, dt_cam, dt_bracket):
    beg = state.world_to_ref[beg_idx]
    end = state.world_to_ref[end_idx]
    rig = state.ref_to_cam[sensor]
    offset = state.timestamp_offsets[sensor]
    return jax.vmap(
        lambda b, e, dc, db: pose_mod.world_to_cam_from_bracket(b, e, rig, dc, db, offset)
    )(beg, end, dt_cam, dt_bracket)


def pixel_residuals(state: RigState, obs: PixelObs, model: str,
                    opts: BAOptions, robust: bool = True):
    """BracketedCamError for all observations of one sensor -> [N,2].

    Projection chain parity (rig_calibrator.cc:447-480): bracketed pose
    interpolation -> world point to camera frame -> undist_pix = f*hnorm ->
    UNDISTORTED_C->DISTORTED via the sensor's distortion -> subtract measured.
    """
    s = obs.sensor
    w2c = _world_to_cam_for(state, s, obs.beg_idx, obs.end_idx, obs.dt_cam, obs.dt_bracket)
    X = state.points[obs.point_idx]
    Xc = pose_mod.pose_apply(w2c, X)

    focal2 = jnp.stack([state.focal[s], state.focal[s]])
    # Guard against points behind/at the camera plane: clamping keeps
    # residuals finite; such observations are culled by the outlier gates.
    z = Xc[..., 2:3]
    z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    undist_c = focal2 * (Xc[..., :2] / z)

    dist_half = obs.dist_half_size
    pred = dist_mod.distort_centered(
        model, state.dist[s], undist_c, focal2, state.optical_center[s], dist_half)
    res = pred + dist_half - obs.pix  # DISTORTED_C -> DISTORTED, minus measurement
    if not robust:
        return res * obs.mask.astype(res.dtype)[..., None]
    return _robustify(res, obs.mask, opts.robust_threshold)


def _depth_to_cam_points(state: RigState, obs: DepthObs, opts: BAOptions):
    """depth cloud point -> camera frame: scale * depth_to_image linear part
    (rig_calibrator.cc:557-569)."""
    s = obs.sensor
    d2i = state.depth_to_image[s]
    scale = state.depth_scale[s]
    if opts.affine_depth_to_image:
        L = pose_mod.affine_linear(d2i) * scale
        t = pose_mod.affine_t(d2i)
        return jnp.einsum("ij,nj->ni", L, obs.depth_xyz) + t
    R = pose_mod.quat_to_matrix(pose_mod.pose_q(d2i)) * scale
    t = pose_mod.pose_t(d2i)
    return jnp.einsum("ij,nj->ni", R, obs.depth_xyz) + t


def depth_tri_residuals(state: RigState, obs: DepthObs, opts: BAOptions,
                        robust: bool = True):
    """BracketedDepthError -> [N,3]: weight * (X_tri - world(depth_point))."""
    s = obs.sensor
    w2c = _world_to_cam_for(state, s, obs.beg_idx, obs.end_idx, obs.dt_cam, obs.dt_bracket)
    M_cam = _depth_to_cam_points(state, obs, opts)
    M_world = pose_mod.pose_apply(pose_mod.pose_inverse(w2c), M_cam)
    X = state.points[obs.point_idx]
    res = opts.depth_tri_weight * (X - M_world)
    if not robust:
        return res * obs.mask.astype(res.dtype)[..., None]
    return _robustify(res, obs.mask, opts.robust_threshold)


def depth_mesh_residuals(state: RigState, obs: DepthObs, opts: BAOptions,
                         robust: bool = True):
    """BracketedDepthMeshError -> [N,3]: weight * (mesh_xyz - world(depth_point))."""
    s = obs.sensor
    w2c = _world_to_cam_for(state, s, obs.beg_idx, obs.end_idx, obs.dt_cam, obs.dt_bracket)
    M_cam = _depth_to_cam_points(state, obs, opts)
    M_world = pose_mod.pose_apply(pose_mod.pose_inverse(w2c), M_cam)
    mask = obs.mask
    mesh_xyz = obs.mesh_xyz
    if obs.mesh_mask is not None:
        mask = mask & obs.mesh_mask
        # NaN misses must not reach the residual even masked (0*NaN = NaN)
        mesh_xyz = jnp.where(obs.mesh_mask[:, None], mesh_xyz, 0.0)
    res = opts.depth_mesh_weight * (mesh_xyz - M_world)
    if not robust:
        return res * mask.astype(res.dtype)[..., None]
    return _robustify(res, mask, opts.robust_threshold)


def xyz_prior_residuals(state: RigState, obs: XyzPriorObs, weight: float,
                        robust_threshold: float, robust: bool = True):
    """XYZError -> [M,3]: weight * (point - ref_xyz). Cauchy when
    robust_threshold>0, plain l2 otherwise (tri prior uses
    FLAGS_tri_robust_threshold, rig_calibrator.cc:1886-1894)."""
    res = weight * (state.points[obs.point_idx] - obs.ref_xyz)
    if not robust or robust_threshold <= 0.0:
        return res * obs.mask.astype(res.dtype)[..., None]
    return _robustify(res, obs.mask, robust_threshold)


def all_residuals(state: RigState, observations: Observations, models: Sequence[str],
                  opts: BAOptions, robust: bool = True) -> jnp.ndarray:
    """Concatenated flat residual vector over every family and sensor.

    The returned vector has static length: sum over sensors of 2*N_pix +
    3*N_depth (+3*N_depth_mesh) + 3*M priors; masked entries are zero.
    """
    parts = []
    for obs in observations.pixels:
        parts.append(pixel_residuals(state, obs, models[obs.sensor], opts, robust).ravel())
    for obs in observations.depths:
        if opts.depth_tri_weight > 0.0:
            parts.append(depth_tri_residuals(state, obs, opts, robust).ravel())
        if obs.mesh_xyz is not None and opts.depth_mesh_weight > 0.0:
            parts.append(depth_mesh_residuals(state, obs, opts, robust).ravel())
    if observations.mesh_tri is not None and opts.mesh_tri_weight > 0.0:
        parts.append(xyz_prior_residuals(state, observations.mesh_tri,
                                         opts.mesh_tri_weight, opts.robust_threshold,
                                         robust).ravel())
    if observations.tri_prior is not None and opts.tri_weight > 0.0:
        parts.append(xyz_prior_residuals(state, observations.tri_prior,
                                         opts.tri_weight, opts.tri_robust_threshold,
                                         robust).ravel())
    return jnp.concatenate(parts)


# ----------------------------------------------------------------------------
# Packing + masks (SetParameterBlockConstant -> boolean mask)
# ----------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FloatSpec:
    """Which parameter groups to optimize; everything else stays frozen —
    mirroring the reference's default-constant blocks + float flags
    (rig_calibrator.cc:150-180, 1702-1752). Points are always free."""

    cam_poses: bool = False             # camera_poses_to_float (ref sensor / no-rig poses)
    rig_transforms: object = False      # bool (all non-ref) or sensor-index list
    focal: Sequence[int] = ()           # sensors whose focal_length floats
    optical_center: Sequence[int] = ()
    distortion: Sequence[int] = ()
    timestamp_offsets: bool = False     # FLAGS_float_timestamp_offsets
    depth_to_image: Sequence[int] = ()  # depth_to_image_transforms_to_float
    depth_scale: bool = False           # FLAGS_float_scale
    # No-rig mode only: sensor types whose per-image poses float (the
    # reference checks each cam's own sensor name, rig_calibrator.cc:1725).
    # Requires entry_sensors in build_mask; overrides cam_poses when set.
    cam_pose_sensors: Optional[Sequence[int]] = None


def pack_state(state: RigState, include_points: bool = True) -> jnp.ndarray:
    parts = [state.world_to_ref.ravel(), state.ref_to_cam.ravel(),
             state.timestamp_offsets, state.focal, state.optical_center.ravel()]
    parts += [d for d in state.dist]
    parts += [state.depth_to_image.ravel(), state.depth_scale]
    if include_points:
        parts.append(state.points.ravel())
    return jnp.concatenate(parts)


def unpack_state(vec: jnp.ndarray, template: RigState,
                 include_points: bool = True) -> RigState:
    idx = 0

    def take(shape):
        nonlocal idx
        n = int(np.prod(shape))
        out = vec[idx:idx + n].reshape(shape)
        idx += n
        return out

    world_to_ref = take(template.world_to_ref.shape)
    ref_to_cam = take(template.ref_to_cam.shape)
    offsets = take(template.timestamp_offsets.shape)
    focal = take(template.focal.shape)
    ctr = take(template.optical_center.shape)
    dist = tuple(take(d.shape) for d in template.dist)
    d2i = take(template.depth_to_image.shape)
    dscale = take(template.depth_scale.shape)
    points = take(template.points.shape) if include_points else template.points
    return RigState(world_to_ref, ref_to_cam, offsets, focal, ctr, dist, d2i,
                    dscale, points)


def build_mask(state: RigState, spec: FloatSpec, ref_sensor: int = 0,
               no_rig: bool = False, include_points: bool = True,
               entry_sensors: Optional[np.ndarray] = None,
               models: Optional[Sequence[str]] = None) -> np.ndarray:
    """Boolean free-parameter mask aligned with pack_state order.

    ``entry_sensors`` (no-rig mode): [R] sensor type of each world_to_ref
    entry; with spec.cam_pose_sensors it gives per-sensor pose floating.

    ``models``: per-sensor distortion model names. For an ``rpc`` sensor only
    the forward (distort) half of the coefficient vector floats — the inverse
    half never enters any residual (only ``distort_centered`` is autodiffed,
    geometry/distortion.py), so floating it would silently leave it stale.
    The reference instead refits the inverse after every optimization pass
    (``updateRpcUndistortion``, rig_calibrator.cc:1944-1948); the calibrator
    mirrors that with a post-pass ``fit_rpc_undist`` call.
    """
    S = state.num_sensors
    if no_rig and spec.cam_pose_sensors is not None and entry_sensors is not None:
        per_entry = np.isin(np.asarray(entry_sensors), list(spec.cam_pose_sensors))
        m_poses = np.repeat(per_entry[:, None], state.world_to_ref.shape[1], axis=1)
    else:
        m_poses = np.full(state.world_to_ref.shape, spec.cam_poses)
    m_rig = np.zeros(state.ref_to_cam.shape, bool)
    if not no_rig:
        if spec.rig_transforms is True:
            m_rig[:] = True
        elif spec.rig_transforms:  # sensor-index list
            m_rig[list(spec.rig_transforms)] = True
        m_rig[ref_sensor] = False  # ref stays identity (rig_calibrator.cc:1748-1752)
    m_off = np.zeros(S, bool)
    if spec.timestamp_offsets and not no_rig:
        m_off[:] = True
        m_off[ref_sensor] = False
    m_focal = np.zeros(S, bool)
    m_focal[list(spec.focal)] = True
    m_ctr = np.zeros((S, 2), bool)
    m_ctr[list(spec.optical_center)] = True
    m_dist = [np.zeros(d.shape, bool) for d in state.dist]
    for s in spec.distortion:
        if models is not None and models[s] == "rpc":
            m_dist[s][:len(m_dist[s]) // 2] = True
        else:
            m_dist[s][:] = True
    m_d2i = np.zeros(state.depth_to_image.shape, bool)
    m_d2i[list(spec.depth_to_image)] = True
    m_dscale = np.full(S, spec.depth_scale)

    parts = [m_poses.ravel(), m_rig.ravel(), m_off, m_focal, m_ctr.ravel()]
    parts += [m.ravel() for m in m_dist]
    parts += [m_d2i.ravel(), m_dscale]
    if include_points:
        parts.append(np.ones(state.points.shape, bool).ravel())
    return np.concatenate(parts)
