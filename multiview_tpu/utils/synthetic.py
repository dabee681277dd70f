"""Synthetic calibration scenes with known ground truth.

The test strategy replacement for the reference's absent test suite
(SURVEY.md section 4): cube scenes with known rigs and distortions drive
unit/integration tests and benchmarks.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.calib import problem as prob


def look_at_pose(cam_pos: np.ndarray, target: np.ndarray, up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """world->cam pose (7,) with +z toward target."""
    cam_pos = np.asarray(cam_pos, float)
    z = np.asarray(target, float) - cam_pos
    z = z / np.linalg.norm(z)
    up = np.asarray(up, float)
    if abs(np.dot(up, z)) > 0.98:
        up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R_w2c = np.stack([x, y, z], axis=1).T
    t = -R_w2c @ cam_pos
    return np.asarray(pose_mod.make_pose(jnp.asarray(t), pose_mod.matrix_to_quat(jnp.asarray(R_w2c))))


def cube_points(n_per_face: int = 4, half: float = 0.5, seed: int = 0) -> np.ndarray:
    """Points jittered on the faces of a cube centered at origin."""
    rng = np.random.default_rng(seed)
    pts = []
    for axis in range(3):
        for sign in (-1.0, 1.0):
            uv = rng.uniform(-half, half, size=(n_per_face * n_per_face, 2))
            face = np.zeros((len(uv), 3))
            other = [a for a in range(3) if a != axis]
            face[:, other[0]] = uv[:, 0]
            face[:, other[1]] = uv[:, 1]
            face[:, axis] = sign * half
            pts.append(face)
    return np.concatenate(pts)


def ring_poses(n: int, radius: float = 3.0, height: float = 1.0,
               target=(0.0, 0.0, 0.0)) -> np.ndarray:
    """n world->cam poses on a ring looking at the target."""
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        pos = np.array([radius * np.cos(a), radius * np.sin(a), height])
        poses.append(look_at_pose(pos, np.asarray(target)))
    return np.stack(poses)


@dataclasses.dataclass
class CubeScene:
    """A single-sensor no-rig BA scene (BASELINE config 1)."""

    true_state: prob.RigState
    observations: prob.Observations
    models: Tuple[str, ...]
    image_size: Tuple[int, int]
    n_images: int
    n_points: int


def make_cube_scene(
    n_images: int = 10,
    n_per_face: int = 4,
    image_size: Tuple[int, int] = (1280, 960),
    focal: float = 600.0,
    dist_coeffs: Sequence[float] = (),
    pix_noise: float = 0.0,
    seed: int = 0,
    dtype=jnp.float64,
) -> CubeScene:
    """Generate a cube scene with all points observed in all images
    (fixed matches, the reference's config-1 equivalent)."""
    rng = np.random.default_rng(seed)
    pts = cube_points(n_per_face, seed=seed)
    P = len(pts)
    w2c = ring_poses(n_images)

    model = dist_mod_name(len(dist_coeffs))
    state = prob.RigState(
        world_to_ref=jnp.asarray(w2c, dtype),
        ref_to_cam=jnp.asarray(np.tile([0, 0, 0, 0, 0, 0, 1.0], (1, 1)), dtype),
        timestamp_offsets=jnp.zeros(1, dtype),
        focal=jnp.asarray([focal], dtype),
        optical_center=jnp.asarray([[image_size[0] / 2.0, image_size[1] / 2.0]], dtype),
        dist=(jnp.asarray(np.asarray(dist_coeffs, float), dtype),),
        depth_to_image=jnp.asarray(np.tile([0, 0, 0, 0, 0, 0, 1.0], (1, 1)), dtype),
        depth_scale=jnp.ones(1, dtype),
        points=jnp.asarray(pts, dtype),
    )

    # visibility: keep points in front of the camera and inside the image
    beg_idx, point_idx, pix_list = [], [], []
    opts = prob.BAOptions()
    half = np.asarray(image_size, float) / 2.0
    for cid in range(n_images):
        obs_tmp = prob.PixelObs(
            pix=jnp.zeros((P, 2), dtype),
            beg_idx=jnp.full(P, cid, jnp.int32),
            end_idx=jnp.full(P, cid, jnp.int32),
            point_idx=jnp.arange(P, dtype=jnp.int32),
            dt_cam=jnp.zeros(P, dtype),
            dt_bracket=jnp.zeros(P, dtype),
            mask=jnp.ones(P, bool),
            dist_half_size=jnp.asarray(half, dtype),
            sensor=0)
        res = prob.pixel_residuals(state, obs_tmp, model, opts, robust=False)
        pred = np.asarray(res) + np.zeros((P, 2))  # residual vs 0 = predicted pix
        Xc = np.asarray(pose_mod.pose_apply(state.world_to_ref[cid], state.points))
        vis = (Xc[:, 2] > 0.2) & np.all((pred >= 0) & (pred < image_size), axis=-1)
        ids = np.nonzero(vis)[0]
        beg_idx.append(np.full(len(ids), cid))
        point_idx.append(ids)
        pix_list.append(pred[ids] + pix_noise * rng.normal(size=(len(ids), 2)))

    beg = np.concatenate(beg_idx).astype(np.int32)
    pid = np.concatenate(point_idx).astype(np.int32)
    pix = np.concatenate(pix_list)

    obs = prob.PixelObs(
        pix=jnp.asarray(pix, dtype),
        beg_idx=jnp.asarray(beg),
        end_idx=jnp.asarray(beg),
        point_idx=jnp.asarray(pid),
        dt_cam=jnp.zeros(len(beg), dtype),
        dt_bracket=jnp.zeros(len(beg), dtype),
        mask=jnp.ones(len(beg), bool),
        dist_half_size=jnp.asarray(half, dtype),
        sensor=0)

    return CubeScene(
        true_state=state,
        observations=prob.Observations(pixels=(obs,)),
        models=(model,),
        image_size=image_size,
        n_images=n_images,
        n_points=P)


def dist_mod_name(n: int) -> str:
    from multiview_tpu.geometry.distortion import model_from_num_coeffs
    return model_from_num_coeffs(n)


def perturb_state(state: prob.RigState, pose_rot: float = 0.01, pose_trans: float = 0.02,
                  point_sigma: float = 0.02, seed: int = 1) -> prob.RigState:
    """Random perturbation of poses and points (the optimizer's starting point)."""
    rng = np.random.default_rng(seed)
    n = state.world_to_ref.shape[0]
    dq = pose_mod.quat_exp(jnp.asarray(rng.normal(size=(n, 3)) * pose_rot, state.dtype))
    dt = jnp.asarray(rng.normal(size=(n, 3)) * pose_trans, state.dtype)
    deltas = pose_mod.make_pose(dt, dq)
    new_poses = pose_mod.pose_compose(deltas, state.world_to_ref)
    new_points = state.points + jnp.asarray(
        rng.normal(size=state.points.shape) * point_sigma, state.dtype)
    return dataclasses.replace(state, world_to_ref=new_poses, points=new_points)


# ----------------------------------------------------------------------------
# Rig scenes (BASELINE config 2): multi-sensor, bracketed timestamps
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class RigScene:
    """A multi-sensor rig BA scene with bracketed timestamps."""

    true_state: prob.RigState
    observations: prob.Observations
    models: Tuple[str, ...]
    image_sizes: Tuple[Tuple[int, int], ...]
    ref_timestamps: np.ndarray
    cams: list                   # List[CameraEntry]
    n_points: int


def smooth_ring_pose(t: float, period: float = 16.0, radius: float = 3.0,
                     height: float = 1.0) -> np.ndarray:
    """world->cam pose moving smoothly on a ring, looking at the origin."""
    a = 2.0 * np.pi * t / period
    pos = np.array([radius * np.cos(a), radius * np.sin(a),
                    height + 0.3 * np.sin(a * 2)])
    return look_at_pose(pos, np.zeros(3))


def make_rig_scene(
    n_ref: int = 10,
    sensor_specs=None,
    n_per_face: int = 4,
    pix_noise: float = 0.0,
    seed: int = 0,
    bracket_len: float = 1.5,
    dtype=jnp.float64,
) -> RigScene:
    """Generate a rig scene: a reference sensor at integer timestamps plus
    non-ref sensors with true timestamp offsets and rig transforms; non-ref
    poses follow the model exactly (rig * slerp-interp of world_to_ref), so
    the calibrator can recover the rig to machine precision.

    sensor_specs: list of dicts with keys name, focal, size, dist, offset,
    rig (pose 7) — index 0 is the reference sensor.
    """
    from multiview_tpu.calib import bracketing as br

    rng = np.random.default_rng(seed)
    if sensor_specs is None:
        sensor_specs = [
            dict(name="nav_cam", focal=600.0, size=(1280, 960), dist=(),
                 offset=0.0, rig=np.array([0, 0, 0, 0, 0, 0, 1.0])),
            dict(name="haz_cam", focal=250.0, size=(640, 480),
                 dist=(-0.15, 0.03, 1e-4, -1e-4),
                 offset=0.3,
                 rig=np.asarray(pose_mod.make_pose(
                     jnp.asarray([0.1, 0.02, -0.05]),
                     pose_mod.quat_exp(jnp.asarray([0.05, -0.03, 0.08]))))),
            dict(name="sci_cam", focal=900.0, size=(960, 720), dist=(0.9,),
                 offset=-0.2,
                 rig=np.asarray(pose_mod.make_pose(
                     jnp.asarray([-0.08, 0.05, 0.03]),
                     pose_mod.quat_exp(jnp.asarray([-0.04, 0.06, -0.02]))))),
        ]

    S = len(sensor_specs)
    ref_ts = np.arange(n_ref, dtype=float)
    world_to_ref = np.stack([smooth_ring_pose(t) for t in ref_ts])

    # image streams: ref at ref_ts; sensor s at mid-bracket + offset
    image_data = [[br.ImageRecord(t, f"{sensor_specs[0]['name']}/{t:.1f}.jpg")
                   for t in ref_ts]]
    for s in range(1, S):
        ts = ref_ts[:-1] + 0.5 + sensor_specs[s]["offset"]
        image_data.append([br.ImageRecord(t, f"{sensor_specs[s]['name']}/{t:.1f}.jpg")
                           for t in ts])

    offsets = np.array([spec["offset"] for spec in sensor_specs])
    cams, min_off, max_off = br.lookup_images(
        False, ref_ts, image_data, [], offsets, bracket_len=bracket_len)

    pts = cube_points(n_per_face, seed=seed)
    P = len(pts)

    rig = np.stack([np.asarray(spec["rig"]) for spec in sensor_specs])
    state = prob.RigState(
        world_to_ref=jnp.asarray(world_to_ref, dtype),
        ref_to_cam=jnp.asarray(rig, dtype),
        timestamp_offsets=jnp.asarray(offsets, dtype),
        focal=jnp.asarray([spec["focal"] for spec in sensor_specs], dtype),
        optical_center=jnp.asarray(
            [[spec["size"][0] / 2.0, spec["size"][1] / 2.0] for spec in sensor_specs],
            dtype),
        dist=tuple(jnp.asarray(np.asarray(spec["dist"], float), dtype)
                   for spec in sensor_specs),
        depth_to_image=jnp.tile(pose_mod.pose_identity(dtype), (S, 1)),
        depth_scale=jnp.ones(S, dtype),
        points=jnp.asarray(pts, dtype),
    )
    models = tuple(dist_mod_name(len(spec["dist"])) for spec in sensor_specs)

    # per-sensor observation rows from the bracketed camera entries
    opts = prob.BAOptions()
    rows = {s: dict(pix=[], beg=[], end=[], pid=[], dtc=[], dtb=[]) for s in range(S)}
    for cam in cams:
        s = cam.camera_type
        beg, end = cam.beg_ref_index, cam.end_ref_index
        dt_cam = cam.timestamp - ref_ts[beg]
        dt_bracket = ref_ts[end] - ref_ts[beg]
        w2c = pose_mod.world_to_cam_from_bracket(
            state.world_to_ref[beg], state.world_to_ref[end], state.ref_to_cam[s],
            jnp.asarray(dt_cam, dtype), jnp.asarray(dt_bracket, dtype),
            state.timestamp_offsets[s])
        Xc = np.asarray(pose_mod.pose_apply(w2c, state.points))
        size = sensor_specs[s]["size"]
        half = np.asarray(size, float) / 2.0
        focal2 = jnp.stack([state.focal[s], state.focal[s]])
        und = focal2 * (jnp.asarray(Xc[:, :2]) / jnp.asarray(Xc[:, 2:3]))
        from multiview_tpu.geometry import distortion as dist_mod2
        pred_c = dist_mod2.distort_centered(models[s], state.dist[s], und, focal2,
                                            state.optical_center[s],
                                            jnp.asarray(half, dtype))
        pred = np.asarray(pred_c) + half
        vis = (Xc[:, 2] > 0.2) & np.all((pred >= 0) & (pred < size), axis=-1)
        ids = np.nonzero(vis)[0]
        rows[s]["pix"].append(pred[ids] + pix_noise * rng.normal(size=(len(ids), 2)))
        rows[s]["beg"].append(np.full(len(ids), beg))
        rows[s]["end"].append(np.full(len(ids), end))
        rows[s]["pid"].append(ids)
        rows[s]["dtc"].append(np.full(len(ids), dt_cam))
        rows[s]["dtb"].append(np.full(len(ids), dt_bracket))

    pixel_obs = []
    for s in range(S):
        if not rows[s]["pix"]:
            continue
        half = np.asarray(sensor_specs[s]["size"], float) / 2.0
        pixel_obs.append(prob.PixelObs(
            pix=jnp.asarray(np.concatenate(rows[s]["pix"]), dtype),
            beg_idx=jnp.asarray(np.concatenate(rows[s]["beg"]).astype(np.int32)),
            end_idx=jnp.asarray(np.concatenate(rows[s]["end"]).astype(np.int32)),
            point_idx=jnp.asarray(np.concatenate(rows[s]["pid"]).astype(np.int32)),
            dt_cam=jnp.asarray(np.concatenate(rows[s]["dtc"]), dtype),
            dt_bracket=jnp.asarray(np.concatenate(rows[s]["dtb"]), dtype),
            mask=jnp.ones(sum(len(p) for p in rows[s]["pix"]), bool),
            dist_half_size=jnp.asarray(half, dtype),
            sensor=s))

    return RigScene(
        true_state=state,
        observations=prob.Observations(pixels=tuple(pixel_obs)),
        models=models,
        image_sizes=tuple(spec["size"] for spec in sensor_specs),
        ref_timestamps=ref_ts,
        cams=cams,
        n_points=P)


def perturb_rig_state(state: prob.RigState, rig_rot: float = 0.02,
                      rig_trans: float = 0.03, seed: int = 1, **kw) -> prob.RigState:
    """Perturb rig transforms (non-ref sensors) on top of perturb_state."""
    out = perturb_state(state, seed=seed, **kw)
    rng = np.random.default_rng(seed + 100)
    S = state.ref_to_cam.shape[0]
    dq = pose_mod.quat_exp(jnp.asarray(rng.normal(size=(S, 3)) * rig_rot, state.dtype))
    dt = jnp.asarray(rng.normal(size=(S, 3)) * rig_trans, state.dtype)
    deltas = pose_mod.make_pose(dt, dq)
    new_rig = pose_mod.pose_compose(deltas, state.ref_to_cam)
    # sensor 0 stays identity
    new_rig = new_rig.at[0].set(pose_mod.pose_identity(state.dtype))
    return dataclasses.replace(out, ref_to_cam=new_rig)


def add_depth_observations(scene: RigScene, sensors=(1,), subsample: int = 2,
                           depth_noise: float = 0.0,
                           depth_to_image=None, depth_scale=None,
                           seed: int = 7) -> RigScene:
    """Attach synthetic depth-cloud observations to a rig scene.

    For each pixel observation of the chosen sensors (subsampled), the depth
    measurement is the true point expressed in depth-cloud coordinates:
    depth_xyz = (scale*R)^-1 (X_cam - t) with the sensor's depth_to_image
    transform — consistent with BracketedDepthError's model
    (rig_calibrator.cc:557-572).
    """
    rng = np.random.default_rng(seed)
    st = scene.true_state
    if depth_to_image is not None or depth_scale is not None:
        st = dataclasses.replace(
            st,
            depth_to_image=(st.depth_to_image if depth_to_image is None
                            else jnp.asarray(depth_to_image, st.dtype)),
            depth_scale=(st.depth_scale if depth_scale is None
                         else jnp.asarray(depth_scale, st.dtype)))

    depth_obs = []
    pix_offsets = {}
    acc = 0
    for obs in scene.observations.pixels:
        pix_offsets[obs.sensor] = acc
        acc += len(obs)
    for obs in scene.observations.pixels:
        s = obs.sensor
        if s not in sensors:
            continue
        rows = np.arange(len(obs))[::subsample]
        beg = jnp.asarray(np.asarray(obs.beg_idx)[rows])
        end = jnp.asarray(np.asarray(obs.end_idx)[rows])
        pid = jnp.asarray(np.asarray(obs.point_idx)[rows])
        dtc = jnp.asarray(np.asarray(obs.dt_cam)[rows])
        dtb = jnp.asarray(np.asarray(obs.dt_bracket)[rows])

        w2c = jax.vmap(
            lambda b, e, dc, db: pose_mod.world_to_cam_from_bracket(
                st.world_to_ref[b], st.world_to_ref[e], st.ref_to_cam[s],
                dc, db, st.timestamp_offsets[s])
        )(beg, end, dtc, dtb)
        Xc = pose_mod.pose_apply(w2c, st.points[pid])
        R = pose_mod.quat_to_matrix(pose_mod.pose_q(st.depth_to_image[s]))
        L = R * st.depth_scale[s]
        t = pose_mod.pose_t(st.depth_to_image[s])
        depth_xyz = jnp.einsum("ij,nj->ni", jnp.linalg.inv(L), Xc - t)
        depth_xyz = depth_xyz + jnp.asarray(
            rng.normal(size=depth_xyz.shape) * depth_noise, st.dtype)

        depth_obs.append(prob.DepthObs(
            depth_xyz=depth_xyz, beg_idx=beg, end_idx=end, point_idx=pid,
            dt_cam=dtc, dt_bracket=dtb,
            mask=jnp.ones(len(rows), bool), mesh_xyz=None,
            pix_row=jnp.asarray(rows + pix_offsets[s], jnp.int32), sensor=s))

    new_obs = dataclasses.replace(scene.observations, depths=tuple(depth_obs))
    return dataclasses.replace(scene, true_state=st, observations=new_obs)
