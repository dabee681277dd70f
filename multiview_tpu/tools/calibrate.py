"""``calibrate`` tool — the rig_calibrator executable equivalent
(`/root/reference/rig_calibrator/bin/rig_calibrator.cc`), with the same core
flags: rig config + camera poses (+ images for feature matching), multi-pass
robust BA with float specs, optional registration, reference-format outputs
(rig_config.txt / cameras.txt / cameras.nvm).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--rig_config", required=True)
    p.add_argument("--camera_poses", help="cameras.txt with initial world_to_cam")
    p.add_argument("--nvm", help="NVM with initial poses+matches (alternative)")
    p.add_argument("--images", help="image dir (<sensor>/<timestamp>.ext) for "
                                    "feature detection+matching")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--no_rig", action="store_true")
    p.add_argument("--num_iterations", type=int, default=20)
    p.add_argument("--calibrator_num_passes", type=int, default=2)
    p.add_argument("--robust_threshold", type=float, default=3.0)
    p.add_argument("--bracket_len", type=float, default=0.6)
    p.add_argument("--timestamp_offsets_max_change", type=float, default=1.0)
    p.add_argument("--intrinsics_to_float", default="",
                   help="e.g. 'focal_length optical_center distortion'")
    p.add_argument("--camera_poses_to_float", action="store_true")
    p.add_argument("--rig_transforms_to_float", action="store_true")
    p.add_argument("--float_timestamp_offsets", action="store_true")
    p.add_argument("--float_scale", action="store_true")
    p.add_argument("--depth_to_image_transforms_to_float", action="store_true")
    p.add_argument("--depth_tri_weight", type=float, default=0.0)
    p.add_argument("--mesh", help="PLY mesh for mesh-based constraints")
    p.add_argument("--mesh_tri_weight", type=float, default=0.0)
    p.add_argument("--out_texture_dir", default="",
                   help="project the mesh into every optimized camera and "
                        "write per-camera textured OBJs there "
                        "(meshProjectCameras, rig_calibrator.cc --out_texture_dir)")
    p.add_argument("--min_ray_dist", type=float, default=0.0)
    p.add_argument("--max_ray_dist", type=float, default=100.0)
    p.add_argument("--tri_weight", type=float, default=0.0)
    p.add_argument("--tri_robust_threshold", type=float, default=0.1)
    p.add_argument("--min_triangulation_angle", type=float, default=0.5)
    p.add_argument("--max_reprojection_error", type=float, default=25.0)
    p.add_argument("--num_overlaps", type=int, default=2)
    p.add_argument("--max_features", type=int, default=1000)
    p.add_argument("--use_initial_rig_transforms", action="store_true")
    p.add_argument("--registration", action="store_true")
    p.add_argument("--hugin_file")
    p.add_argument("--xyz_file")
    p.add_argument("--save_nvm", action="store_true")
    p.add_argument("--save_matches", action="store_true",
                   help="export inlier matches as ASP .match files")
    p.add_argument("--verbose", action="store_true")


def run(args):
    import jax.numpy as jnp
    from multiview_tpu.io import rig_config as rc, nvm as nvm_io
    from multiview_tpu.calib import bracketing as br, assemble, rig_init
    from multiview_tpu.calib import problem as prob, calibrator as cal
    from multiview_tpu.geometry import pose as pose_mod
    from multiview_tpu.sfm import pipeline as fe
    from multiview_tpu.sfm.tracks import TrackSet
    from multiview_tpu.tools import common

    rig = rc.read_rig_config(args.rig_config)
    sensor_names = [s.name for s in rig.sensors]
    cam_params = [common.cam_params_from_sensor(s) for s in rig.sensors]
    print(f"Read rig with sensors: {sensor_names}")

    # ---- initial poses ----
    if args.camera_poses:
        pose_names, pose_mats = nvm_io.read_camera_poses(args.camera_poses)
    elif args.nvm:
        nvm = nvm_io.read_nvm(args.nvm)
        pose_names, pose_mats = nvm.cid_to_filename, nvm.world_to_cam
    else:
        raise SystemExit("Provide --camera_poses or --nvm")
    name_to_pose = {n: m for n, m in zip(pose_names, pose_mats)}
    name_to_pose.update({Path(n).name: m for n, m in zip(pose_names, pose_mats)})

    # ---- images + bracketing ----
    image_data = common.scan_image_dir(args.images, sensor_names) if args.images \
        else None
    if image_data is None:
        # derive records from the pose list names: <sensor>/<timestamp>.ext
        image_data = [[] for _ in sensor_names]
        for n in pose_names:
            parts = Path(n)
            sensor = parts.parent.name
            ts = float(parts.stem)
            image_data[sensor_names.index(sensor)].append(
                br.ImageRecord(ts, n, None))
        for recs in image_data:
            recs.sort(key=lambda r: r.timestamp)

    depth_data = common.scan_depth_dir(args.images, sensor_names) if args.images \
        else []
    ref_ts_stream = [r.timestamp for r in image_data[0]]
    offsets = [s.timestamp_offset for s in rig.sensors]
    cams, min_off, max_off = br.lookup_images(
        args.no_rig, ref_ts_stream, image_data, depth_data, offsets,
        bracket_len=args.bracket_len,
        timestamp_offsets_max_change=args.timestamp_offsets_max_change,
        verbose=True)
    print(f"Bracketing kept {len(cams)} camera entries")

    # raw images shot above the calibrated resolution are area-downsampled
    # to the calibrated dims (adjustImageSize, dense_map_utils.cc:1797)
    from multiview_tpu.utils import images as img_utils
    for c in cams:
        if c.image is not None:
            c.image = img_utils.adjust_image_size(
                rig.sensors[c.camera_type].image_size, c.image)

    w2c_entries = np.stack([
        assemble.affine_to_pose(name_to_pose[c.image_name])
        if c.image_name in name_to_pose
        else assemble.affine_to_pose(name_to_pose[Path(c.image_name).name])
        for c in cams])

    ref_stamps, world_to_ref, _ = assemble.ref_data_from_entries(cams, w2c_entries)

    # ---- rig init ----
    if not args.use_initial_rig_transforms and not args.no_rig:
        rig_poses = rig_init.calc_rig_using_world_to_cam(
            len(sensor_names), cams, world_to_ref, w2c_entries, ref_stamps,
            np.asarray(offsets))
        for s, sensor in enumerate(rig.sensors):
            sensor.ref_to_sensor = np.asarray(
                pose_mod.pose_to_matrix(jnp.asarray(rig_poses[s])))

    # ---- tracks ----
    if args.images:
        images = [c.image for c in cams]
        cfg = fe.FrontendConfig(max_features=args.max_features,
                                num_overlaps=args.num_overlaps)
        trackset = fe.detect_match_features(images, cfg)
    elif args.nvm:
        # tracks straight from the NVM (appendMatchesFromNvm role)
        nvm_cid_of = {}
        for cid_entry, c in enumerate(cams):
            for ncid, n in enumerate(pose_names):
                if n == c.image_name or Path(n).name == Path(c.image_name).name:
                    nvm_cid_of[ncid] = cid_entry
        kps = []
        for cid_entry, c in enumerate(cams):
            kps.append(np.zeros((0, 2)))
        tracks = []
        # keypoints in NVM are optical-center-offset; undo per sensor
        kp_lists = [dict() for _ in cams]
        for cid_fid in nvm.pid_to_cid_fid:
            tr = {}
            for ncid, fid in cid_fid.items():
                if ncid not in nvm_cid_of:
                    continue
                e = nvm_cid_of[ncid]
                kp = nvm.cid_to_keypoint[ncid][fid] + np.asarray(
                    rig.sensors[cams[e].camera_type].optical_center)
                kp_lists[e][len(kp_lists[e])] = kp
                tr[e] = len(kp_lists[e]) - 1
            if len(tr) >= 2:
                tracks.append(tr)
        kps = [np.stack([d[i] for i in range(len(d))]) if d else np.zeros((0, 2))
               for d in kp_lists]
        trackset = TrackSet(kps, tracks)
    else:
        raise SystemExit("Provide --images for matching or --nvm with matches")
    print(f"Built {len(trackset.tracks)} tracks")

    observations, num_points = assemble.build_observations(
        rig, cams, ref_stamps, trackset, no_rig=args.no_rig)
    if args.depth_tri_weight > 0.0:
        import dataclasses as _dc
        depth_obs = assemble.build_depth_observations(
            rig, cams, ref_stamps, trackset, no_rig=args.no_rig)
        if depth_obs:
            observations = _dc.replace(observations, depths=depth_obs)
            print(f"Attached {sum(len(o) for o in depth_obs)} depth measurements")
    state = assemble.build_state(rig, cams, w2c_entries, ref_stamps,
                                 world_to_ref, num_points, no_rig=args.no_rig)

    intr = set(args.intrinsics_to_float.split())
    all_s = tuple(range(len(sensor_names)))
    spec = prob.FloatSpec(
        cam_poses=args.camera_poses_to_float,
        rig_transforms=args.rig_transforms_to_float,
        focal=all_s if "focal_length" in intr else (),
        optical_center=all_s if "optical_center" in intr else (),
        distortion=all_s if "distortion" in intr else (),
        timestamp_offsets=args.float_timestamp_offsets,
        depth_to_image=all_s if args.depth_to_image_transforms_to_float else (),
        depth_scale=args.float_scale)
    opts = prob.BAOptions(
        robust_threshold=args.robust_threshold, no_rig=args.no_rig,
        depth_tri_weight=args.depth_tri_weight, tri_weight=args.tri_weight,
        mesh_tri_weight=args.mesh_tri_weight,
        tri_robust_threshold=args.tri_robust_threshold)

    mesh_tri_verts = None
    if args.mesh:
        from multiview_tpu.io import ply as ply_io
        from multiview_tpu.texture.raycast import mesh_tri_verts as soup
        mesh_data = ply_io.read_ply(args.mesh)
        mesh_tri_verts = soup(mesh_data["vertices"], mesh_data["faces"])
        print(f"Loaded mesh with {len(mesh_tri_verts)} triangles for constraints")

    bounds = np.stack([min_off, max_off], axis=1) if args.float_timestamp_offsets \
        else None
    models = tuple(s.model for s in rig.sensors)
    result = cal.optimize_rig(
        state, observations, models, spec, opts,
        num_passes=args.calibrator_num_passes,
        num_iterations=args.num_iterations,
        min_triangulation_angle=args.min_triangulation_angle,
        max_reprojection_error=args.max_reprojection_error,
        timestamp_offset_bounds=bounds,
        mesh_tri_verts=mesh_tri_verts,
        min_ray_dist=args.min_ray_dist, max_ray_dist=args.max_ray_dist,
        sensor_names=sensor_names, verbose=True)
    state = result.state

    # ---- world_to_cam from the optimized state ----
    w2c_final = rig_init.calc_world_to_cam_using_rig(
        cams, np.asarray(state.world_to_ref), ref_stamps,
        np.asarray(state.ref_to_cam), np.asarray(state.timestamp_offsets)) \
        if not args.no_rig else np.asarray(state.world_to_ref)

    # ---- registration ----
    if args.registration:
        if not (args.hugin_file and args.xyz_file):
            raise SystemExit("--registration needs --hugin_file and --xyz_file")
        from multiview_tpu.calib import registration as reg_wire
        state, scale, err = reg_wire.register_from_files(
            state, args.hugin_file, args.xyz_file,
            [c.image_name for c in cams], w2c_final,
            [c.camera_type for c in cams], cam_params)
        w2c_final = rig_init.calc_world_to_cam_using_rig(
            cams, np.asarray(state.world_to_ref), ref_stamps,
            np.asarray(state.ref_to_cam), np.asarray(state.timestamp_offsets)) \
            if not args.no_rig else np.asarray(state.world_to_ref)

    # ---- outputs ----
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for s, sensor in enumerate(rig.sensors):
        sensor.focal_length = float(state.focal[s])
        sensor.optical_center = np.asarray(state.optical_center[s])
        sensor.distortion = np.asarray(state.dist[s])
        sensor.ref_to_sensor = np.asarray(
            pose_mod.pose_to_matrix(state.ref_to_cam[s]))
        d2i = np.array(pose_mod.pose_to_matrix(state.depth_to_image[s]))
        d2i[:3, :3] *= float(state.depth_scale[s])
        sensor.depth_to_image = d2i
        sensor.timestamp_offset = float(state.timestamp_offsets[s])
    rc.write_rig_config(out / "rig_config.txt", rig)
    print(f"Writing: {out/'rig_config.txt'}")

    mats = np.asarray(pose_mod.pose_to_matrix(jnp.asarray(w2c_final)))
    nvm_io.write_camera_poses(out / "cameras.txt",
                              [c.image_name for c in cams], mats)
    print(f"Writing: {out/'cameras.txt'}")

    if args.save_nvm:
        _write_solution_nvm(out / "cameras.nvm", rig, cams, state, mats,
                            trackset, result.observations)
        print(f"Writing: {out/'cameras.nvm'}")

    if args.out_texture_dir:
        # per-camera forward projection of the constraint mesh with the
        # optimized cameras (rig_calibrator.cc:2008-2016 -> meshProjectCameras)
        if not args.mesh:
            raise SystemExit("--out_texture_dir needs --mesh")
        if not args.images:
            raise SystemExit("--out_texture_dir needs --images")
        from multiview_tpu.texture import mesh_project as mp
        cam_params_opt = []
        for s in range(len(sensor_names)):
            cam_params_opt.append(common.cam_params_from_sensor(rig.sensors[s]))
        mp.mesh_project_cameras(
            sensor_names, cam_params_opt,
            [c.image for c in cams], [c.timestamp for c in cams],
            [c.camera_type for c in cams],
            [jnp.asarray(p) for p in w2c_final],
            mesh_data["vertices"], mesh_data["faces"], args.out_texture_dir)

    if args.save_matches:
        from multiview_tpu.io import match_file
        inlier = _inlier_lookup(cams, trackset, result.observations)
        written = match_file.save_inlier_match_pairs(
            out / "matches", [c.image_name for c in cams], args.num_overlaps,
            trackset, inlier)
        print(f"Wrote {len(written)} match files to {out/'matches'}")
    return 0


def _inlier_lookup(cams, trackset, observations):
    """(pid, cid) -> bool from the per-sensor masks, in build order."""
    counters = {obs.sensor: 0 for obs in observations.pixels}
    masks = {obs.sensor: __import__("numpy").asarray(obs.mask)
             for obs in observations.pixels}
    table = {}
    for pid, track in enumerate(trackset.tracks):
        for cid, fid in track.items():
            s = cams[cid].camera_type
            if s in masks:
                table[(pid, cid)] = bool(masks[s][counters[s]])
                counters[s] += 1
    return lambda pid, cid: table.get((pid, cid), False)


def _write_solution_nvm(path, rig, cams, state, w2c_mats, trackset, observations):
    """Inlier tracks -> NVM (writeNvm semantics: keypoints offset by the
    optical center, interest_point.cc:1333-1405)."""
    from multiview_tpu.io import nvm as nvm_io
    # recover per-(cid,fid) inlier flags from the per-sensor masks
    inlier = {}
    off_rows = {}
    for obs in observations.pixels:
        m = np.asarray(obs.mask)
        off_rows[obs.sensor] = 0
    # rebuild in the same order as assemble.build_observations
    counters = {obs.sensor: 0 for obs in observations.pixels}
    masks = {obs.sensor: np.asarray(obs.mask) for obs in observations.pixels}
    for pid, track in enumerate(trackset.tracks):
        for cid, fid in track.items():
            s = cams[cid].camera_type
            if s in masks:
                inlier[(pid, cid)] = bool(masks[s][counters[s]])
                counters[s] += 1

    kp_counts = [0] * len(cams)
    kp_map = [dict() for _ in cams]
    pid_to_cid_fid = []
    xyz_rows = []
    pts = np.asarray(state.points)
    for pid, track in enumerate(trackset.tracks):
        entry = {}
        for cid, fid in track.items():
            if not inlier.get((pid, cid), False):
                continue
            s = cams[cid].camera_type
            kp = trackset.keypoints[cid][fid] - np.asarray(rig.sensors[s].optical_center)
            kp_map[cid][kp_counts[cid]] = kp
            entry[cid] = kp_counts[cid]
            kp_counts[cid] += 1
        if len(entry) >= 2:
            pid_to_cid_fid.append(entry)
            xyz_rows.append(pts[pid])
    keypoints = [np.stack([m[i] for i in range(len(m))]) if m else np.zeros((0, 2))
                 for m in kp_map]
    data = nvm_io.NvmData(
        cid_to_filename=[c.image_name for c in cams],
        focal_lengths=np.asarray([float(state.focal[c.camera_type]) for c in cams]),
        cid_to_keypoint=keypoints,
        pid_to_cid_fid=pid_to_cid_fid,
        pid_to_xyz=np.asarray(xyz_rows) if xyz_rows else np.zeros((0, 3)),
        world_to_cam=w2c_mats)
    nvm_io.write_nvm(path, data)
