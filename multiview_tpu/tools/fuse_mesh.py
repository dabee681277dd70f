"""``fuse-mesh`` tool — the multi_stereo + voxblox_mesh pipeline equivalent
(`/root/reference/rig_calibrator/bin/multi_stereo`): per-sensor plane-sweep
stereo on consecutive undistorted image pairs, per-pair cloud filtering
(the ASP pc_filter role), TSDF fusion of the filtered clouds, marching-
tetrahedra mesh -> fused_mesh.ply.

Mirrors the reference's resumable step structure (multi_stereo:76-85,189):
``stereo`` -> ``pc_filter`` -> ``mesh_gen`` selectable via --first_step /
--last_step, with per-pair artifacts laid out as
``<out>/<sensor>/stereo/<left>_<right>/run-PC.pcd`` (raw, left-camera
coordinates), ``run-PC-filter.pcd`` (filtered, what voxblox fuses),
``run-PC-debug.ply`` (the point2mesh per-pair debug artifact role), plus a
``voxblox_index.txt`` of (cam2world, pcd) line pairs
(multi_stereo:231-239).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

STEP_DICT = {"stereo": 0, "pc_filter": 1, "mesh_gen": 2}


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--rig_config", required=True)
    p.add_argument("--camera_poses", required=True, help="cameras.txt")
    p.add_argument("--images", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--sensor", default=None, help="restrict to one sensor")
    p.add_argument("--min_depth", type=float, default=0.5)
    p.add_argument("--max_depth", type=float, default=10.0)
    p.add_argument("--num_planes", type=int, default=64)
    p.add_argument("--stereo_algorithm", default="wta",
                   choices=("wta", "sgm"),
                   help="cost selection: raw winner-take-all or 4-path "
                        "semi-global aggregation (ASP --stereo-algorithm role)")
    p.add_argument("--sgm_p1", type=float, default=0.03)
    p.add_argument("--sgm_p2", type=float, default=0.3)
    p.add_argument("--voxel_size", type=float, default=0.05)
    p.add_argument("--grid_dim", type=int, default=128)
    p.add_argument("--undistorted_crop_win", default="",
                   help="'W H' central undistorted window to keep before "
                        "stereo (multi_stereo --undistorted_crop_win)")
    p.add_argument("--max_distance_from_camera", type=float, default=0.0,
                   help="pc_filter distance gate; <=0 disables "
                        "(ASP --max-distance-from-camera)")
    p.add_argument("--no_outlier_removal", action="store_true",
                   help="disable statistical outlier removal in pc_filter")
    p.add_argument("--std_ratio", type=float, default=2.0,
                   help="outlier-removal k-NN distance std threshold")
    p.add_argument("--first_step", default="stereo",
                   choices=list(STEP_DICT),
                   help="resume support (multi_stereo --first_step role)")
    p.add_argument("--last_step", default="mesh_gen",
                   choices=list(STEP_DICT),
                   help="stop after this step (multi_stereo --last_step)")


def run(args):
    import jax.numpy as jnp
    from multiview_tpu.io import rig_config as rc, nvm as nvm_io, ply, depth_io
    from multiview_tpu.dense import stereo, tsdf, marching, pc_filter as pcf
    from multiview_tpu.geometry import pose as pose_mod
    from multiview_tpu.utils import undistort as und
    from multiview_tpu.tools import common

    first = STEP_DICT[args.first_step]
    last = STEP_DICT[args.last_step]
    if first > last:
        raise SystemExit("--first_step must not come after --last_step")

    rig = rc.read_rig_config(args.rig_config)
    sensor_names = [s.name for s in rig.sensors]
    cam_params = [common.cam_params_from_sensor(s) for s in rig.sensors]
    pose_names, pose_mats = nvm_io.read_camera_poses(args.camera_poses)
    name_to_pose = {Path(n).name: m for n, m in zip(pose_names, pose_mats)}

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    selected = [s for s in range(len(sensor_names))
                if not args.sensor or sensor_names[s] == args.sensor]

    crop_win = None
    if args.undistorted_crop_win:
        vals = args.undistorted_crop_win.split()
        crop_win = (int(vals[0]), int(vals[1]))

    # ---- step 0: stereo (raw per-pair clouds in left-camera coords) ----
    if first <= 0 <= last:
        image_data = common.scan_image_dir(args.images, sensor_names)
        for s in selected:
            recs = image_data[s]
            cp = cam_params[s]
            for a in range(len(recs) - 1):
                ra, rb = recs[a], recs[a + 1]
                na, nb = Path(ra.name).name, Path(rb.name).name
                if na not in name_to_pose or nb not in name_to_pose:
                    continue
                # undistort both (the reference runs stereo on undistorted
                # images, multi_stereo:164-173)
                ua, K = und.undistort_image(ra.payload, cp,
                                            crop_window=crop_win)
                ub, _ = und.undistort_image(rb.payload, cp,
                                            crop_window=crop_win)
                w2c_a = pose_mod.matrix_to_pose(jnp.asarray(name_to_pose[na]))
                w2c_b = pose_mod.matrix_to_pose(jnp.asarray(name_to_pose[nb]))
                r2n = pose_mod.pose_compose(w2c_b, pose_mod.pose_inverse(w2c_a))
                focal = jnp.asarray([K[0, 0], K[1, 1]])
                center = jnp.asarray([K[0, 2], K[1, 2]])
                res = stereo.plane_sweep(
                    jnp.asarray(ua), jnp.asarray(ub), focal, center,
                    r2n, args.min_depth, args.max_depth,
                    num_planes=args.num_planes,
                    aggregate=("sgm" if args.stereo_algorithm == "sgm"
                               else "none"),
                    sgm_p1=args.sgm_p1, sgm_p2=args.sgm_p2)
                pts_cam = stereo.stereo_pair_to_cloud(res, np.asarray(focal),
                                                      np.asarray(center),
                                                      subsample=2)
                c2w = np.asarray(pose_mod.pose_to_matrix(
                    pose_mod.pose_inverse(w2c_a)))
                pair_dir = out / sensor_names[s] / "stereo" \
                    / f"{Path(na).stem}_{Path(nb).stem}"
                pair_dir.mkdir(parents=True, exist_ok=True)
                depth_io.write_pcd(pair_dir / "run-PC.pcd", pts_cam)
                np.savetxt(pair_dir / "run_cam2world.txt", c2w, fmt="%.17g")
                print(f"pair {na} / {nb}: {len(pts_cam)} points")

    # ---- step 1: pc_filter (+ per-pair debug cloud, the point2mesh role) ----
    if first <= 1 <= last:
        for s in selected:
            for pair_dir in sorted((out / sensor_names[s] / "stereo").glob("*")):
                raw = pair_dir / "run-PC.pcd"
                if not raw.exists():
                    continue
                xyz, _ = depth_io.read_pcd(raw)
                filt, keep = pcf.pc_filter(
                    xyz,
                    max_distance_from_camera=args.max_distance_from_camera,
                    outlier_removal=not args.no_outlier_removal,
                    std_ratio=args.std_ratio)
                depth_io.write_pcd(pair_dir / "run-PC-filter.pcd", filt)
                # debug artifact per pair (point2mesh -s 4 role,
                # multi_stereo:206-213): subsampled viewable cloud
                ply.write_ply(pair_dir / "run-PC-debug.ply", filt[::4])
                print(f"pc_filter {pair_dir.name}: kept {keep.sum()}/{len(keep)}")

    # ---- step 2: mesh_gen (voxblox index + TSDF fusion) ----
    if last < 2:
        return 0
    cloud_files, c2w_files = [], []
    for s in selected:
        sdir = out / sensor_names[s]
        idx_lines = []
        for pair_dir in sorted((sdir / "stereo").glob("*")):
            pcd = pair_dir / "run-PC-filter.pcd"
            if not pcd.exists():
                pcd = pair_dir / "run-PC.pcd"
            c2w_f = pair_dir / "run_cam2world.txt"
            if not pcd.exists() or not c2w_f.exists():
                continue
            cloud_files.append(pcd)
            c2w_files.append(c2w_f)
            idx_lines += [str(c2w_f), str(pcd)]
        if idx_lines:
            index = sdir / "voxblox_index.txt"
            index.write_text("\n".join(idx_lines) + "\n")
            print(f"Writing: {index}")
    if not cloud_files:
        raise SystemExit("No stereo clouds produced/found")

    all_pts = []
    for pcd, c2w_f in zip(cloud_files, c2w_files):
        xyz, _ = depth_io.read_pcd(pcd)
        c2w = np.loadtxt(c2w_f)
        all_pts.append(xyz @ c2w[:3, :3].T + c2w[:3, 3])
    allc = np.concatenate(all_pts)
    lo = np.percentile(allc, 2, axis=0) - 2 * args.voxel_size
    hi = np.percentile(allc, 98, axis=0) + 2 * args.voxel_size
    dims = np.minimum(np.ceil((hi - lo) / args.voxel_size).astype(int) + 1,
                      args.grid_dim)
    grid = tsdf.make_grid(tuple(int(d) for d in dims), origin=lo,
                          voxel_size=args.voxel_size)
    for pcd, c2w_f in zip(cloud_files, c2w_files):
        pts_cam, _ = depth_io.read_pcd(pcd)
        c2w = np.loadtxt(c2w_f)
        # virtual rasterization camera sized to the cloud density
        vres = max(64, int(np.sqrt(len(pts_cam)) * 2))
        grid = tsdf.integrate_point_cloud(
            grid, jnp.asarray(pts_cam, jnp.float32),
            jnp.asarray(pose_mod.matrix_to_pose(jnp.asarray(c2w)), jnp.float32),
            focal=(vres * 0.8, vres * 0.8), image_size=(vres, (vres * 3) // 4),
            max_range=args.max_depth)

    verts, faces, vint = marching.extract_mesh(grid)
    ply.write_ply(out / "fused_mesh.ply", verts, faces, intensity=vint)
    print(f"Writing: {out/'fused_mesh.ply'} ({len(verts)} verts, {len(faces)} faces)")
    return 0
