"""``fuse-mesh`` tool — the multi_stereo + voxblox_mesh pipeline equivalent
(`/root/reference/rig_calibrator/bin/multi_stereo`): per-sensor plane-sweep
stereo on consecutive undistorted image pairs, TSDF fusion of the resulting
clouds, marching-tetrahedra mesh -> fused_mesh.ply.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--rig_config", required=True)
    p.add_argument("--camera_poses", required=True, help="cameras.txt")
    p.add_argument("--images", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--sensor", default=None, help="restrict to one sensor")
    p.add_argument("--min_depth", type=float, default=0.5)
    p.add_argument("--max_depth", type=float, default=10.0)
    p.add_argument("--num_planes", type=int, default=64)
    p.add_argument("--voxel_size", type=float, default=0.05)
    p.add_argument("--grid_dim", type=int, default=128)
    p.add_argument("--first_step", default="stereo",
                   choices=["stereo", "mesh_gen"],
                   help="resume support (multi_stereo --first_step role)")


def run(args):
    import jax.numpy as jnp
    from multiview_tpu.io import rig_config as rc, nvm as nvm_io, ply, depth_io
    from multiview_tpu.dense import stereo, tsdf, marching
    from multiview_tpu.geometry import pose as pose_mod
    from multiview_tpu.utils import undistort as und
    from multiview_tpu.tools import common

    rig = rc.read_rig_config(args.rig_config)
    sensor_names = [s.name for s in rig.sensors]
    cam_params = [common.cam_params_from_sensor(s) for s in rig.sensors]
    pose_names, pose_mats = nvm_io.read_camera_poses(args.camera_poses)
    name_to_pose = {Path(n).name: m for n, m in zip(pose_names, pose_mats)}

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    clouds_dir = out / "clouds"

    if args.first_step == "stereo":
        image_data = common.scan_image_dir(args.images, sensor_names)
        cloud_id = 0
        for s, recs in enumerate(image_data):
            if args.sensor and sensor_names[s] != args.sensor:
                continue
            cp = cam_params[s]
            K = None
            for a in range(len(recs) - 1):
                ra, rb = recs[a], recs[a + 1]
                na, nb = Path(ra.name).name, Path(rb.name).name
                if na not in name_to_pose or nb not in name_to_pose:
                    continue
                # undistort both (the reference runs stereo on undistorted
                # images, multi_stereo:164-173)
                ua, K = und.undistort_image(ra.payload, cp)
                ub, _ = und.undistort_image(rb.payload, cp)
                w2c_a = pose_mod.matrix_to_pose(jnp.asarray(name_to_pose[na]))
                w2c_b = pose_mod.matrix_to_pose(jnp.asarray(name_to_pose[nb]))
                r2n = pose_mod.pose_compose(w2c_b, pose_mod.pose_inverse(w2c_a))
                focal = jnp.asarray([K[0, 0], K[1, 1]])
                center = jnp.asarray([K[0, 2], K[1, 2]])
                res = stereo.plane_sweep(
                    jnp.asarray(ua), jnp.asarray(ub), focal, center,
                    r2n, args.min_depth, args.max_depth,
                    num_planes=args.num_planes)
                pts_cam = stereo.stereo_pair_to_cloud(res, np.asarray(focal),
                                                      np.asarray(center),
                                                      subsample=2)
                c2w = np.asarray(pose_mod.pose_to_matrix(
                    pose_mod.pose_inverse(w2c_a)))
                pts_world = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
                clouds_dir.mkdir(parents=True, exist_ok=True)
                depth_io.write_pcd(clouds_dir / f"{cloud_id:05d}.pcd", pts_world)
                np.savetxt(clouds_dir / f"{cloud_id:05d}_cam2world.txt", c2w,
                           fmt="%.17g")
                print(f"pair {na} / {nb}: {len(pts_cam)} points")
                cloud_id += 1

    # ---- TSDF fusion of all saved clouds ----
    cloud_files = sorted(clouds_dir.glob("*.pcd"))
    if not cloud_files:
        raise SystemExit("No stereo clouds produced/found")
    all_pts = []
    for f in cloud_files:
        xyz, _ = depth_io.read_pcd(f)
        all_pts.append(xyz)
    allc = np.concatenate(all_pts)
    lo = np.percentile(allc, 2, axis=0) - 2 * args.voxel_size
    hi = np.percentile(allc, 98, axis=0) + 2 * args.voxel_size
    dims = np.minimum(np.ceil((hi - lo) / args.voxel_size).astype(int) + 1,
                      args.grid_dim)
    grid = tsdf.make_grid(tuple(int(d) for d in dims), origin=lo,
                          voxel_size=args.voxel_size)
    for f in cloud_files:
        xyz, _ = depth_io.read_pcd(f)
        c2w = np.loadtxt(str(f).replace(".pcd", "_cam2world.txt"))
        w2c = np.linalg.inv(c2w)
        pts_cam = xyz @ w2c[:3, :3].T + w2c[:3, 3]
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
