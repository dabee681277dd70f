"""End-to-end pipeline wall-time benchmark (reproduces PERFORMANCE.md).

Generates a synthetic workspace (textured-terrain renders + rig config +
initial camera poses), then drives the four pipeline stages through the
real CLI entry points in-process, timing each stage:

    sfm-init -> calibrate -> fuse-mesh (--sgm) -> texture

Usage (real TPU, timings include one-time XLA compiles unless the
persistent cache has seen the shapes):

    PYTHONPATH=/root/repo python scripts/bench_pipeline.py \
        --n_images 16 --width 320 --height 240 --out /tmp/pipe_bench

The reference runs the same stages as separate C++ processes
(theia_sfm -> rig_calibrator -> multi_stereo -> texrecon,
/root/reference/rig_calibrator/bin/).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np


def terrain_height(x, y):
    return 0.25 * np.sin(1.7 * x) * np.cos(1.3 * y)


_TEX = np.random.default_rng(42).uniform(size=(512, 512)).astype(np.float32)


def render_image(cam_to_world_mat, size, focal):
    """Textured terrain z=h(x,y) rendered by bisection along each ray."""
    W, H = size
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    d = np.stack([(us - W / 2.0) / focal, (vs - H / 2.0) / focal,
                  np.ones_like(us, float)], -1)
    M = cam_to_world_mat
    o = M[:3, 3]
    dw = d @ M[:3, :3].T
    t_lo = np.full(us.shape, 0.2)
    t_hi = np.full(us.shape, 10.0)
    for _ in range(40):
        t_mid = 0.5 * (t_lo + t_hi)
        p = o + t_mid[..., None] * dw
        above = p[..., 2] > terrain_height(p[..., 0], p[..., 1])
        t_lo = np.where(above, t_mid, t_lo)
        t_hi = np.where(above, t_hi, t_mid)
    pts = o + (0.5 * (t_lo + t_hi))[..., None] * dw
    gi = np.mod(np.floor(pts[..., 0] * 10).astype(int), 512)
    gj = np.mod(np.floor(pts[..., 1] * 10).astype(int), 512)
    return np.clip(_TEX[gi, gj], 0, 1).astype(np.float32)


def build_workspace(ws: Path, n_images: int, size, focal):
    import imageio.v3 as iio
    import jax.numpy as jnp
    from multiview_tpu.geometry import pose as P
    from multiview_tpu.io import nvm as nvm_io, rig_config as rc
    from multiview_tpu.utils import synthetic as syn

    ws.mkdir(parents=True, exist_ok=True)
    sensors = [rc.SensorConfig(
        name="nav_cam", focal_length=float(focal),
        optical_center=np.array([size[0] / 2.0, size[1] / 2.0]),
        distortion=np.array([]), image_size=size,
        distorted_crop_size=size, undistorted_image_size=size,
        ref_to_sensor=np.eye(4), depth_to_image=np.eye(4),
        timestamp_offset=0.0)]
    rc.write_rig_config(ws / "rig_config.txt", rc.RigConfig(sensors))

    img_dir = ws / "images" / "nav_cam"
    img_dir.mkdir(parents=True, exist_ok=True)
    names, mats = [], []
    rng = np.random.default_rng(7)
    for i in range(n_images):
        t = float(10000 + i)
        # lawnmower sweep 2m above the terrain with slight tilt jitter
        row, col = divmod(i, 8)
        pos = np.array([0.45 * col, 0.8 * row, 2.0 + 0.05 * rng.uniform()])
        target = pos + np.array([0.15, 0.05 * rng.uniform(), -1.0])
        w2c = syn.look_at_pose(pos, target)
        c2w = np.asarray(P.pose_to_matrix(P.pose_inverse(jnp.asarray(w2c))))
        img = render_image(c2w, size, focal)
        path = img_dir / f"{t:.1f}.png"
        iio.imwrite(path, (img * 255).astype(np.uint8))
        names.append(str(path))
        mats.append(np.asarray(P.pose_to_matrix(jnp.asarray(w2c))))
    nvm_io.write_camera_poses(ws / "cameras.txt", names, np.stack(mats))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=16)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--focal", type=float, default=280.0)
    ap.add_argument("--max_features", type=int, default=600)
    ap.add_argument("--num_overlaps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/pipe_bench")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workspace (default: wiped first)")
    ap.add_argument("--stages", default="sfm,calibrate,fuse,texture",
                    help="comma list of stages to run")
    args = ap.parse_args()

    from multiview_tpu.__main__ import main as cli_main

    ws = Path(args.out)
    if ws.exists() and not args.keep:
        shutil.rmtree(ws)
    size = (args.width, args.height)

    t0 = time.perf_counter()
    build_workspace(ws, args.n_images, size, args.focal)
    print(f"[pipeline] workspace ({args.n_images} images {size[0]}x{size[1]}):"
          f" {time.perf_counter() - t0:.1f} s", file=sys.stderr)

    stages = args.stages.split(",")
    timings = {}

    def run(name, argv):
        t = time.perf_counter()
        ret = cli_main(argv)
        timings[name] = round(time.perf_counter() - t, 2)
        print(f"[pipeline] {name}: {timings[name]} s", file=sys.stderr)
        assert ret == 0, f"stage {name} failed"

    if "sfm" in stages:
        run("sfm-init", [
            "sfm-init", "--rig_config", str(ws / "rig_config.txt"),
            "--images", str(ws / "images"), "--out_dir", str(ws / "sfm"),
            "--max_features", str(args.max_features),
            "--num_overlaps", str(args.num_overlaps)])
    if "calibrate" in stages:
        run("calibrate", [
            "calibrate", "--rig_config", str(ws / "rig_config.txt"),
            "--camera_poses", str(ws / "cameras.txt"),
            "--images", str(ws / "images"), "--out_dir", str(ws / "calib"),
            "--no_rig", "--num_iterations", "20",
            "--calibrator_num_passes", "2",
            "--max_features", str(args.max_features),
            "--num_overlaps", str(args.num_overlaps), "--save_nvm"])
    calib_rig = ws / ("calib/rig_config.txt" if "calibrate" in stages
                      else "rig_config.txt")
    calib_poses = ws / ("calib/cameras.txt" if "calibrate" in stages
                        else "cameras.txt")
    if "fuse" in stages:
        run("fuse-mesh", [
            "fuse-mesh", "--rig_config", str(calib_rig),
            "--camera_poses", str(calib_poses),
            "--images", str(ws / "images"), "--out_dir", str(ws / "fused"),
            "--min_depth", "1.0", "--max_depth", "4.0",
            "--stereo_algorithm", "sgm", "--voxel_size", "0.04",
            "--grid_dim", "160"])
    if "texture" in stages:
        run("texture", [
            "texture", "--rig_config", str(calib_rig),
            "--camera_poses", str(calib_poses),
            "--images", str(ws / "images"),
            "--mesh", str(ws / "fused" / "fused_mesh.ply"),
            "--out_dir", str(ws / "textured"),
            "--pixel_size", "0.01"])

    timings["total"] = round(sum(v for k, v in timings.items()), 2)
    print(json.dumps({"pipeline_stage_seconds": timings,
                      "n_images": args.n_images,
                      "image_size": list(size)}))


if __name__ == "__main__":
    main()
