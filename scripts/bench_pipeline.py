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


def _terrain_hit(origins, dirs):
    """March rays against the terrain by bisection; returns t [N]."""
    t_lo = np.full(len(dirs), 0.2)
    t_hi = np.full(len(dirs), 10.0)
    for _ in range(40):
        t_mid = 0.5 * (t_lo + t_hi)
        p = origins + t_mid[:, None] * dirs
        above = p[:, 2] > terrain_height(p[:, 0], p[:, 1])
        t_lo = np.where(above, t_mid, t_lo)
        t_hi = np.where(above, t_hi, t_mid)
    return 0.5 * (t_lo + t_hi)


def _texture_at(pts):
    gi = np.mod(np.floor(pts[:, 0] * 10).astype(int), 512)
    gj = np.mod(np.floor(pts[:, 1] * 10).astype(int), 512)
    return np.clip(_TEX[gi, gj], 0, 1).astype(np.float32)


def render_image(cam_to_world_mat, size, focal):
    """Textured terrain z=h(x,y) rendered by bisection along each ray."""
    W, H = size
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    d = np.stack([(us - W / 2.0) / focal, (vs - H / 2.0) / focal,
                  np.ones_like(us, float)], -1).reshape(-1, 3)
    M = cam_to_world_mat
    o = np.broadcast_to(M[:3, 3], d.shape)
    dw = d @ M[:3, :3].T
    t = _terrain_hit(o, dw)
    return _texture_at(o + t[:, None] * dw).reshape(H, W)


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


def render_with_cam(cam, w2c_pose, want_depth=False):
    """Render the terrain through an arbitrary CameraParams (distortion
    included: rays come from cam.ray_from_dist_pix). Optionally also return
    the camera-frame xyz image (depth-camera .pc payload)."""
    import jax.numpy as jnp
    from multiview_tpu.geometry import pose as P

    W, H = cam.distorted_size
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    pix = jnp.asarray(np.stack([us, vs], -1).reshape(-1, 2), jnp.float64)
    rays_cam = np.asarray(cam.ray_from_dist_pix(pix))          # [N,3] unit
    c2w = P.pose_inverse(jnp.asarray(w2c_pose))
    Rt = np.asarray(P.pose_to_matrix(c2w))
    o = np.broadcast_to(Rt[:3, 3], rays_cam.shape)
    d = rays_cam @ Rt[:3, :3].T
    t = _terrain_hit(o, d)
    img = _texture_at(o + t[:, None] * d).reshape(H, W)
    if not want_depth:
        return img, None
    xyz = (rays_cam * t[:, None]).reshape(H, W, 3).astype(np.float32)
    return img, xyz


def build_rig_workspace(ws: Path, n_ref: int, size, focal):
    """3-sensor bracketed-rig workspace: nav_cam (ref, pinhole), sci_cam
    (radtan distortion, clock offset, between-bracket timestamps), haz_cam
    (depth camera: intensity image + .pc xyz cloud per frame). Ground-truth
    rig transforms are returned for post-calibration checks."""
    import imageio.v3 as iio
    import jax.numpy as jnp
    from multiview_tpu.geometry import camera as C, pose as P
    from multiview_tpu.io import depth_io, nvm as nvm_io, rig_config as rc
    from multiview_tpu.utils import synthetic as syn

    ws.mkdir(parents=True, exist_ok=True)
    W, H = size
    sci_dist = np.array([-0.12, 0.03, 5e-4, -4e-4])
    sci_offset = 0.13
    rig_true = {
        "sci_cam": P.make_pose(jnp.asarray([0.10, -0.03, 0.02]),
                               P.quat_exp(jnp.asarray([0.02, -0.015, 0.04]))),
        "haz_cam": P.make_pose(jnp.asarray([-0.05, 0.06, 0.01]),
                               P.quat_exp(jnp.asarray([-0.03, 0.01, 0.02]))),
    }
    half = np.array([W / 2.0, H / 2.0])
    mk = lambda name, dist, off: rc.SensorConfig(
        name=name, focal_length=float(focal), optical_center=half.copy(),
        distortion=np.asarray(dist, float), image_size=size,
        distorted_crop_size=size, undistorted_image_size=size,
        ref_to_sensor=np.eye(4), depth_to_image=np.eye(4),
        timestamp_offset=off)
    sensors = [mk("nav_cam", [], 0.0), mk("sci_cam", sci_dist, sci_offset),
               mk("haz_cam", [], 0.0)]
    rc.write_rig_config(ws / "rig_config.txt", rc.RigConfig(sensors))
    cams = {s.name: C.CameraParams.create(size, focal, half,
                                          dist_coeffs=s.distortion)
            for s in sensors}

    def w2ref_at(t_ref):
        i0 = int(np.clip(np.floor(t_ref - 10000.0), 0, n_ref - 1))
        i1 = min(i0 + 1, n_ref - 1)
        alpha = float(np.clip(t_ref - 10000.0 - i0, 0.0, 1.0))

        def knot(i):
            row, col = divmod(i, 8)
            pos = np.array([0.45 * col, 0.8 * row, 2.0])
            return syn.look_at_pose(pos, pos + np.array([0.15, 0.02, -1.0]))

        return P.pose_interp(alpha, jnp.asarray(knot(i0)), jnp.asarray(knot(i1)))

    names, mats = [], []
    frames = ([("nav_cam", 10000.0 + i, 0.0) for i in range(n_ref)]
              + [("sci_cam", 10000.0 + i + 0.5 + sci_offset, sci_offset)
                 for i in range(n_ref - 1)]
              + [("haz_cam", 10000.0 + i + 0.25, 0.0)
                 for i in range(n_ref - 1)])
    for sname, t, off in frames:
        d = ws / "images" / sname
        d.mkdir(parents=True, exist_ok=True)
        w2ref = w2ref_at(t - off)
        w2c = (w2ref if sname == "nav_cam"
               else P.pose_compose(rig_true[sname], w2ref))
        img, xyz = render_with_cam(cams[sname], w2c,
                                   want_depth=sname == "haz_cam")
        path = d / f"{t:.2f}.png"
        iio.imwrite(path, (img * 255).astype(np.uint8))
        if xyz is not None:
            depth_io.write_xyz_image(path.with_suffix(".pc"), xyz)
        names.append(str(path))
        mats.append(np.asarray(P.pose_to_matrix(w2c)))
    nvm_io.write_camera_poses(ws / "cameras.txt", names, np.stack(mats))
    return rig_true


def check_rig_recovery(calib_dir: Path, rig_true) -> dict:
    """Rot/trans error of the recovered ref_to_sensor transforms vs truth."""
    import jax.numpy as jnp
    from multiview_tpu.geometry import pose as P
    from multiview_tpu.io import rig_config as rc

    rig2 = rc.read_rig_config(calib_dir / "rig_config.txt")
    out = {}
    for s in rig2.sensors[1:]:
        est = P.matrix_to_pose(jnp.asarray(s.ref_to_sensor))
        rel = P.pose_compose(P.pose_inverse(est), rig_true[s.name])
        rot = float(np.degrees(np.linalg.norm(np.asarray(P.quat_log(P.pose_q(rel))))))
        trans = float(np.linalg.norm(np.asarray(P.pose_t(rel))))
        out[s.name] = {"rot_deg": round(rot, 4), "trans_m": round(trans, 5)}
    return out


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
    ap.add_argument("--rig", action="store_true",
                    help="3-sensor bracketed rig (nav + distorted sci + "
                         "haz depth) instead of the single-camera scene; "
                         "calibrate floats rig transforms + depth constraints")
    args = ap.parse_args()

    from multiview_tpu.__main__ import main as cli_main

    ws = Path(args.out)
    if ws.exists() and not args.keep:
        shutil.rmtree(ws)
    size = (args.width, args.height)

    t0 = time.perf_counter()
    rig_true = None
    have_ws = args.keep and (ws / "cameras.txt").exists()
    if args.rig:
        if not have_ws or "calibrate" in args.stages:
            # rig_true is needed for the post-calibrate check, so rig
            # workspaces are rebuilt whenever calibrate runs
            rig_true = build_rig_workspace(ws, args.n_images, size, args.focal)
        if args.stages == "sfm,calibrate,fuse,texture":
            args.stages = "calibrate,fuse,texture"
    elif not have_ws:
        build_workspace(ws, args.n_images, size, args.focal)
    print(f"[pipeline] workspace ({args.n_images} images {size[0]}x{size[1]}"
          f"{' rig' if args.rig else ''}{' reused' if have_ws else ''}):"
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
        if args.rig:
            run("calibrate", [
                "calibrate", "--rig_config", str(ws / "rig_config.txt"),
                "--camera_poses", str(ws / "cameras.txt"),
                "--images", str(ws / "images"), "--out_dir", str(ws / "calib"),
                "--rig_transforms_to_float", "--camera_poses_to_float",
                "--depth_tri_weight", "25.0", "--bracket_len", "1.5",
                "--num_iterations", "20", "--calibrator_num_passes", "2",
                "--max_features", str(args.max_features),
                "--num_overlaps", str(args.num_overlaps), "--save_nvm"])
            rig_errs = check_rig_recovery(ws / "calib", rig_true)
            print(f"[pipeline] rig recovery vs truth: {rig_errs}",
                  file=sys.stderr)
            assert all(v["rot_deg"] < 2.0 and v["trans_m"] < 0.1
                       for v in rig_errs.values()), rig_errs
        else:
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
            "--grid_dim", "160"]
            + (["--sensor", "nav_cam"] if args.rig else []))
    if "texture" in stages:
        run("texture", [
            "texture", "--rig_config", str(calib_rig),
            "--camera_poses", str(calib_poses),
            "--images", str(ws / "images"),
            "--mesh", str(ws / "fused" / "fused_mesh.ply"),
            "--out_dir", str(ws / "textured"),
            "--pixel_size", "0.01"]
            + (["--sensor", "nav_cam"] if args.rig else []))

    timings["total"] = round(sum(v for k, v in timings.items()), 2)
    print(json.dumps({"pipeline_stage_seconds": timings,
                      "n_images": args.n_images,
                      "image_size": list(size)}))


if __name__ == "__main__":
    main()
