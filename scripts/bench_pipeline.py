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
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def terrain_height(x, y):
    return 0.25 * np.sin(1.7 * x) * np.cos(1.3 * y)


_TEX = np.random.default_rng(42).uniform(size=(512, 512)).astype(np.float32)


_LOW_TEX = False


def harden_texture():
    """Enable a near-flat patch over terrain x in [0.6, 1.4), y in [0, 0.6):
    SfM must survive a region with almost no features without losing the
    views that see it."""
    global _LOW_TEX
    _LOW_TEX = True


def harden_image(img, rng):
    """Per-image photometric jitter: gamma, gain, additive sensor noise —
    the regimes the round-1 verdict called untested (exposure variation,
    noise)."""
    gamma = rng.uniform(0.8, 1.3)
    gain = rng.uniform(0.85, 1.15)
    out = np.clip(gain * np.power(img, gamma)
                  + rng.normal(0.0, 0.01, img.shape), 0.0, 1.0)
    return out.astype(np.float32)


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
    """Bilinear two-octave texture lookup: view-stable appearance (nearest
    sampling aliases so hard that any viewpoint change decorrelates the
    images — a renderer artifact, not a real matching difficulty)."""
    def bilerp(u, v):
        i0 = np.floor(u).astype(int)
        j0 = np.floor(v).astype(int)
        fu = u - i0
        fv = v - j0
        i0m, j0m = np.mod(i0, 512), np.mod(j0, 512)
        i1m, j1m = np.mod(i0 + 1, 512), np.mod(j0 + 1, 512)
        return ((1 - fu) * (1 - fv) * _TEX[i0m, j0m]
                + fu * (1 - fv) * _TEX[i1m, j0m]
                + (1 - fu) * fv * _TEX[i0m, j1m]
                + fu * fv * _TEX[i1m, j1m])

    base = bilerp(pts[:, 0] * 10, pts[:, 1] * 10)
    detail = bilerp(pts[:, 0] * 33 + 100, pts[:, 1] * 33 + 100)
    t = np.clip(0.7 * base + 0.3 * detail, 0, 1).astype(np.float32)
    if _LOW_TEX:
        inpatch = ((pts[:, 0] >= 0.6) & (pts[:, 0] < 1.4)
                   & (pts[:, 1] >= 0.0) & (pts[:, 1] < 0.6))
        t = np.where(inpatch, 0.55 + 0.04 * (t - 0.5), t).astype(np.float32)
    return t


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


def build_workspace(ws: Path, n_images: int, size, focal, hard: bool = False):
    import imageio.v3 as iio
    import jax.numpy as jnp
    from multiview_tpu.geometry import pose as P
    from multiview_tpu.io import nvm as nvm_io, rig_config as rc
    from multiview_tpu.utils import synthetic as syn

    ws.mkdir(parents=True, exist_ok=True)
    if hard:
        harden_texture()
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
        # serpentine lawnmower sweep 2m above the terrain with slight tilt
        # jitter (hard mode: larger view-direction jitter + in-plane roll);
        # serpentine so temporal neighbors overlap across row turns
        row, col = divmod(i, 8)
        if row % 2 == 1:
            col = 7 - col
        pos = np.array([0.45 * col, 0.8 * row, 2.0 + 0.05 * rng.uniform()])
        tilt = 0.12 if hard else 0.05
        target = pos + np.array([0.15 + tilt * rng.uniform(-1, 1),
                                 tilt * rng.uniform(-1, 1), -1.0])
        w2c = syn.look_at_pose(pos, target)
        if hard:
            roll = np.radians(rng.uniform(-8.0, 8.0))
            rollp = P.make_pose(jnp.zeros(3),
                                P.quat_exp(jnp.asarray([0.0, 0.0, roll])))
            w2c = np.asarray(P.pose_compose(rollp, jnp.asarray(w2c)))
        c2w = np.asarray(P.pose_to_matrix(P.pose_inverse(jnp.asarray(w2c))))
        img = render_image(c2w, size, focal)
        if hard:
            img = harden_image(img, rng)
        path = img_dir / f"{t:.1f}.png"
        iio.imwrite(path, (img * 255).astype(np.uint8))
        names.append(str(path))
        mats.append(np.asarray(P.pose_to_matrix(jnp.asarray(w2c))))
    nvm_io.write_camera_poses(ws / "cameras.txt", names, np.stack(mats))
    # ground truth for trajectory checks (hard mode starts the pipeline
    # from SfM estimates, not from these)
    nvm_io.write_camera_poses(ws / "cameras_gt.txt", names, np.stack(mats))


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


def build_rig_workspace(ws: Path, n_ref: int, size, focal, hard: bool = False):
    """3-sensor bracketed-rig workspace: nav_cam (ref, pinhole), sci_cam
    (radtan distortion, clock offset, between-bracket timestamps), haz_cam
    (depth camera: intensity image + .pc xyz cloud per frame). Ground-truth
    rig transforms are returned for post-calibration checks.

    hard: stressed variant (VERDICT r2 #4) — per-image exposure/gamma
    jitter + sensor noise, a low-texture terrain band, depth-cloud sensor
    noise, and PERTURBED initial camera poses in cameras.txt (truth only in
    cameras_gt.txt), so calibration must recover rig + trajectory + depth
    alignment from degraded inputs rather than refine from truth."""
    import imageio.v3 as iio
    import jax.numpy as jnp
    from multiview_tpu.geometry import camera as C, pose as P
    from multiview_tpu.io import depth_io, nvm as nvm_io, rig_config as rc
    from multiview_tpu.utils import synthetic as syn

    ws.mkdir(parents=True, exist_ok=True)
    if hard:
        harden_texture()
    rng = np.random.default_rng(11)
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
    mats_true = []
    for sname, t, off in frames:
        d = ws / "images" / sname
        d.mkdir(parents=True, exist_ok=True)
        w2ref = w2ref_at(t - off)
        w2c = (w2ref if sname == "nav_cam"
               else P.pose_compose(rig_true[sname], w2ref))
        img, xyz = render_with_cam(cams[sname], w2c,
                                   want_depth=sname == "haz_cam")
        if hard:
            img = harden_image(img, rng)
        path = d / f"{t:.2f}.png"
        iio.imwrite(path, (img * 255).astype(np.uint8))
        if xyz is not None:
            if hard:
                # range-proportional sensor noise along each ray (~0.5% of
                # depth, a depth-camera-class error model)
                r = np.linalg.norm(xyz, axis=-1, keepdims=True)
                dirs = xyz / np.maximum(r, 1e-9)
                r_noisy = r + rng.normal(0.0, 0.005, r.shape) * np.maximum(r, 1e-9)
                xyz = (dirs * r_noisy).astype(np.float32)
            depth_io.write_xyz_image(path.with_suffix(".pc"), xyz)
        names.append(str(path))
        mats_true.append(np.asarray(P.pose_to_matrix(w2c)))
        if hard:
            # perturbed initial pose: ~1 deg rotation, ~3 cm translation
            noise = P.make_pose(jnp.asarray(rng.normal(0, 0.03, 3)),
                                P.quat_exp(jnp.asarray(rng.normal(0, 0.01, 3))))
            w2c = P.pose_compose(noise, w2c)
        mats.append(np.asarray(P.pose_to_matrix(w2c)))
    nvm_io.write_camera_poses(ws / "cameras.txt", names, np.stack(mats))
    nvm_io.write_camera_poses(ws / "cameras_gt.txt", names, np.stack(mats_true))
    return rig_true


def check_depth_alignment(calib_dir: Path, ws: Path, sample: int = 37) -> dict:
    """Ground-truth depth-constraint accuracy: every haz_cam cloud is lifted
    to world through the CALIBRATED chain (depth_to_image * scale, rig,
    refined pose) and compared against the true terrain surface. Residual =
    |z - terrain_height(x, y)| over subsampled cloud points.

    The calibrated world frame is first similarity-aligned to ground truth
    over the camera centers — a no-depth-prior calibration has a free
    global gauge (the same reason ATE aligns before comparing), and the
    terrain is defined in the ground-truth frame."""
    import jax.numpy as jnp
    from multiview_tpu.geometry import pose as P, registration as reg
    from multiview_tpu.io import depth_io, nvm as nvm_io, rig_config as rc

    rig2 = rc.read_rig_config(calib_dir / "rig_config.txt")
    haz = next(s for s in rig2.sensors if s.name == "haz_cam")
    d2i = np.asarray(haz.depth_to_image)
    names, mats = nvm_io.read_camera_poses(calib_dir / "cameras.txt")

    # est -> gt similarity from matched camera centers
    gnames, gmats = nvm_io.read_camera_poses(ws / "cameras_gt.txt")
    gm = {Path(n).name: M for n, M in zip(gnames, gmats)}
    ce, cg = [], []
    for n, M in zip(names, mats):
        if Path(n).name in gm:
            G = gm[Path(n).name]
            ce.append(-M[:3, :3].T @ M[:3, 3])
            cg.append(-G[:3, :3].T @ G[:3, 3])
    scale, spose = reg.find_similarity_transform(
        jnp.asarray(np.stack(ce)), jnp.asarray(np.stack(cg)))

    res = []
    for n, M in zip(names, mats):
        p = Path(n)
        if p.parent.name != "haz_cam":
            continue
        pc = p.with_suffix(".pc")
        if not pc.exists():
            pc = ws / "images" / "haz_cam" / p.with_suffix(".pc").name
        xyz = np.asarray(depth_io.read_xyz_image(pc)).reshape(-1, 3)[::sample]
        ok = np.linalg.norm(xyz, axis=-1) > 1e-6
        xyz = xyz[ok]
        cam_pts = xyz @ d2i[:3, :3].T + d2i[:3, 3]
        c2w = np.asarray(P.pose_to_matrix(P.pose_inverse(
            P.matrix_to_pose(jnp.asarray(M)))))
        world = cam_pts @ c2w[:3, :3].T + c2w[:3, 3]
        world = np.asarray(reg.apply_similarity(scale, spose,
                                                jnp.asarray(world)))
        res.append(np.abs(world[:, 2] - terrain_height(world[:, 0], world[:, 1])))
    r = np.concatenate(res)
    return {"n_points": int(len(r)),
            "median_m": round(float(np.median(r)), 5),
            "p95_m": round(float(np.percentile(r, 95)), 5)}


def compute_ate(est_file: Path, gt_file: Path) -> dict:
    """Absolute trajectory error of an estimated pose list vs ground truth,
    after similarity (Umeyama-style) alignment of the camera centers — the
    trajectory-quality bar BASELINE.md sets (ATE parity on ISS-like
    sequences; proxy here on rendered scenes with known truth)."""
    import jax.numpy as jnp
    from multiview_tpu.geometry import pose as P, registration as reg
    from multiview_tpu.io import nvm as nvm_io

    enames, emats = nvm_io.read_camera_poses(est_file)
    gnames, gmats = nvm_io.read_camera_poses(gt_file)
    gm = {Path(n).name: M for n, M in zip(gnames, gmats)}
    est, gt = [], []
    for n, M in zip(enames, emats):
        if Path(n).name in gm:
            est.append(M)
            gt.append(gm[Path(n).name])
    E, G = np.stack(est), np.stack(gt)

    def centers(M):
        return -np.einsum("nji,nj->ni", M[:, :3, :3], M[:, :3, 3])

    ce, cg = centers(E), centers(G)
    scale, spose = reg.find_similarity_transform(jnp.asarray(ce),
                                                 jnp.asarray(cg))
    ce_al = np.asarray(reg.apply_similarity(scale, spose, jnp.asarray(ce)))
    ate_rmse = float(np.sqrt(np.mean(np.sum((ce_al - cg) ** 2, axis=-1))))

    # rotation error after applying the same world transform to the poses
    est_poses = jnp.asarray(np.stack(
        [np.asarray(P.matrix_to_pose(jnp.asarray(M))) for M in E]))
    est_al = reg.transform_cameras(scale, spose, est_poses)
    rots = []
    for i in range(len(G)):
        Rg = G[i, :3, :3]
        Re = np.asarray(P.quat_to_matrix(P.pose_q(est_al[i])))
        cosang = np.clip((np.trace(Re @ Rg.T) - 1.0) / 2.0, -1.0, 1.0)
        rots.append(np.degrees(np.arccos(cosang)))
    return {"n_poses": int(len(E)), "ate_rmse_m": round(ate_rmse, 5),
            "rot_mean_deg": round(float(np.mean(rots)), 4),
            "rot_max_deg": round(float(np.max(rots)), 4)}


def check_track_consistency(nvm_file: Path, gt_file: Path,
                            tol_m: float = 0.05) -> dict:
    """Geometric precision of the front-end's tracks against the known
    terrain: cast each observation's ray from the GROUND-TRUTH pose onto
    the terrain; a track is consistent if all its hits agree within tol.
    This measures matching quality independent of the SfM/BA solution."""
    from multiview_tpu.io import nvm as nvm_io

    data = nvm_io.read_nvm(nvm_file)
    gnames, gmats = nvm_io.read_camera_poses(gt_file)
    gm = {Path(n).name: M for n, M in zip(gnames, gmats)}
    cams = [gm.get(Path(n).name) for n in data.cid_to_filename]

    spreads = []
    for pid, track in enumerate(data.pid_to_cid_fid):
        hits = []
        for cid, fid in track.items():
            M = cams[cid]
            if M is None:
                continue
            # NVM keypoints are optical-center-offset; undo with focal rays
            kp = data.cid_to_keypoint[cid][fid]
            f = data.focal_lengths[cid]
            d_cam = np.array([kp[0] / f, kp[1] / f, 1.0])
            R, t = M[:3, :3], M[:3, 3]
            o = -R.T @ t
            d = R.T @ d_cam
            d = d / np.linalg.norm(d)
            th = _terrain_hit(o[None], d[None])[0]
            hits.append(o + th * d)
        if len(hits) >= 2:
            hits = np.stack(hits)
            spreads.append(np.max(np.linalg.norm(hits - hits.mean(0), axis=-1)))
    spreads = np.asarray(spreads)
    if len(spreads) == 0:
        return {"n_tracks": 0, "consistent_frac": 0.0, "mean_spread_m": 0.0}
    return {"n_tracks": int(len(spreads)),
            "consistent_frac": round(float(np.mean(spreads < tol_m)), 4),
            "mean_spread_m": round(float(np.mean(spreads)), 5)}


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
    ap.add_argument("--voxel_size", type=float, default=0.04,
                    help="fuse-mesh TSDF voxel (raise for large sweeps)")
    ap.add_argument("--grid_dim", type=int, default=160)
    ap.add_argument("--pixel_size", type=float, default=0.01,
                    help="texture atlas pixel size")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workspace (default: wiped first)")
    ap.add_argument("--stages", default=None,
                    help="comma list of stages to run (default: all; rig "
                         "mode defaults to calibrate,fuse,texture — an "
                         "EXPLICIT --stages always wins)")
    ap.add_argument("--rig", action="store_true",
                    help="3-sensor bracketed rig (nav + distorted sci + "
                         "haz depth) instead of the single-camera scene; "
                         "calibrate floats rig transforms + depth constraints")
    ap.add_argument("--hard", action="store_true",
                    help="hard-mode accuracy benchmark: per-image "
                         "exposure/gamma jitter + sensor noise + large view "
                         "rotations + a low-texture band; the pipeline runs "
                         "sfm-init -> calibrate FROM THE SFM ESTIMATES (not "
                         "ground-truth poses) and reports ATE + track "
                         "consistency vs ground truth")
    args = ap.parse_args()

    from multiview_tpu.__main__ import main as cli_main

    ws = Path(args.out)
    if ws.exists() and not args.keep:
        shutil.rmtree(ws)
    size = (args.width, args.height)

    t0 = time.perf_counter()
    rig_true = None
    have_ws = args.keep and (ws / "cameras.txt").exists()
    if args.stages is None:
        args.stages = ("calibrate,fuse,texture" if args.rig
                       else "sfm,calibrate,fuse,texture")
    if args.rig:
        if not have_ws or "calibrate" in args.stages:
            # rig_true is needed for the post-calibrate check, so rig
            # workspaces are rebuilt whenever calibrate runs
            rig_true = build_rig_workspace(ws, args.n_images, size, args.focal,
                                           hard=args.hard)
    elif not have_ws:
        build_workspace(ws, args.n_images, size, args.focal, hard=args.hard)
    print(f"[pipeline] workspace ({args.n_images} images {size[0]}x{size[1]}"
          f"{' rig' if args.rig else ''}{' reused' if have_ws else ''}):"
          f" {time.perf_counter() - t0:.1f} s", file=sys.stderr)

    stages = args.stages.split(",")
    timings = {}
    rss = {}

    def peak_rss_mb():
        import resource
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

    def run(name, argv):
        t = time.perf_counter()
        ret = cli_main(argv)
        timings[name] = round(time.perf_counter() - t, 2)
        rss[name] = round(peak_rss_mb(), 1)
        print(f"[pipeline] {name}: {timings[name]} s "
              f"(peak host RSS {rss[name]} MB)", file=sys.stderr)
        assert ret == 0, f"stage {name} failed"

    accuracy = {}
    if "sfm" in stages:
        run("sfm-init", [
            "sfm-init", "--rig_config", str(ws / "rig_config.txt"),
            "--images", str(ws / "images"), "--out_dir", str(ws / "sfm"),
            "--max_features", str(args.max_features),
            "--num_overlaps", str(args.num_overlaps)])
        if args.hard:
            from multiview_tpu.io import nvm as nvm_io
            data = nvm_io.read_nvm(ws / "sfm" / "cameras.nvm")
            nvm_io.write_camera_poses(ws / "sfm" / "cameras_est.txt",
                                      data.cid_to_filename,
                                      data.world_to_cam)
            accuracy["sfm_ate"] = compute_ate(ws / "sfm" / "cameras_est.txt",
                                              ws / "cameras_gt.txt")
            accuracy["tracks"] = check_track_consistency(
                ws / "sfm" / "cameras.nvm", ws / "cameras_gt.txt")
            print(f"[pipeline] sfm ATE: {accuracy['sfm_ate']}", file=sys.stderr)
            print(f"[pipeline] track consistency: {accuracy['tracks']}",
                  file=sys.stderr)
    if "calibrate" in stages and args.hard and args.rig:
        # hard rig mode: stressed 3-sensor scene, calibrate starts from the
        # PERTURBED initial poses (cameras.txt), floats rig + poses, and is
        # judged on rig recovery, trajectory ATE, and depth alignment vs
        # the known terrain (VERDICT r2 #4; the reference's entire purpose
        # is this case, /root/reference/README.md:7-10)
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
        accuracy["rig_recovery"] = rig_errs
        accuracy["calib_ate"] = compute_ate(ws / "calib" / "cameras.txt",
                                            ws / "cameras_gt.txt")
        accuracy["depth_alignment"] = check_depth_alignment(ws / "calib", ws)
        print(f"[pipeline] hard-rig recovery vs truth: {rig_errs}",
              file=sys.stderr)
        print(f"[pipeline] hard-rig ATE: {accuracy['calib_ate']}",
              file=sys.stderr)
        print(f"[pipeline] hard-rig depth alignment: "
              f"{accuracy['depth_alignment']}", file=sys.stderr)
    elif "calibrate" in stages and args.hard:
        # hard mode: calibrate starts from the SfM solution, poses float
        run("calibrate", [
            "calibrate", "--rig_config", str(ws / "rig_config.txt"),
            "--nvm", str(ws / "sfm" / "cameras.nvm"),
            "--images", str(ws / "images"), "--out_dir", str(ws / "calib"),
            "--no_rig", "--camera_poses_to_float",
            "--num_iterations", "20", "--calibrator_num_passes", "2",
            "--max_features", str(args.max_features),
            "--num_overlaps", str(args.num_overlaps), "--save_nvm"])
        accuracy["calib_ate"] = compute_ate(ws / "calib" / "cameras.txt",
                                            ws / "cameras_gt.txt")
        print(f"[pipeline] calibrated ATE: {accuracy['calib_ate']}",
              file=sys.stderr)
    elif "calibrate" in stages:
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
            "--stereo_algorithm", "sgm", "--voxel_size", str(args.voxel_size),
            "--grid_dim", str(args.grid_dim)]
            + (["--sensor", "nav_cam"] if args.rig else []))
    if "texture" in stages:
        run("texture", [
            "texture", "--rig_config", str(calib_rig),
            "--camera_poses", str(calib_poses),
            "--images", str(ws / "images"),
            "--mesh", str(ws / "fused" / "fused_mesh.ply"),
            "--out_dir", str(ws / "textured"),
            "--pixel_size", str(args.pixel_size)]
            + (["--sensor", "nav_cam"] if args.rig else []))

    timings["total"] = round(sum(v for k, v in timings.items()), 2)
    out = {"pipeline_stage_seconds": timings,
           "peak_host_rss_mb_after_stage": rss,
           "n_images": args.n_images,
           "image_size": list(size)}
    if accuracy:
        out["accuracy"] = accuracy
    print(json.dumps(out))


if __name__ == "__main__":
    main()
