"""``sfm-init`` tool — the theia_sfm wrapper equivalent
(`/root/reference/rig_calibrator/bin/theia_sfm`): images -> features ->
matches -> tracks -> global pose initialization -> triangulation -> NVM.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--rig_config", required=True)
    p.add_argument("--images", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--num_overlaps", type=int, default=3)
    p.add_argument("--max_features", type=int, default=1000)
    from multiview_tpu.tools.common import add_sift_args
    add_sift_args(p)
    p.add_argument("--num_ba_iterations", type=int, default=30,
                   help="robust BA refinement after global init (Theia's "
                        "build_reconstruction BA stage); 0 disables")
    p.add_argument("--reconstruction_estimator", default="GLOBAL",
                   choices=["GLOBAL", "INCREMENTAL"],
                   help="pose-initialization strategy (the engine option "
                        "behind theia_flags.txt:64; the reference recipe "
                        "pins GLOBAL)")
    p.add_argument("--absolute_pose_reprojection_error_threshold",
                   type=float, default=4.0,
                   help="INCREMENTAL: PnP inlier threshold in pixels, "
                        "relative to a 1024-wide image (theia_flags.txt:112)")
    p.add_argument("--min_num_absolute_pose_inliers", type=int, default=30,
                   help="INCREMENTAL: theia_flags.txt:114")
    p.add_argument("--partial_bundle_adjustment_num_views", type=int,
                   default=20, help="INCREMENTAL: theia_flags.txt:113")
    p.add_argument("--full_bundle_adjustment_growth_percent", type=float,
                   default=5.0, help="INCREMENTAL: theia_flags.txt:114")


def _undistort_obs_batched(pix, cam_idx, sensors_of, cam_params):
    """DISTORTED -> UNDISTORTED_C for all observations, one batched convert
    per sensor instead of one device dispatch per observation row.

    Returns (und [M,2] np, focal [M] np)."""
    import jax.numpy as jnp
    from multiview_tpu.geometry.camera import DISTORTED, UNDISTORTED_C

    pix = np.asarray(pix, float)
    obs_sensor = np.asarray([sensors_of[c] for c in np.asarray(cam_idx)])
    und = np.zeros_like(pix)
    focal = np.zeros(len(pix))
    for s in np.unique(obs_sensor):
        rows = np.where(obs_sensor == s)[0]
        cp = cam_params[int(s)]
        und[rows] = np.asarray(cp.convert(jnp.asarray(pix[rows]), DISTORTED,
                                          UNDISTORTED_C))
        focal[rows] = float(cp.mean_focal)
    return und, focal


def _reresect_views(poses, trackset, sensors_of, cam_params, thr,
                    min_obs: int = 12):
    """PnP-RANSAC every view against the structure triangulated from the
    current poses; adopt the PnP pose where it explains clearly more
    observations than the current one.

    Repairs init-outlier cameras: on near-planar (nadir-survey) scenes the
    two-view geometry feeding rotation averaging is fragile, and a view
    whose initial rotation is ~10 deg off survives the robust BA as a
    self-consistent outlier (its residuals are simply down-weighted). The
    re-resection role of TheiaSfM's absolute-pose step. Returns
    (poses, n_replaced)."""
    import jax.numpy as jnp
    from multiview_tpu.geometry import pose as pose_mod, triangulation as tri_mod
    from multiview_tpu.sfm import ransac as ransac_mod
    from multiview_tpu.sfm.tracks import tracks_to_arrays
    from multiview_tpu.utils.padding import group_ranks

    cam_idx, _, pix, pid = tracks_to_arrays(trackset)
    und, focal_rows = _undistort_obs_batched(pix, cam_idx, sensors_of,
                                             cam_params)
    uv = und / focal_rows[:, None]

    poses_np = np.asarray(poses)
    P = tri_mod.projection_matrix(jnp.asarray(focal_rows),
                                  jnp.asarray(poses_np[cam_idx]))
    n_pts = len(trackset.tracks)
    max_views = max(np.bincount(pid).max(), 2)
    tb = np.full((n_pts, max_views), -1)
    order, spid, rank = group_ranks(pid)
    tb[spid, rank] = order
    xyz, _, ok = tri_mod.triangulate_tracks(
        jnp.asarray(np.asarray(P)[np.maximum(tb, 0)]),
        jnp.asarray(und[np.maximum(tb, 0)]), jnp.asarray(tb >= 0), 3)
    xyz = np.asarray(xyz)
    okm = np.asarray(ok)

    def count_inliers(q, X, x):
        Xc = np.asarray(pose_mod.pose_apply(jnp.asarray(q), jnp.asarray(X)))
        z = Xc[:, 2]
        proj = Xc[:, :2] / np.maximum(z[:, None], 1e-12)
        err = np.linalg.norm(proj - x, axis=-1)
        return int(np.sum((err <= thr) & (z > 0)))

    # np.asarray of a device array is a READ-ONLY view; the replacement
    # loop below writes into it — copy
    poses_np = np.array(poses_np)
    n_replaced = 0
    for v in range(len(poses_np)):
        rows = np.where((cam_idx == v) & okm[pid])[0]
        if len(rows) < min_obs:
            continue
        X, x = xyz[pid[rows]], uv[rows]
        res = ransac_mod.ransac_pnp(jnp.asarray(X), jnp.asarray(x),
                                    threshold=thr)
        n_cur = count_inliers(poses_np[v], X, x)
        n_new = int(res.num_inliers)
        if n_new > 1.2 * n_cur + 5:
            print(f"re-resection: view {v} pose replaced "
                  f"({n_cur} -> {n_new} inliers of {len(rows)})")
            poses_np[v] = np.asarray(res.pose)
            n_replaced += 1
    return jnp.asarray(poses_np), n_replaced


def run(args):
    import os as _os
    import time as _time
    _t0 = _time.perf_counter()
    _dbg = True

    def _mark(label):
        nonlocal _t0
        print(f"[sfm-init] {label}: {_time.perf_counter() - _t0:.1f} s")
        _t0 = _time.perf_counter()

    import jax.numpy as jnp
    from multiview_tpu.io import rig_config as rc, nvm as nvm_io
    from multiview_tpu.sfm import pipeline as fe, global_sfm
    from multiview_tpu.sfm.tracks import tracks_to_arrays
    from multiview_tpu.geometry import pose as pose_mod, triangulation as tri_mod
    from multiview_tpu.geometry.camera import DISTORTED, UNDISTORTED_C
    from multiview_tpu.tools import common

    rig = rc.read_rig_config(args.rig_config)
    sensor_names = [s.name for s in rig.sensors]
    cam_params = [common.cam_params_from_sensor(s) for s in rig.sensors]

    image_data = common.scan_image_dir(args.images, sensor_names)
    records = [r for recs in image_data for r in recs]
    records.sort(key=lambda r: r.timestamp)
    sensors_of = []
    for r in records:
        sensors_of.append(sensor_names.index(Path(r.name).parent.name))
    print(f"Found {len(records)} images")

    cfg = common.frontend_config_from_args(args)
    _mark("load images")
    trackset = fe.detect_match_features([r.payload for r in records], cfg)
    _mark("detect+match+tracks")
    print(f"Built {len(trackset.tracks)} tracks")

    # pairwise unit-plane correspondences from the tracks. Undistortion is
    # batched ONE call per image: converting each observation individually
    # dispatched thousands of single-point device ops (each a multi-ms
    # round-trip through the remote-compile tunnel — measured 85 s of the
    # stage at 5 images/391 tracks; ~1 s batched).
    from multiview_tpu.utils.padding import pad_rows_pow2
    und_per_img = []
    for i in range(len(records)):
        cp = cam_params[sensors_of[i]]
        kps_i = np.asarray(trackset.keypoints[i])
        if len(kps_i) == 0:
            und_per_img.append(np.zeros((0, 2)))
            continue
        kp_pad = pad_rows_pow2(kps_i.astype(np.float64))
        u = np.asarray(cp.convert(jnp.asarray(kp_pad), DISTORTED,
                                  UNDISTORTED_C))[:len(kps_i)]
        und_per_img.append(u / float(cp.mean_focal))

    pair_data = {}
    pair_pids = {}
    for pid, track in enumerate(trackset.tracks):
        cids = sorted(track)
        for a in range(len(cids)):
            for b in range(a + 1, len(cids)):
                i, j = cids[a], cids[b]
                ui = und_per_img[i][track[i]]
                uj = und_per_img[j][track[j]]
                pair_data.setdefault((i, j), ([], []))
                pair_data[(i, j)][0].append(ui)
                pair_data[(i, j)][1].append(uj)
                pair_pids.setdefault((i, j), []).append(pid)
    pair_data = {k: (np.stack(v[0]), np.stack(v[1]))
                 for k, v in pair_data.items() if len(v[0]) >= 16}
    pair_pids = {k: np.asarray(v) for k, v in pair_pids.items()
                 if k in pair_data}
    print(f"View graph edges: {len(pair_data)}")

    if args.reconstruction_estimator == "INCREMENTAL":
        from multiview_tpu.sfm import incremental as inc
        # flat unit-plane track observations (normalized by each obs'
        # sensor focal, mirroring the triangulation block below)
        cam_idx_i, _, pix_i, pid_i = tracks_to_arrays(trackset)
        und_i, focal_i = _undistort_obs_batched(pix_i, cam_idx_i, sensors_of,
                                                cam_params)
        uv_i = und_i / focal_i[:, None]
        mean_f = float(np.mean([cp.mean_focal for cp in cam_params]))
        mean_w = float(np.mean([cp.distorted_size[0] for cp in cam_params]))
        thr = (args.absolute_pose_reprojection_error_threshold
               * (mean_w / 1024.0) / mean_f)
        inc_opts = inc.IncrementalOptions(
            reproj_threshold=thr,
            min_pnp_inliers=args.min_num_absolute_pose_inliers,
            partial_ba_views=args.partial_bundle_adjustment_num_views,
            full_ba_growth_percent=args.full_bundle_adjustment_growth_percent,
            verbose=True)
        poses, reg_mask, _, _ = inc.run_incremental_sfm(
            pair_data, len(records), (cam_idx_i, pid_i, uv_i), inc_opts)
        print(f"Incremental SfM registered {int(reg_mask.sum())}"
              f"/{len(records)} views")
    else:
        _mark("pair data prep")
        poses, reg_mask = global_sfm.run_global_sfm(
            pair_data, len(records), pair_pids=pair_pids, return_mask=True)

    if int(reg_mask.sum()) < len(records):
        # unregistered views (incremental: PnP failed; global: outside the
        # largest connected component) have no pose: drop them from the
        # output reconstruction (Theia likewise exports only estimated views)
        from multiview_tpu.sfm.tracks import subset_views
        dropped = [records[i].name for i in range(len(records))
                   if not reg_mask[i]]
        print(f"Warning: dropping unregistered view(s): {dropped}")
        keep = [i for i in range(len(records)) if reg_mask[i]]
        records = [records[i] for i in keep]
        sensors_of = [sensors_of[i] for i in keep]
        trackset = subset_views(trackset, keep)
        poses = jnp.asarray(np.asarray(poses)[keep])

    _mark("global/incremental sfm")
    # ---- robust BA refinement (TheiaSfM runs a full Huber BA after global
    # init, theia_flags.txt:26-165 — essential here: direction-only position
    # averaging cannot recover spacing along collinear trajectories; the
    # reprojection constraints of shared tracks can) ----
    def refine_ba(poses):
        from multiview_tpu.calib import (bracketing as br, assemble,
                                         problem as prob, calibrator as cal)
        entries = [br.CameraEntry(
            camera_type=sensors_of[i], timestamp=records[i].timestamp,
            ref_timestamp=records[i].timestamp, beg_ref_index=i,
            end_ref_index=i, image_name=records[i].name)
            for i in range(len(records))]
        observations, num_points = assemble.build_observations(
            rig, entries, None, trackset, no_rig=True)
        poses_np = np.asarray(poses)
        state = assemble.build_state(
            rig, entries, poses_np,
            np.asarray([r.timestamp for r in records]), poses_np,
            num_points, no_rig=True)
        spec = prob.FloatSpec(cam_poses=True)
        opts = prob.BAOptions(no_rig=True, robust_threshold=1.0)
        result = cal.optimize_rig(
            state, observations, tuple(s.model for s in rig.sensors),
            spec, opts, num_passes=1,
            num_iterations=args.num_ba_iterations,
            sensor_names=sensor_names, verbose=False)
        return jnp.asarray(np.asarray(result.state.world_to_ref))

    if args.num_ba_iterations > 0 and len(trackset.tracks) >= 8:
        poses = refine_ba(poses)
        # re-resection repair: PnP every view against the BA'd structure;
        # a replaced pose means an init outlier survived the robust BA, so
        # refine once more from the repaired configuration
        mean_f = float(np.mean([cam_params[s].mean_focal
                                for s in set(sensors_of)]))
        mean_w = float(np.mean([cam_params[s].distorted_size[0]
                                for s in set(sensors_of)]))
        thr = (args.absolute_pose_reprojection_error_threshold
               * (mean_w / 1024.0) / mean_f)
        poses, n_fix = _reresect_views(poses, trackset, sensors_of,
                                       cam_params, thr)
        if n_fix:
            poses = refine_ba(poses)

    _mark("robust BA refinement")
    # triangulate all tracks with the initial poses
    cam_idx, fid, pix, pid = tracks_to_arrays(trackset)
    und, focal_rows = _undistort_obs_batched(pix, cam_idx, sensors_of,
                                             cam_params)
    P = tri_mod.projection_matrix(jnp.asarray(focal_rows),
                                  jnp.asarray(np.asarray(poses)[cam_idx]))
    n_pts = len(trackset.tracks)
    max_views = max(np.bincount(pid).max(), 2)
    tb = np.full((n_pts, max_views), -1)
    # vectorized fill: rank of each observation within its track
    from multiview_tpu.utils.padding import group_ranks
    order, spid, rank = group_ranks(pid)
    tb[spid, rank] = order
    idx = np.maximum(tb, 0)
    valid = tb >= 0
    xyz, _, ok = tri_mod.triangulate_tracks(
        jnp.asarray(np.asarray(P)[idx]), jnp.asarray(und[idx]),
        jnp.asarray(valid), 3)
    print(f"Triangulated {int(np.asarray(ok).sum())}/{n_pts} tracks")

    # write NVM (keypoints offset by optical center)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    kp_off = []
    for i, recs in enumerate(records):
        s = sensors_of[i]
        kp_off.append(trackset.keypoints[i] - np.asarray(rig.sensors[s].optical_center))
    okm = np.asarray(ok)
    data = nvm_io.NvmData(
        cid_to_filename=[r.name for r in records],
        focal_lengths=np.asarray([float(cam_params[s].mean_focal)
                                  for s in sensors_of]),
        cid_to_keypoint=kp_off,
        pid_to_cid_fid=[t for p, t in enumerate(trackset.tracks) if okm[p]],
        pid_to_xyz=np.asarray(xyz)[okm],
        world_to_cam=np.asarray(pose_mod.pose_to_matrix(poses)))
    nvm_io.write_nvm(out / "cameras.nvm", data)
    _mark("triangulate + write")
    print(f"Writing: {out/'cameras.nvm'}")
    return 0
