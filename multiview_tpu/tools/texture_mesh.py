"""``texture`` tool — the texrecon wrapper equivalent
(`/root/reference/rig_calibrator/bin/texrecon`): mesh + calibrated images ->
view selection -> atlas -> seam leveling -> textured OBJ/MTL/PNG.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--rig_config", required=True)
    p.add_argument("--camera_poses", required=True)
    p.add_argument("--images", required=True)
    p.add_argument("--mesh", required=True, help="PLY mesh to texture")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--sensor", default=None)
    p.add_argument("--pixel_size", type=float, default=0.01,
                   help="texel size in meters (texture_processing.cc formModel)")
    p.add_argument("--max_page", type=int, default=8192,
                   help="texture page size bound; charts spill into as "
                        "many pages as needed (multi-page atlas)")
    p.add_argument("--no_seam_leveling", action="store_true")
    p.add_argument("--no_local_seam_leveling", action="store_true",
                   help="disable the per-texel Poisson seam step (texrecon's "
                        "local seam leveling)")
    p.add_argument("--no_occlusion", action="store_true")
    p.add_argument("--no_gauss_clamping", action="store_true",
                   help="disable photometric outlier removal (texrecon's "
                        "default outlier_removal is gauss_clamping)")
    p.add_argument("--grayscale", action="store_true",
                   help="texture in grayscale; default is color like the "
                        "reference (bin/texrecon feeds BGR jpgs)")
    p.add_argument("--smoothness_weight", type=float, default=0.1,
                   help="Potts smoothness of the view-selection MRF "
                        "(mapmap's role in texrecon); 0 = pure best-cost")


def run(args):
    import time as _time
    import jax.numpy as jnp
    from multiview_tpu.io import rig_config as rc, nvm as nvm_io, ply
    from multiview_tpu.texture import texturing
    from multiview_tpu.geometry import pose as pose_mod
    from multiview_tpu.tools import common

    rig = rc.read_rig_config(args.rig_config)
    sensor_names = [s.name for s in rig.sensors]
    cam_params = [common.cam_params_from_sensor(s) for s in rig.sensors]
    pose_names, pose_mats = nvm_io.read_camera_poses(args.camera_poses)
    name_to_pose = {Path(n).name: m for n, m in zip(pose_names, pose_mats)}

    mesh = ply.read_ply(args.mesh)
    verts = mesh["vertices"]
    faces = mesh["faces"]
    print(f"Mesh: {len(verts)} verts, {len(faces)} faces")

    image_data = common.scan_image_dir(args.images, sensor_names,
                                       color=not args.grayscale)
    images, poses, cams = [], [], []
    for s, recs in enumerate(image_data):
        if args.sensor and sensor_names[s] != args.sensor:
            continue
        for r in recs:
            nm = Path(r.name).name
            if nm in name_to_pose:
                images.append(r.payload)
                poses.append(np.asarray(pose_mod.matrix_to_pose(
                    jnp.asarray(name_to_pose[nm]))))
                cams.append(cam_params[s])
    if not images:
        raise SystemExit("No posed images found")
    print(f"Texturing from {len(images)} views")

    _t0 = _time.perf_counter()

    def _mark(label):
        nonlocal _t0
        print(f"[texture] {label}: {_time.perf_counter() - _t0:.1f} s")
        _t0 = _time.perf_counter()

    poses_j = jnp.asarray(np.stack(poses))
    cost, usable = texturing.view_costs(
        jnp.asarray(verts), jnp.asarray(faces), poses_j,
        occlusion=not args.no_occlusion)
    if not args.no_gauss_clamping:
        colors = texturing.sample_face_view_colors(
            jnp.asarray(verts), jnp.asarray(faces), images, cams,
            list(poses_j), usable)
        keep, _ = texturing.gauss_clamping(colors, usable)
        cost = jnp.where(keep, cost, jnp.inf)
    _mark("view costs + clamping")
    adjacency = texturing.face_adjacency(faces)
    if args.smoothness_weight > 0 and len(adjacency):
        nbr = texturing.face_neighbors(faces, adjacency)
        best, visible = texturing.mrf_view_selection(
            cost, jnp.isfinite(cost), nbr, smoothness=args.smoothness_weight)
        # quality metric: the MRF labeling must not be worse than pure argmin
        # at the same energy (mapmap's role; SURVEY.md 2.2)
        argmin = np.asarray(jnp.argmin(cost, axis=-1))
        e_icm = texturing.mrf_energy(np.asarray(cost), np.asarray(best), nbr,
                                     args.smoothness_weight)
        e_arg = texturing.mrf_energy(np.asarray(cost), argmin, nbr,
                                     args.smoothness_weight)
        print(f"MRF energy: argmin {e_arg:.4f} -> ICM {e_icm:.4f}")
    else:
        best = jnp.argmin(cost, axis=-1).astype(jnp.int32)
        visible = jnp.isfinite(jnp.min(cost, axis=-1))
    _mark("adjacency + MRF labeling")
    atlas = texturing.build_atlas(verts, faces, pixel_size=args.pixel_size,
                                  max_page=args.max_page)
    if atlas.num_pages > 1:
        print(f"Atlas: {atlas.num_pages} pages of <= {args.max_page}^2 texels")

    gains = None
    channels = 1 if args.grayscale else 3
    if not args.no_seam_leveling:
        # per-face mean color from a coarse sample (face centers); gains are
        # solved per channel (texrecon levels each color channel separately)
        ctr, _, _ = texturing.face_geometry(jnp.asarray(verts), jnp.asarray(faces))
        face_col = np.zeros((len(faces), channels))
        bv = np.asarray(best)
        for v in range(len(images)):
            sel = np.nonzero(np.asarray(visible) & (bv == v))[0]
            if len(sel) == 0:
                continue
            Xc = pose_mod.pose_apply(poses_j[v], ctr[sel])
            pix = cams[v].project_cam_to_dist_pix(Xc)
            img = jnp.asarray(np.asarray(images[v], np.float32))
            from multiview_tpu.texture.texturing import _bilinear
            face_col[sel] = np.asarray(
                _bilinear(img, pix[:, 0], pix[:, 1])).reshape(len(sel), channels)
        if args.grayscale:
            face_col = face_col[:, 0]
        gains, lev_info = texturing.global_seam_leveling(
            face_col, bv, adjacency, return_info=True)
        print(f"Global seam leveling: {lev_info['iterations']} sweeps, "
              f"relative residual {lev_info['rel_residual']:.2e}")

    _mark("atlas + global gains")
    vgains = (texturing.vertex_gains_from_faces(len(verts), faces, gains)
              if gains is not None else None)
    page = texturing.render_atlas(atlas, verts, faces, best, visible, images,
                                  cams, list(poses_j), face_gain=gains,
                                  vertex_gain=vgains)
    _mark("render atlas")
    if len(adjacency):
        stats = texturing.seam_step_stats(page, atlas, verts, faces, best,
                                          visible, adjacency)
        print(f"Seam step before local leveling: {stats}")
    if not args.no_local_seam_leveling and len(adjacency):
        page = texturing.local_seam_leveling(page, atlas, verts, faces, best,
                                             visible, adjacency)
        stats = texturing.seam_step_stats(page, atlas, verts, faces, best,
                                          visible, adjacency)
        print(f"Seam step after local leveling: {stats}")
    _mark("local seam leveling + stats")
    out = Path(args.out_dir)
    obj = texturing.write_textured_obj(out / "textured_mesh", verts, faces,
                                       atlas, page)
    print(f"Writing: {obj}")
    return 0
