"""Tests: depth I/O formats, registration wiring, undistortion, front-end
orchestration."""

import numpy as np
import jax.numpy as jnp
import pytest

from multiview_tpu.io import depth_io
from multiview_tpu.calib import registration as reg_wire
from multiview_tpu.calib import problem as prob
from multiview_tpu.geometry import pose as P
from multiview_tpu.geometry.camera import CameraParams
from multiview_tpu.utils import synthetic as syn
from multiview_tpu.utils import undistort as und


class TestDepthIO:
    def test_xyz_image_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.normal(size=(12, 17, 3)).astype(np.float32)
        p = tmp_path / "cloud.pc"
        depth_io.write_xyz_image(p, img)
        out = depth_io.read_xyz_image(p)
        np.testing.assert_array_equal(out, img)

    def test_pcd_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        xyz = rng.normal(size=(50, 3))
        inten = rng.uniform(size=50)
        p = tmp_path / "c.pcd"
        depth_io.write_pcd(p, xyz, intensity=inten)
        xyz2, normals = depth_io.read_pcd(p)
        np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
        np.testing.assert_allclose(normals[:, 0], inten, atol=1e-6)
        np.testing.assert_allclose(normals[:, 1], 1.0)  # weight

    def test_voxblox_export_layout(self, tmp_path):
        rng = np.random.default_rng(2)
        depth = rng.normal(size=(4, 5, 3)).astype(np.float32)
        depth[0, 0] = 0  # invalid
        inten = rng.uniform(size=(4, 5)).astype(np.float32)
        w2c = np.tile(np.eye(4), (1, 1, 1))
        depth_io.export_to_voxblox(tmp_path, ["haz_cam"],
                                   [(0, 1234.5, depth, inten)],
                                   np.tile(np.eye(4), (1, 1, 1)), w2c)
        sub = tmp_path / "voxblox" / "haz_cam"
        idx = (sub / "index.txt").read_text().splitlines()
        assert len(idx) == 2
        xyz, normals = depth_io.read_pcd(idx[1])
        assert len(xyz) == 19  # 20 pixels - 1 invalid
        pose = np.loadtxt(idx[0])
        np.testing.assert_allclose(pose, np.eye(4))

    def test_hugin_and_xyz_parsers(self, tmp_path):
        pto = tmp_path / "c.pto"
        pto.write_text(
            'i w100 h100 f0 n"img_a.jpg"\n'
            'i w100 h100 f0 n"img_b.jpg"\n'
            "c n0 N1 x367 y240 X144.18 Y243.04 t0\n"
            "c n0 N1 x10 y20 X30 Y40 t0\n")
        images, rows = depth_io.parse_hugin_control_points(pto)
        assert images == ["img_a.jpg", "img_b.jpg"]
        assert rows.shape == (2, 6)
        np.testing.assert_allclose(rows[0], [0, 1, 367, 240, 144.18, 243.04])

        xyz = tmp_path / "p.xyz"
        xyz.write_text("# comment\n1.0, 2.0, 3.0\n\n4 5 6\n")
        out = depth_io.parse_xyz(xyz)
        np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6]])


class TestRegistrationWire:
    def test_register_scene_to_control_points(self):
        """Scale/rotate/shift a cube scene; registration must restore it via
        2 control points triangulated from images."""
        scene = syn.make_cube_scene(n_images=8, n_per_face=3)
        st = scene.true_state

        # warp the whole solution by a similarity
        s_true = 2.0
        q = P.quat_exp(jnp.asarray([0.1, -0.2, 0.15]))
        t = jnp.asarray([1.0, -2.0, 0.5])
        T = P.make_pose(t, q)
        from multiview_tpu.geometry import registration as reg_geo
        warped = prob.RigState(
            world_to_ref=reg_geo.transform_cameras(s_true, T, st.world_to_ref),
            ref_to_cam=st.ref_to_cam,
            timestamp_offsets=st.timestamp_offsets, focal=st.focal,
            optical_center=st.optical_center, dist=st.dist,
            depth_to_image=st.depth_to_image, depth_scale=st.depth_scale,
            points=reg_geo.transform_points(s_true, T, st.points))

        cam = CameraParams.create(scene.image_size, float(st.focal[0]),
                                  np.asarray(st.optical_center[0]))
        # control points: 3 structure points seen in images 0 and 1
        obs = scene.observations.pixels[0]
        pix = np.asarray(obs.pix)
        beg = np.asarray(obs.beg_idx)
        pid = np.asarray(obs.point_idx)
        ctrl = []
        for target_pid in [0, 5, 11]:
            r0 = np.nonzero((beg == 0) & (pid == target_pid))[0]
            r1 = np.nonzero((beg == 1) & (pid == target_pid))[0]
            if len(r0) and len(r1):
                ctrl.append((pix[r0[0]], pix[r1[0]], target_pid))
        assert len(ctrl) >= 2
        control_images = ["im_0.jpg", "im_1.jpg"]
        rows = np.asarray([[0, 1, c[0][0], c[0][1], c[1][0], c[1][1]] for c in ctrl])
        measured = np.asarray(st.points)[[c[2] for c in ctrl]]

        image_names = [f"im_{i}.jpg" for i in range(scene.n_images)]
        tri = reg_wire.triangulate_control_points(
            control_images, rows, image_names, np.asarray(warped.world_to_ref),
            [0] * scene.n_images, [cam])
        new_state, scale, err = reg_wire.register_state(warped, tri,
                                                        measured, verbose=False)
        assert err < 1e-6, f"registration err {err}"
        # cameras restored to the truth
        np.testing.assert_allclose(np.asarray(new_state.points),
                                   np.asarray(st.points), atol=1e-6)
        ctr_t = np.asarray(P.pose_t(P.pose_inverse(st.world_to_ref)))
        ctr_n = np.asarray(P.pose_t(P.pose_inverse(new_state.world_to_ref)))
        np.testing.assert_allclose(ctr_n, ctr_t, atol=1e-6)


class TestUndistort:
    def test_identity_for_pinhole(self):
        cam = CameraParams.create((64, 48), (50.0, 50.0), (32.0, 24.0))
        rng = np.random.default_rng(3)
        img = rng.uniform(size=(48, 64)).astype(np.float32)
        out, K = und.undistort_image(img, cam)
        np.testing.assert_allclose(out, img, atol=1e-5)
        np.testing.assert_allclose(K[0, 2], 32.0)

    def test_fov_roundtrip_center_preserved(self):
        cam = CameraParams.create((64, 48), (50.0, 50.0), (32.0, 24.0), (0.9,))
        img = np.zeros((48, 64), np.float32)
        img[20:28, 28:36] = 1.0  # block at center
        out, K = und.undistort_image(img, cam)
        # center block survives (center is a fixed point of FOV distortion)
        assert out[24, 32] > 0.5

    def test_crop_window(self):
        cam = CameraParams.create((64, 48), (50.0, 50.0), (32.0, 24.0))
        img = np.random.default_rng(0).uniform(size=(48, 64)).astype(np.float32)
        out, K = und.undistort_image(img, cam, crop_window=(32, 24))
        assert out.shape == (24, 32)
        np.testing.assert_allclose(K[0, 2], 32.0 - 16)

    def test_tsai_cam_writers(self, tmp_path):
        K = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
        c2w = np.eye(4)
        c2w[:3, 3] = [1, 2, 3]
        und.write_tsai_camera(tmp_path / "cam.tsai", K, c2w)
        text = (tmp_path / "cam.tsai").read_text()
        assert "PINHOLE" in text and "fu = 100.0" in text and "C = 1.0 2.0 3.0" in text
        und.write_texrecon_cam(tmp_path / "cam.cam", K, np.linalg.inv(c2w), (100, 80))
        lines = (tmp_path / "cam.cam").read_text().splitlines()
        assert len(lines) == 2
        assert float(lines[1].split()[0]) == 1.0  # f/maxdim = 100/100


class TestFrontendPipeline:
    def test_images_to_tracks(self):
        from multiview_tpu.sfm import pipeline
        rng = np.random.default_rng(4)
        base = np.kron(rng.uniform(size=(20, 20)), np.ones((8, 8))).astype(np.float32)
        images = [base,
                  np.roll(base, 12, axis=1),
                  np.roll(base, 24, axis=1)]
        cfg = pipeline.FrontendConfig(max_features=250, num_overlaps=2,
                                      ransac_threshold=3.0)
        ts = pipeline.detect_match_features(images, cfg)
        assert len(ts.tracks) > 30
        three_view = [t for t in ts.tracks if len(t) == 3]
        assert len(three_view) > 10
        # track keypoints obey the known shifts
        t = three_view[0]
        p0 = ts.keypoints[0][t[0]]
        p1 = ts.keypoints[1][t[1]]
        p2 = ts.keypoints[2][t[2]]
        np.testing.assert_allclose(p1 - p0, [12, 0], atol=1.5)
        np.testing.assert_allclose(p2 - p0, [24, 0], atol=1.5)
