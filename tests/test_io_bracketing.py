"""Tests for rig_config/NVM/cameras.txt I/O round-trips and bracketing parity."""

import math

import numpy as np
import pytest

from multiview_tpu.io import rig_config as rc
from multiview_tpu.io import nvm as nvm_io
from multiview_tpu.calib import bracketing as br


def make_rig(tmp_path):
    rng = np.random.default_rng(0)

    def rand_affine():
        A = np.eye(4)
        A[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(A[:3, :3]) < 0:
            A[:3, :3] *= -1
        A[:3, 3] = rng.normal(size=3)
        return A

    sensors = [
        rc.SensorConfig(
            name="nav_cam", focal_length=600.0,
            optical_center=np.array([640.0, 480.0]),
            distortion=np.array([]), image_size=(1280, 960),
            distorted_crop_size=(1280, 960), undistorted_image_size=(1400, 1000),
            ref_to_sensor=np.eye(4), depth_to_image=np.eye(4), timestamp_offset=0.0),
        rc.SensorConfig(
            name="sci_cam", focal_length=900.0,
            optical_center=np.array([320.1, 239.8]),
            distortion=np.array([-0.28, 0.07, 1e-4, -2e-4, 0.015]),
            image_size=(640, 480), distorted_crop_size=(600, 440),
            undistorted_image_size=(700, 520),
            ref_to_sensor=rand_affine(), depth_to_image=rand_affine(),
            timestamp_offset=0.37),
        rc.SensorConfig(
            name="haz_cam", focal_length=250.0,
            optical_center=np.array([120.0, 90.0]),
            distortion=np.array([0.9]), image_size=(240, 180),
            distorted_crop_size=(240, 180), undistorted_image_size=(260, 200),
            ref_to_sensor=rand_affine(), depth_to_image=rand_affine(),
            timestamp_offset=-0.11),
    ]
    return rc.RigConfig(sensors=sensors)


class TestRigConfigIO:
    def test_roundtrip(self, tmp_path):
        rig = make_rig(tmp_path)
        path = tmp_path / "rig_config.txt"
        rc.write_rig_config(path, rig)
        rig2 = rc.read_rig_config(path)
        assert rig2.ref_sensor_name == "nav_cam"
        assert [s.name for s in rig2.sensors] == ["nav_cam", "sci_cam", "haz_cam"]
        for a, b in zip(rig.sensors, rig2.sensors):
            assert a.focal_length == b.focal_length
            np.testing.assert_array_equal(a.optical_center, b.optical_center)
            np.testing.assert_array_equal(a.distortion, b.distortion)
            assert a.image_size == b.image_size
            assert a.distorted_crop_size == b.distorted_crop_size
            assert a.undistorted_image_size == b.undistorted_image_size
            np.testing.assert_array_equal(a.ref_to_sensor, b.ref_to_sensor)
            np.testing.assert_array_equal(a.depth_to_image, b.depth_to_image)
            assert a.timestamp_offset == b.timestamp_offset

    def test_ref_sensor_must_be_first(self, tmp_path):
        rig = make_rig(tmp_path)
        path = tmp_path / "rig_config.txt"
        rc.write_rig_config(path, rig)
        text = path.read_text().replace("ref_sensor_name: nav_cam",
                                        "ref_sensor_name: sci_cam")
        path.write_text(text)
        with pytest.raises(ValueError):
            rc.read_rig_config(path)

    def test_comments_and_blanks_ignored(self, tmp_path):
        rig = make_rig(tmp_path)
        path = tmp_path / "rig_config.txt"
        rc.write_rig_config(path, rig)
        lines = path.read_text().splitlines()
        lines.insert(1, "# a comment")
        lines.insert(3, "   ")
        path.write_text("\n".join(lines))
        rig2 = rc.read_rig_config(path)
        assert len(rig2.sensors) == 3


class TestNvmIO:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        C, P = 4, 12
        w2c = np.tile(np.eye(4), (C, 1, 1))
        for c in range(C):
            Q = np.linalg.qr(rng.normal(size=(3, 3)))[0]
            if np.linalg.det(Q) < 0:
                Q *= -1
            w2c[c, :3, :3] = Q
            w2c[c, :3, 3] = rng.normal(size=3)
        keypoints = [rng.normal(size=(P, 2)) * 100 for _ in range(C)]
        pid_to_cid_fid = []
        for p in range(P):
            cams = sorted(rng.choice(C, rng.integers(2, C + 1), replace=False))
            pid_to_cid_fid.append({int(c): p for c in cams})
        xyz = rng.normal(size=(P, 3))
        data = nvm_io.NvmData([f"img_{c}.jpg" for c in range(C)],
                              np.full(C, 600.0), keypoints, pid_to_cid_fid, xyz, w2c)
        path = tmp_path / "out.nvm"
        nvm_io.write_nvm(path, data)
        data2 = nvm_io.read_nvm(path)
        assert data2.cid_to_filename == data.cid_to_filename
        np.testing.assert_allclose(data2.pid_to_xyz, xyz, atol=1e-12)
        np.testing.assert_allclose(data2.world_to_cam, w2c, atol=1e-9)
        assert data2.pid_to_cid_fid == pid_to_cid_fid
        for c in range(C):
            for p, cid_fid in enumerate(pid_to_cid_fid):
                if c in cid_fid:
                    np.testing.assert_allclose(
                        data2.cid_to_keypoint[c][cid_fid[c]],
                        keypoints[c][cid_fid[c]], atol=1e-12)

    def test_camera_poses_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        C = 5
        w2c = np.tile(np.eye(4), (C, 1, 1))
        w2c[:, :3, 3] = rng.normal(size=(C, 3))
        names = [f"cam/im_{i}.jpg" for i in range(C)]
        path = tmp_path / "cameras.txt"
        nvm_io.write_camera_poses(path, names, w2c)
        names2, w2c2 = nvm_io.read_camera_poses(path)
        assert names2 == names
        np.testing.assert_allclose(w2c2, w2c, atol=1e-15)


def recs(times, prefix="im"):
    return [br.ImageRecord(t, f"{prefix}_{t:.4f}") for t in times]


class TestBracketing:
    def test_ref_and_bracketed(self):
        ref_ts = [0.0, 1.0, 2.0, 3.0]
        image_data = [recs(ref_ts, "ref"), recs([0.45, 1.55, 2.5, 3.4], "cam1")]
        cams, min_off, max_off = br.lookup_images_and_brackets(
            ref_ts, image_data, [], [0.0, 0.0], bracket_len=1.5)
        ref_cams = [c for c in cams if c.camera_type == 0]
        cam1 = [c for c in cams if c.camera_type == 1]
        assert len(ref_cams) == 4
        # 0.45 in [0,1), 1.55 in [1,2), 2.5 in [2,3); 3.4 beyond last bracket
        assert [c.timestamp for c in cam1] == [0.45, 1.55, 2.5]
        assert cam1[0].beg_ref_index == 0 and cam1[0].end_ref_index == 1
        # offset bounds contain 0 and are tight
        assert min_off[1] < 0 < max_off[1]

    def test_picks_closest_to_midpoint(self):
        ref_ts = [0.0, 1.0]
        image_data = [recs(ref_ts, "ref"), recs([0.1, 0.48, 0.9], "cam1")]
        cams, _, _ = br.lookup_images_and_brackets(
            ref_ts, image_data, [], [0.0, 0.0], bracket_len=1.5)
        cam1 = [c for c in cams if c.camera_type == 1]
        assert len(cam1) == 1 and cam1[0].timestamp == 0.48

    def test_bracket_len_gate(self):
        """Brackets longer than bracket_len only admit best == beg."""
        ref_ts = [0.0, 2.0]
        image_data = [recs(ref_ts, "ref"), recs([0.9], "cam1")]
        cams, _, _ = br.lookup_images_and_brackets(
            ref_ts, image_data, [], [0.0, 0.0], bracket_len=0.6)
        assert not [c for c in cams if c.camera_type == 1]
        # but exact-beg time is admitted
        image_data = [recs(ref_ts, "ref"), recs([0.0], "cam1")]
        cams, _, _ = br.lookup_images_and_brackets(
            ref_ts, image_data, [], [0.0, 0.0], bracket_len=0.6)
        assert [c.timestamp for c in cams if c.camera_type == 1] == [0.0]

    def test_timestamp_offset_applied(self):
        ref_ts = [0.0, 1.0]
        # with offset 10, cam1 times live in [10, 11)
        image_data = [recs(ref_ts, "ref"), recs([10.5], "cam1")]
        cams, min_off, max_off = br.lookup_images_and_brackets(
            ref_ts, image_data, [], [0.0, 10.0], bracket_len=1.5)
        cam1 = [c for c in cams if c.camera_type == 1]
        assert len(cam1) == 1
        assert cam1[0].timestamp == 10.5
        assert cam1[0].ref_timestamp == 0.5
        assert min_off[1] <= 10.0 <= max_off[1]

    def test_equal_last_timestamp_nextafter(self):
        """A non-ref image exactly at the last ref timestamp is admitted via
        the nextafter adjustment (dense_map_utils.cc:1526-1529)."""
        ref_ts = [0.0, 1.0]
        image_data = [recs(ref_ts, "ref"), recs([1.0], "cam1")]
        cams, _, _ = br.lookup_images_and_brackets(
            ref_ts, image_data, [], [0.0, 0.0], bracket_len=1.5)
        cam1 = [c for c in cams if c.camera_type == 1]
        assert len(cam1) == 1 and cam1[0].timestamp == 1.0
        assert cam1[0].beg_ref_index == 1 and cam1[0].end_ref_index == 1

    def test_depth_attachment(self):
        ref_ts = [0.0, 1.0]
        depth = [recs([0.0, 1.0], "d_ref"), recs([0.52], "d1")]
        image_data = [recs(ref_ts, "ref"), recs([0.5], "cam1")]
        cams, _, _ = br.lookup_images_and_brackets(
            ref_ts, image_data, depth, [0.0, 0.0], bracket_len=1.5)
        cam1 = [c for c in cams if c.camera_type == 1][0]
        assert cam1.cloud_timestamp == 0.52

    def test_no_brackets_mode_and_sort(self):
        image_data = [recs([0.0, 2.0], "ref"), recs([1.0, 3.0], "cam1")]
        cams, _, _ = br.lookup_images(True, [], image_data, [], [0.0, 0.0])
        # sorted by ref-clock time across sensors
        assert [c.timestamp for c in cams] == [0.0, 1.0, 2.0, 3.0]

    def test_missing_sensor_raises(self):
        image_data = [recs([0.0, 1.0], "ref"), recs([5.0], "cam1")]
        with pytest.raises(ValueError, match="all sensors"):
            br.lookup_images(False, [0.0, 1.0], image_data, [], [0.0, 0.0],
                             bracket_len=0.6)
