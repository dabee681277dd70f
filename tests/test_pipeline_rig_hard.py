"""Hard-mode RIG accuracy: the stressed 3-sensor scene (distorted sci cam,
depth clouds with range noise, exposure/gamma jitter, sensor noise,
PERTURBED initial poses) must calibrate back to truth — rig transforms,
trajectory, and depth alignment (VERDICT r2 #4; the rig case is the
reference's entire purpose, /root/reference/README.md:7-10).

Measured headroom on this scene (scripts/bench_pipeline.py --hard --rig):
rig 0.015 deg / 0.6 mm, ATE 1.8 mm, depth median 6.7 mm (the depth-noise
floor itself is ~6.6 mm) — thresholds below are ~10x those.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


class TestHardRig:
    def test_hard_rig_end_to_end(self, tmp_path):
        import bench_pipeline as bp
        from multiview_tpu.__main__ import main as cli_main

        ws = tmp_path / "hardrig"
        # 10 ref images = two serpentine rows: non-collinear trajectory (the
        # center-based similarity alignment is degenerate on a line)
        rig_true = bp.build_rig_workspace(ws, 10, (320, 240), 280.0, hard=True)
        rc = cli_main([
            "calibrate", "--rig_config", str(ws / "rig_config.txt"),
            "--camera_poses", str(ws / "cameras.txt"),
            "--images", str(ws / "images"), "--out_dir", str(ws / "calib"),
            "--rig_transforms_to_float", "--camera_poses_to_float",
            "--depth_tri_weight", "25.0", "--bracket_len", "1.5",
            "--num_iterations", "15", "--calibrator_num_passes", "2",
            "--max_features", "600", "--num_overlaps", "4"])
        assert rc == 0

        rig_errs = bp.check_rig_recovery(ws / "calib", rig_true)
        for s, e in rig_errs.items():
            assert e["rot_deg"] < 0.5, (s, rig_errs)
            assert e["trans_m"] < 0.02, (s, rig_errs)

        ate = bp.compute_ate(ws / "calib" / "cameras.txt",
                             ws / "cameras_gt.txt")
        assert ate["ate_rmse_m"] < 0.03, ate
        # absolute per-pose rotation on this small stressed scene is
        # observability-limited (~1.1 deg mean: reprojections reach
        # ~0.1 px while structure absorbs a common rotation); the tight
        # precision anchors are the rig transforms and depth alignment
        assert ate["rot_mean_deg"] < 2.0, ate

        depth = bp.check_depth_alignment(ws / "calib", ws)
        assert depth["median_m"] < 0.03, depth
        assert depth["p95_m"] < 0.08, depth
