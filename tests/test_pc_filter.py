"""pc_filter stage tests (ASP pc_filter role in multi_stereo:191-224)."""

import numpy as np
import jax.numpy as jnp

from multiview_tpu.dense import pc_filter as pcf


class TestKnnMeanDistance:
    def test_matches_numpy_bruteforce(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        k = 5
        md = np.asarray(pcf.knn_mean_distance(jnp.asarray(pts), k=k, chunk=16))
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        ref = np.sort(d, axis=1)[:, :k].mean(axis=1)
        np.testing.assert_allclose(md, ref, rtol=1e-4)


class TestStatisticalOutlierRemoval:
    def test_isolated_point_removed(self):
        rng = np.random.default_rng(1)
        cluster = rng.normal(size=(200, 3)) * 0.1
        outlier = np.array([[50.0, 50.0, 50.0]])
        pts = np.concatenate([cluster, outlier]).astype(np.float32)
        keep = pcf.statistical_outlier_removal(pts, k=8, std_ratio=2.0)
        assert not keep[-1]
        assert keep[:-1].mean() > 0.9

    def test_tiny_cloud_passthrough(self):
        pts = np.zeros((3, 3), np.float32)
        keep = pcf.statistical_outlier_removal(pts, k=8)
        assert keep.all()


class TestPcFilter:
    def test_distance_gate(self):
        pts = np.array([[0, 0, 1.0], [0, 0, 2.0], [0, 0, 9.0]])
        filt, keep = pcf.pc_filter(pts, max_distance_from_camera=5.0,
                                   outlier_removal=False)
        assert keep.tolist() == [True, True, False]
        assert len(filt) == 2

    def test_nan_removed(self):
        pts = np.array([[0, 0, 1.0], [np.nan, 0, 2.0]])
        filt, keep = pcf.pc_filter(pts, outlier_removal=False)
        assert keep.tolist() == [True, False]

    def test_combined(self):
        rng = np.random.default_rng(2)
        cluster = rng.normal(size=(300, 3)).astype(np.float32) * 0.05 \
            + np.array([0, 0, 2.0], np.float32)
        stragglers = np.array([[20.0, 0, 0], [0, 0, 100.0]], np.float32)
        pts = np.concatenate([cluster, stragglers])
        filt, keep = pcf.pc_filter(pts, max_distance_from_camera=10.0,
                                   outlier_removal=True)
        assert not keep[-1] and not keep[-2]
        assert keep[:-2].mean() > 0.9
