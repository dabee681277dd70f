"""Measured CPU baseline for the SfM front-end: the reference's ACTUAL
implementation — OpenCV SIFT (10k features) + FLANN knn-2 + ratio test +
estimateAffine2D RANSAC — on the identical images bench_frontend_scale.py
times on TPU.

Reference path being timed (/root/reference/rig_calibrator):
- detectFeatures: cv2.SIFT nfeatures=10000, nOctaveLayers=3,
  contrast=0.02, edge=10, sigma=1.6 (src/interest_point.cc:51-57,61-106),
  one ThreadPool task per image (:483-492).
- matchFeatures: FlannBasedMatcher.knnMatch(k=2) + 0.8 ratio
  (src/matching.cc:185-214, goodness_ratio :43) then
  estimateAffine2D(RANSAC, thresh=20, maxIters=10000, conf=0.8)
  (src/interest_point.cc:134-143), one pool task per pair (:498-522).

Measurement discipline (same as bench_cpu_baseline.py): run threaded on
this machine's cores (ThreadPoolExecutor; cv2.setNumThreads(1) inside
workers so the pool, not OpenCV's internal threading, provides the
parallelism — the reference's structure), then extrapolate
ideal-linearly to the reference's 16-thread pool. Generous to the
reference: FLANN tree builds and RANSAC do not scale perfectly.

Run: PYTHONPATH=/root/repo python scripts/bench_frontend_baseline.py
(no JAX involved — pure OpenCV on CPU).
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from frontend_scenes import make_noise_images


def to_u8(img: np.ndarray) -> np.ndarray:
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def detect_all_cv2(images_u8, nthreads: int, n_features: int = 10000):
    import cv2
    cv2.setNumThreads(1)

    def one(img):
        sift = cv2.SIFT_create(nfeatures=n_features, nOctaveLayers=3,
                               contrastThreshold=0.02, edgeThreshold=10,
                               sigma=1.6)
        kp, desc = sift.detectAndCompute(img, None)
        return kp, desc

    with ThreadPoolExecutor(nthreads) as pool:
        out = list(pool.map(one, images_u8))
    return out


def match_pair_cv2(desc1, desc2, kp1, kp2):
    import cv2
    cv2.setNumThreads(1)
    matcher = cv2.FlannBasedMatcher()
    knn = matcher.knnMatch(desc1, desc2, k=2)
    left, right = [], []
    for pair in knn:
        if len(pair) == 1 or (len(pair) == 2
                              and pair[0].distance < 0.8 * pair[1].distance):
            m = pair[0]
            left.append(kp1[m.queryIdx].pt)
            right.append(kp2[m.trainIdx].pt)
    if len(left) < 4:
        return 0
    left = np.asarray(left, np.float32)
    right = np.asarray(right, np.float32)
    H, inl = cv2.estimateAffine2D(left, right, ransacReprojThreshold=20.0,
                                  maxIters=10000, confidence=0.8,
                                  method=cv2.RANSAC)
    return 0 if inl is None else int(inl.sum())


def main():
    import cv2

    ncpu = os.cpu_count() or 1
    n_img = 8
    images = [to_u8(im) for im in make_noise_images(n_img)]
    num_overlaps = 3
    pair_ids = [(i, j) for i in range(n_img)
                for j in range(i + 1, min(i + 1 + num_overlaps, n_img))]

    # ---- detection ----
    detect_all_cv2(images, ncpu)  # warm (FLANN/SIFT lazy init, page-in)
    t0 = time.perf_counter()
    feats = detect_all_cv2(images, ncpu)
    detect_s = time.perf_counter() - t0
    n_feat = [len(kp) for kp, _ in feats]

    # ---- matching ----
    def one_pair(ij):
        i, j = ij
        return match_pair_cv2(feats[i][1], feats[j][1],
                              feats[i][0], feats[j][0])

    with ThreadPoolExecutor(ncpu) as pool:   # warm
        list(pool.map(one_pair, pair_ids[:2]))
    t0 = time.perf_counter()
    with ThreadPoolExecutor(ncpu) as pool:
        inliers = list(pool.map(one_pair, pair_ids))
    match_s = time.perf_counter() - t0

    scale16 = ncpu / 16.0   # ideal linear scaling to the reference's pool
    out = {
        "impl": "cv2 " + cv2.__version__ + " SIFT+FLANN+estimateAffine2D",
        "ncpu": ncpu,
        "n_images": n_img,
        "image_size": [640, 480],
        "sift_nfeatures": 10000,
        "features_detected": n_feat,
        "n_pairs": len(pair_ids),
        "detect_s": round(detect_s, 3),
        "detect_ms_per_image": round(detect_s / n_img * 1e3, 1),
        "detect_ms_per_image_extrap_16thread":
            round(detect_s / n_img * 1e3 * scale16, 1),
        "match_s": round(match_s, 3),
        "match_ms_per_pair": round(match_s / len(pair_ids) * 1e3, 1),
        "match_ms_per_pair_extrap_16thread":
            round(match_s / len(pair_ids) * 1e3 * scale16, 1),
        "ransac_inliers_median": int(np.median(inliers)),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
