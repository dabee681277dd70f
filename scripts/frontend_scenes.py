"""Shared synthetic imagery for front-end benchmarks and quality tests.

Two scene families:

- ``make_noise_images``: the smoothed-noise shifted-window set used by
  ``bench_frontend_scale.py`` since round 3 — kept bit-identical so TPU
  timings and the CPU baseline (``bench_frontend_baseline.py``) time the
  SAME pixels.
- ``make_structured_image`` / ``warp_image``: a rich multi-scale blob+edge
  scene that yields >=8k real cv2.SIFT detections at the reference's
  10k-feature default (interest_point.cc:51-57), plus a known-homography
  warp for repeatability / match-inlier-rate measurement.
"""

from __future__ import annotations

import numpy as np


def make_noise_images(n_img: int = 8, size=(520, 680), crop=(480, 640),
                      seed: int = 0):
    """The bench_frontend_scale.py image set (identical pixels, seed 0)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(size=size).astype(np.float32)
    for _ in range(2):
        base = 0.25 * (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                       + np.roll(base, 1, 1) + np.roll(base, -1, 1))
    return [np.ascontiguousarray(base[i * 4:i * 4 + crop[0],
                                      i * 3:i * 3 + crop[1]])
            for i in range(n_img)]


def make_structured_image(h: int = 960, w: int = 1280, seed: int = 7,
                          n_blobs: int = 4000, n_rects: int = 300):
    """A textured scene with localizable structure at many scales.

    Random anisotropic Gaussian blobs (detectable as DoG extrema across
    octaves) over a polygon mosaic (corners/edges), plus mild broadband
    noise. cv2.SIFT at default thresholds finds >=8k keypoints here.
    Returns float32 [h,w] in [0,1].
    """
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)

    # polygon mosaic: axis-aligned rectangles with random intensity
    for _ in range(n_rects):
        rh = int(rng.integers(8, h // 4))
        rw = int(rng.integers(8, w // 4))
        y0 = int(rng.integers(0, h - rh))
        x0 = int(rng.integers(0, w - rw))
        img[y0:y0 + rh, x0:x0 + rw] += rng.uniform(-0.25, 0.25)

    # multi-scale blobs, vectorized per scale bucket on a local stamp
    yy_full, xx_full = np.mgrid[0:h, 0:w]
    for sigma in (1.2, 2.0, 3.5, 6.0, 10.0):
        k = int(np.ceil(3 * sigma))
        stamp_n = 2 * k + 1
        yy, xx = np.mgrid[-k:k + 1, -k:k + 1]
        n = n_blobs // 5
        cy = rng.integers(k, h - k, size=n)
        cx = rng.integers(k, w - k, size=n)
        amp = rng.uniform(0.15, 0.5, size=n) * rng.choice([-1, 1], size=n)
        sx = sigma * rng.uniform(0.7, 1.4, size=n)
        sy = sigma * rng.uniform(0.7, 1.4, size=n)
        stamp = np.exp(-(yy[None] ** 2 / (2 * sy[:, None, None] ** 2)
                         + xx[None] ** 2 / (2 * sx[:, None, None] ** 2)))
        stamp *= amp[:, None, None]
        for i in range(n):
            img[cy[i] - k:cy[i] + k + 1, cx[i] - k:cx[i] + k + 1] += stamp[i]

    img += 0.02 * rng.standard_normal((h, w)).astype(np.float32)
    img -= img.min()
    img /= max(img.max(), 1e-6)
    return img.astype(np.float32)


def random_homography(h: int, w: int, seed: int = 11,
                      rot_deg: float = 8.0, scale: float = 1.08,
                      persp: float = 1e-4, shift: float = 12.0):
    """A mild projective warp (rotation + scale + translation + perspective)
    about the image center. Returns the 3x3 matrix mapping src->dst pixels."""
    rng = np.random.default_rng(seed)
    th = np.deg2rad(rng.uniform(-rot_deg, rot_deg))
    s = rng.uniform(1.0 / scale, scale)
    tx, ty = rng.uniform(-shift, shift, size=2)
    cx, cy = w / 2.0, h / 2.0
    C = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], float)
    A = np.array([[s * np.cos(th), -s * np.sin(th), tx],
                  [s * np.sin(th), s * np.cos(th), ty],
                  [rng.uniform(-persp, persp), rng.uniform(-persp, persp), 1]],
                 float)
    Ci = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1]], float)
    return Ci @ A @ C


def warp_image(img: np.ndarray, H: np.ndarray):
    """Warp with cv2 when available, else a numpy inverse-map bilinear warp."""
    h, w = img.shape
    try:
        import cv2
        return cv2.warpPerspective(img, H.astype(np.float64), (w, h),
                                   flags=cv2.INTER_LINEAR,
                                   borderMode=cv2.BORDER_REFLECT)
    except ImportError:
        Hi = np.linalg.inv(H)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        den = Hi[2, 0] * xx + Hi[2, 1] * yy + Hi[2, 2]
        sx = (Hi[0, 0] * xx + Hi[0, 1] * yy + Hi[0, 2]) / den
        sy = (Hi[1, 0] * xx + Hi[1, 1] * yy + Hi[1, 2]) / den
        x0 = np.clip(np.floor(sx).astype(int), 0, w - 2)
        y0 = np.clip(np.floor(sy).astype(int), 0, h - 2)
        fx = np.clip(sx - x0, 0, 1)
        fy = np.clip(sy - y0, 0, 1)
        out = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x0 + 1] * fx * (1 - fy)
               + img[y0 + 1, x0] * (1 - fx) * fy + img[y0 + 1, x0 + 1] * fx * fy)
        return out.astype(np.float32)


def apply_homography(H: np.ndarray, xy: np.ndarray):
    """Map [N,2] (x,y) points through a 3x3 homography."""
    p = np.concatenate([xy, np.ones((len(xy), 1))], axis=1) @ H.T
    return p[:, :2] / p[:, 2:3]
