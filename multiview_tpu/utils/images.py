"""Image/depth utility parity helpers.

- depth_value: nearest-pixel depth lookup in an xyz-image
  (`/root/reference/rig_calibrator/src/dense_map_utils.cc:1364-1391`)
- exposure_correction / scale_image: ISO/exposure-time brightness
  normalization with gamma handling (`dense_map_utils.cc:591-628`)
- pick_timestamps_in_bounds (`dense_map_utils.cc:630-668`)
- adjust_image_size: raw -> calibrated dimensions by integer-factor area
  downsampling (`dense_map_utils.cc:1404-1431`)
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def depth_value(depth_cloud: Optional[np.ndarray], dist_ip) -> Optional[np.ndarray]:
    """Depth xyz at the rounded pixel, None when absent/invalid.

    depth_cloud: [H,W,3] xyz-image or None; dist_ip: (x, y) pixel.
    (0,0,0) entries are invalid measurements.
    """
    if depth_cloud is None or depth_cloud.size == 0:
        return None
    h, w = depth_cloud.shape[:2]
    col = int(round(float(dist_ip[0])))
    row = int(round(float(dist_ip[1])))
    if col < 0 or row < 0 or col > w or row > h:
        raise ValueError("Out of range in the depth cloud.")
    if col == w or row == h:
        return None
    xyz = depth_cloud[row, col]
    if np.all(xyz == 0.0):
        return None
    return np.asarray(xyz, float)


def depth_values_batch(depth_cloud: Optional[np.ndarray], dist_ips: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized depth_value over [N,2] pixels -> (xyz [N,3], valid [N])."""
    n = len(dist_ips)
    if depth_cloud is None or depth_cloud.size == 0:
        return np.zeros((n, 3)), np.zeros(n, bool)
    h, w = depth_cloud.shape[:2]
    cols = np.round(dist_ips[:, 0]).astype(int)
    rows = np.round(dist_ips[:, 1]).astype(int)
    inb = (cols >= 0) & (rows >= 0) & (cols < w) & (rows < h)
    xyz = np.zeros((n, 3))
    xyz[inb] = depth_cloud[rows[inb], cols[inb]]
    valid = inb & ~np.all(xyz == 0.0, axis=-1)
    return xyz, valid


_GAMMA = 2.2


def srgb_gamma(x: np.ndarray) -> np.ndarray:
    """sRGB forward transfer for x in [0,1] (``dense_map::gamma``,
    dense_map_utils.cc:572-579): 12.92x below 0.0031308, else
    1.055 x^(1/2.4) - 0.055."""
    x = np.asarray(x, float)
    return np.where(x <= 0.0031308, 12.92 * x,
                    1.055 * np.power(np.maximum(x, 1e-12), 1.0 / 2.4) - 0.055)


def srgb_inv_gamma(x: np.ndarray) -> np.ndarray:
    """sRGB inverse transfer (``dense_map::inv_gamma``,
    dense_map_utils.cc:581-587)."""
    x = np.asarray(x, float)
    return np.where(x <= 0.04045, x / 12.92,
                    np.power(np.maximum((x + 0.055) / 1.055, 0.0), 2.4))


def exposure_correction(max_iso_times_exposure: float, iso: float, exposure: float,
                        image: np.ndarray) -> np.ndarray:
    """Brightness normalization in linear-light space: undo the sRGB gamma,
    scale by max_iso_times_exposure/(iso*exposure), re-apply the gamma —
    the exact piecewise-sRGB recipe of ``dense_map::exposureCorrection``
    (dense_map_utils.cc:590-615). image: uint8 or float in [0,1]."""
    scale = max_iso_times_exposure / iso / exposure
    img = np.asarray(image, float)
    was_u8 = image.dtype == np.uint8
    if was_u8:
        img = img / 255.0
    out = srgb_gamma(srgb_inv_gamma(img) * scale)
    if was_u8:
        return np.clip(np.round(out * 255.0), 0.0, 255.0).astype(np.uint8)
    return np.clip(out, 0.0, 1.0)


def scale_image(max_iso_times_exposure: float, iso: float, exposure: float,
                image: np.ndarray) -> np.ndarray:
    """Cheap variant: one global multiply by scale^(1/gamma)
    (scaleImage, dense_map_utils.cc:620-628)."""
    scale = (max_iso_times_exposure / iso / exposure) ** (1.0 / _GAMMA)
    img = np.asarray(image, float) * scale
    if image.dtype == np.uint8:
        return np.clip(np.round(img), 0, 255).astype(np.uint8)
    return img


def pick_timestamps_in_bounds(timestamps: Sequence[float], left_bound: float,
                              right_bound: float, offset: float) -> List[float]:
    """The two timestamps (after +offset) closest to each bound within
    [left_bound, right_bound) (pickTimestampsInBounds)."""
    inside = [t for t in timestamps
              if left_bound <= t + offset < right_bound]
    if not inside:
        return []
    lo = min(inside, key=lambda t: abs(t + offset - left_bound))
    hi = min(inside, key=lambda t: abs(t + offset - right_bound))
    return [lo] if lo == hi else [lo, hi]


def adjust_image_size(calib_size: Tuple[int, int], image: np.ndarray
                      ) -> np.ndarray:
    """Resize a raw image down to the calibrated dimensions
    (``dense_map::adjustImageSize``, dense_map_utils.cc:1404-1431): the raw
    size must be an integer multiple of the calibrated (W, H); the reduction
    is area averaging (cv::INTER_AREA is exactly the block mean for integer
    factors)."""
    W, H = int(calib_size[0]), int(calib_size[1])
    h, w = image.shape[:2]
    factor = w // max(W, 1)
    if w != W * factor or h != H * factor or factor < 1:
        raise ValueError(
            f"Image width and height are: {w} {h}\n"
            f"Calibrated image width and height are: {W} {H}\n"
            "These must be equal up to an integer factor.")
    if factor == 1:
        return image
    trail = image.shape[2:]
    out = image[:H * factor, :W * factor].reshape(
        (H, factor, W, factor) + trail).mean(axis=(1, 3))
    return out.astype(image.dtype) if np.issubdtype(image.dtype, np.integer) \
        else out
