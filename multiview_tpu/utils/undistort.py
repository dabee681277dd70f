"""Image undistortion (the ``undistort_image_texrecon`` tool role,
`/root/reference/rig_calibrator/bin/undistort_image_texrecon.cc:84-368`):
build the full-image remap table, tame out-of-range remap values near the
border, resample, optionally crop a central window, and report the
undistorted intrinsics."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.geometry.camera import CameraParams, UNDISTORTED, DISTORTED


@functools.partial(jax.jit, static_argnames=("tame_px", "scale"))
def _undistort_core(img, cam: CameraParams, tame_px: float, scale: float):
    """Remap-grid build + resample, compiled once per (camera, image shape).

    ``scale`` follows GenerateRemapMaps (camera_params.cc:357-372): the grid
    spans round(scale * undistorted_size), the conversion runs at the
    calibrated resolution (grid / scale), and the resulting distorted
    coordinates are multiplied back by scale — the input image must be at
    scale * distorted_size."""
    W_u, H_u = cam.undistorted_size
    W_us = int(round(scale * W_u))
    H_us = int(round(scale * H_u))
    W_ds = int(round(scale * cam.distorted_size[0]))
    H_ds = int(round(scale * cam.distorted_size[1]))
    xs = jnp.arange(W_us, dtype=cam.dtype)
    ys = jnp.arange(H_us, dtype=cam.dtype)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    dist = scale * cam.convert(grid / scale, UNDISTORTED, DISTORTED)
    dist_x = jnp.clip(dist[..., 0], -tame_px, W_ds - 1 + tame_px)
    dist_y = jnp.clip(dist[..., 1], -tame_px, H_ds - 1 + tame_px)

    def sample(channel):
        return jax.scipy.ndimage.map_coordinates(channel, [dist_y, dist_x],
                                                 order=1, mode="constant")

    if img.ndim == 2:
        return sample(img)
    return jnp.stack([sample(img[..., c]) for c in range(img.shape[-1])], -1)


def undistort_image(img, cam: CameraParams, crop_window: Optional[Tuple[int, int]] = None,
                    tame_px: float = 100.0, scale: float = 1.0):
    """Undistort an image through the camera model.

    img: [H,W] or [H,W,C] float at scale * the calibrated distorted size.
    Returns (undistorted image at scale * undistorted size (or the cropped
    window), K matrix of the output).

    The remap is the batched UNDISTORTED->DISTORTED conversion; values more
    than ``tame_px`` beyond the image are clamped (the reference's taming of
    wild remap values, undistort_image_texrecon.cc:217-260). The crop window
    is applied UNscaled on the scaled undistorted image, exactly like the
    reference (:253-285)."""
    img = jnp.asarray(img)
    W_us = int(round(scale * cam.undistorted_size[0]))
    H_us = int(round(scale * cam.undistorted_size[1]))
    out = _undistort_core(img, cam, tame_px, scale)
    K = np.asarray(cam.intrinsic_matrix(UNDISTORTED))
    K = K.copy()
    K[0] *= scale
    K[1] *= scale
    if crop_window is not None:
        cw, ch = crop_window
        x0 = max((W_us - cw) // 2, 0)
        y0 = max((H_us - ch) // 2, 0)
        cw = min(cw, W_us - x0)
        ch = min(ch, H_us - y0)
        out = out[y0:y0 + ch, x0:x0 + cw]
        K[0, 2] -= x0
        K[1, 2] -= y0
    return np.asarray(out), K


def write_tsai_camera(path, K: np.ndarray, cam_to_world: np.ndarray):
    """ASP Pinhole .tsai camera file (write_asp_and_voxblox_cameras role,
    `bin/rig_utils.py:318-356`)."""
    from pathlib import Path
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    R = cam_to_world[:3, :3]
    c = cam_to_world[:3, 3]
    lines = [
        "VERSION_4",
        "PINHOLE",
        f"fu = {float(K[0, 0])!r}",
        f"fv = {float(K[1, 1])!r}",
        f"cu = {float(K[0, 2])!r}",
        f"cv = {float(K[1, 2])!r}",
        "u_direction = 1 0 0",
        "v_direction = 0 1 0",
        "w_direction = 0 0 1",
        "C = " + " ".join(repr(float(v)) for v in c),
        "R = " + " ".join(repr(float(v)) for v in R.ravel()),
        "pitch = 1",
        "NULL",
    ]
    path.write_text("\n".join(lines) + "\n")


def write_texrecon_cam(path, K: np.ndarray, world_to_cam: np.ndarray,
                       image_size: Tuple[int, int]):
    """mvs-texturing .cam file: 'tx ty tz R(9)' then normalized
    'f 0 0 paspect ppx ppy' (convert_intrinsics_to_texrecon,
    `bin/texrecon:90-131`)."""
    from pathlib import Path
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    R = world_to_cam[:3, :3]
    t = world_to_cam[:3, 3]
    W, H = image_size
    maxdim = max(W, H)
    f_norm = K[0, 0] / maxdim
    ppx = K[0, 2] / W
    ppy = K[1, 2] / H
    line1 = " ".join(repr(float(v)) for v in t) + " " + \
        " ".join(repr(float(v)) for v in R.ravel())
    line2 = f"{float(f_norm)!r} 0 0 1 {float(ppx)!r} {float(ppy)!r}"
    path.write_text(line1 + "\n" + line2 + "\n")
