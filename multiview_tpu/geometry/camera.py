"""Camera intrinsics container + frame conversions + projection.

TPU-native re-design of ``camera::CameraParameters``
(`/root/reference/camera_model/camera_params.{h,cc}`): a registered JAX
dataclass whose optimizable fields (focal, optical offset, distortion
coefficients) are array leaves, while the distortion model name and image
sizes are static metadata. All conversions among the five reference frames

  RAW / DISTORTED / DISTORTED_C / UNDISTORTED / UNDISTORTED_C
  (`camera_params.h:42-57`)

are pure functions usable inside jit/vmap/grad.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multiview_tpu.geometry import distortion as dist_mod

# Frame names (reference enum camera_params.h:51-57)
RAW = "raw"
DISTORTED = "distorted"
DISTORTED_C = "distorted_c"
UNDISTORTED = "undistorted"
UNDISTORTED_C = "undistorted_c"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraParams:
    """Intrinsics of one sensor.

    Array leaves (optimizable): ``focal`` [2], ``optical_offset`` [2]
    (in the DISTORTED frame), ``dist_coeffs`` [d] (for RPC: distort+undistort
    halves concatenated, as in `camera_params.cc:225-253`).

    Static metadata: distortion ``model`` name, integer image sizes, crop.
    """

    focal: jnp.ndarray
    optical_offset: jnp.ndarray
    dist_coeffs: jnp.ndarray

    model: str = dataclasses.field(metadata=dict(static=True), default="none")
    distorted_size: Tuple[int, int] = dataclasses.field(
        metadata=dict(static=True), default=(0, 0))
    undistorted_size: Tuple[int, int] = dataclasses.field(
        metadata=dict(static=True), default=(0, 0))
    distorted_crop_size: Tuple[int, int] = dataclasses.field(
        metadata=dict(static=True), default=(0, 0))
    crop_offset: Tuple[int, int] = dataclasses.field(
        metadata=dict(static=True), default=(0, 0))

    # -- constructors -------------------------------------------------------

    @staticmethod
    def create(image_size, focal, optical_center, dist_coeffs=(),
               undistorted_size=None, distorted_crop_size=None, crop_offset=(0, 0),
               dtype=jnp.float64):
        """Mirror of the array constructor (`camera_params.cc:37-48`):
        crop size and undistorted size default to the image size."""
        dist_coeffs = jnp.asarray(dist_coeffs, dtype=dtype)
        model = dist_mod.model_from_num_coeffs(int(dist_coeffs.shape[-1]))
        focal = jnp.asarray(focal, dtype=dtype)
        if focal.ndim == 0:
            focal = jnp.stack([focal, focal])
        return CameraParams(
            focal=focal,
            optical_offset=jnp.asarray(optical_center, dtype=dtype),
            dist_coeffs=dist_coeffs,
            model=model,
            distorted_size=(int(image_size[0]), int(image_size[1])),
            undistorted_size=tuple(int(v) for v in (undistorted_size or image_size)),
            distorted_crop_size=tuple(int(v) for v in (distorted_crop_size or image_size)),
            crop_offset=(int(crop_offset[0]), int(crop_offset[1])),
        )

    # -- derived quantities -------------------------------------------------

    @property
    def dtype(self):
        return self.focal.dtype

    @property
    def distorted_half_size(self):
        return jnp.asarray(self.distorted_size, self.dtype) / 2.0

    @property
    def undistorted_half_size(self):
        return jnp.asarray(self.undistorted_size, self.dtype) / 2.0

    @property
    def mean_focal(self):
        """GetFocalLength(): mean of the two focal lengths (camera_params.cc:161-163)."""
        return jnp.mean(self.focal)

    def intrinsic_matrix(self, frame: str = DISTORTED):
        """K for the given frame (`camera_params.cc:420-449`)."""
        fx, fy = self.focal[0], self.focal[1]
        if frame == RAW:
            c = self.optical_offset + jnp.asarray(self.crop_offset, self.dtype)
        elif frame == DISTORTED:
            c = self.optical_offset
        elif frame == DISTORTED_C:
            c = self.optical_offset - self.distorted_half_size
        elif frame == UNDISTORTED:
            c = self.undistorted_half_size
        elif frame == UNDISTORTED_C:
            c = jnp.zeros(2, self.dtype)
        else:
            raise ValueError(f"Unknown frame {frame}")
        z = jnp.zeros((), self.dtype)
        o = jnp.ones((), self.dtype)
        return jnp.stack([
            jnp.stack([fx, z, c[0]]),
            jnp.stack([z, fy, c[1]]),
            jnp.stack([z, z, o]),
        ])

    # -- frame conversions --------------------------------------------------

    def distort_centered(self, undist_c):
        return dist_mod.distort_centered(
            self.model, self.dist_coeffs, undist_c, self.focal, self.optical_offset,
            self.distorted_half_size)

    def undistort_centered(self, dist_c):
        return dist_mod.undistort_centered(
            self.model, self.dist_coeffs, dist_c, self.focal, self.optical_offset,
            self.distorted_half_size)

    def convert(self, pix, src: str, dst: str):
        """General frame-to-frame conversion, parity with the Convert<>
        specializations (`camera_params.cc:377-417`). Routes through the
        centered frames as the reference does."""
        if src == dst:
            return pix
        # normalize to one of the centered frames
        if src == RAW:
            return self.convert(pix - jnp.asarray(self.crop_offset, self.dtype),
                                DISTORTED, dst)
        if dst == RAW:
            return self.convert(pix, src, DISTORTED) + jnp.asarray(
                self.crop_offset, self.dtype)
        if src == DISTORTED:
            if dst == DISTORTED_C:
                return pix - self.distorted_half_size
            return self.convert(pix - self.distorted_half_size, DISTORTED_C, dst)
        if src == UNDISTORTED:
            if dst == UNDISTORTED_C:
                return pix - self.undistorted_half_size
            return self.convert(pix - self.undistorted_half_size, UNDISTORTED_C, dst)
        if src == DISTORTED_C:
            if dst == DISTORTED:
                return pix + self.distorted_half_size
            u = self.undistort_centered(pix)
            if dst == UNDISTORTED_C:
                return u
            if dst == UNDISTORTED:
                return u + self.undistorted_half_size
        if src == UNDISTORTED_C:
            if dst == UNDISTORTED:
                return pix + self.undistorted_half_size
            d = self.distort_centered(pix)
            if dst == DISTORTED_C:
                return d
            if dst == DISTORTED:
                return d + self.distorted_half_size
        raise ValueError(f"Unsupported conversion {src} -> {dst}")

    # -- projection ---------------------------------------------------------

    def project_cam_to_dist_pix(self, X_cam):
        """Camera-frame 3D point(s) -> DISTORTED pixel.

        Exactly the projection inside ``BracketedCamError``
        (`bin/rig_calibrator.cc:472-475`): undist_pix = focal * hnormalized(X),
        then UNDISTORTED_C -> DISTORTED.
        """
        undist_c = self.focal * (X_cam[..., :2] / X_cam[..., 2:3])
        return self.convert(undist_c, UNDISTORTED_C, DISTORTED)

    def ray_from_dist_pix(self, dist_pix):
        """DISTORTED pixel -> unit ray in camera frame (CameraModel::Ray
        analogue, `camera_model/camera_model.cc:94-97`)."""
        undist_c = self.convert(dist_pix, DISTORTED, UNDISTORTED_C)
        d = jnp.concatenate([undist_c / self.focal,
                             jnp.ones(undist_c.shape[:-1] + (1,), self.dtype)], axis=-1)
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def is_in_fov(self, X_cam) -> jnp.ndarray:
        """True where camera-frame point(s) project inside the distorted
        image with positive depth (CameraModel::IsInFov,
        `camera_model/camera_model.cc:109-121`)."""
        z_ok = X_cam[..., 2] > 0.0
        pix = self.project_cam_to_dist_pix(
            jnp.where(z_ok[..., None], X_cam,
                      jnp.asarray([0.0, 0.0, 1.0], self.dtype)))
        size = jnp.asarray(self.distorted_size, self.dtype)
        inside = jnp.all((pix >= 0.0) & (pix < size), axis=-1)
        return z_ok & inside

    # -- mutation helpers (functional) --------------------------------------

    def with_intrinsics(self, focal=None, optical_offset=None, dist_coeffs=None):
        return dataclasses.replace(
            self,
            focal=self.focal if focal is None else focal,
            optical_offset=self.optical_offset if optical_offset is None else optical_offset,
            dist_coeffs=self.dist_coeffs if dist_coeffs is None else dist_coeffs,
        )


def undistortion_remap_grid(cam: CameraParams, scale: float = 1.0) -> np.ndarray:
    """Dense remap table: for every UNDISTORTED pixel, the corresponding
    DISTORTED pixel; shape [H_u*scale, W_u*scale, 2] (x,y order).

    TPU-native version of ``GenerateRemapMaps`` (`camera_params.cc:361-371`):
    the whole grid is evaluated as one batched conversion instead of a pixel
    double-loop.
    """
    w = int(cam.undistorted_size[0] * scale)
    h = int(cam.undistorted_size[1] * scale)
    xs = jnp.arange(w, dtype=cam.dtype)
    ys = jnp.arange(h, dtype=cam.dtype)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [h,w,2]
    dist = cam.convert(grid / scale, UNDISTORTED, DISTORTED) * scale
    return np.asarray(dist)
