"""Shared helpers for the CLI tools: rig-config <-> CameraParams conversion,
image-directory scanning with timestamp-from-filename convention
(<images_dir>/<sensor_name>/<timestamp>.<ext>), grayscale loading."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from multiview_tpu.io import rig_config as rc
from multiview_tpu.geometry.camera import CameraParams
from multiview_tpu.calib.bracketing import ImageRecord


def cam_params_from_sensor(s: rc.SensorConfig, dtype=None) -> CameraParams:
    import jax.numpy as jnp
    return CameraParams.create(
        s.image_size, s.focal_length, s.optical_center, s.distortion,
        undistorted_size=s.undistorted_image_size,
        distorted_crop_size=s.distorted_crop_size,
        dtype=dtype or jnp.float64)


def sensor_from_cam_params(name: str, cam: CameraParams, ref_to_sensor=None,
                           depth_to_image=None, timestamp_offset=0.0
                           ) -> rc.SensorConfig:
    return rc.SensorConfig(
        name=name,
        focal_length=float(cam.mean_focal),
        optical_center=np.asarray(cam.optical_offset),
        distortion=np.asarray(cam.dist_coeffs),
        image_size=cam.distorted_size,
        distorted_crop_size=cam.distorted_crop_size,
        undistorted_image_size=cam.undistorted_size,
        ref_to_sensor=np.eye(4) if ref_to_sensor is None else ref_to_sensor,
        depth_to_image=np.eye(4) if depth_to_image is None else depth_to_image,
        timestamp_offset=timestamp_offset)


def load_gray(path) -> np.ndarray:
    import imageio.v3 as iio
    img = np.asarray(iio.imread(path)).astype(np.float32)
    if img.ndim == 3:
        img = img[..., :3].mean(-1)
    if img.max() > 1.5:
        img = img / 255.0
    return img


def load_color(path) -> np.ndarray:
    """[H,W,3] float in [0,1] — the texturing path textures in color like
    the reference (`bin/texrecon:108-131,164-173` feeds BGR jpgs into
    texrecon); grayscale sources are replicated across channels."""
    import imageio.v3 as iio
    img = np.asarray(iio.imread(path)).astype(np.float32)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    img = img[..., :3]
    if img.max() > 1.5:
        img = img / 255.0
    return img


IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".tif", ".tiff", ".pgm")


def scan_image_dir(images_dir, sensor_names: Sequence[str], load: bool = True,
                   color: bool = False) -> List[List[ImageRecord]]:
    """Per-sensor time-sorted ImageRecords; timestamp parsed from the file
    stem (the reference's <sensor>/<timestamp>.ext layout)."""
    images_dir = Path(images_dir)
    loader = load_color if color else load_gray
    out: List[List[ImageRecord]] = []
    for name in sensor_names:
        recs = []
        d = images_dir / name
        if d.is_dir():
            for p in sorted(d.iterdir()):
                if p.suffix.lower() not in IMAGE_EXTS:
                    continue
                try:
                    ts = float(p.stem)
                except ValueError:
                    continue
                recs.append(ImageRecord(ts, str(p), loader(p) if load else None))
        recs.sort(key=lambda r: r.timestamp)
        out.append(recs)
    return out


def scan_depth_dir(images_dir, sensor_names: Sequence[str]) -> List[List[ImageRecord]]:
    """Per-sensor .pc depth clouds alongside images."""
    from multiview_tpu.io import depth_io
    images_dir = Path(images_dir)
    out: List[List[ImageRecord]] = []
    for name in sensor_names:
        recs = []
        d = images_dir / name
        if d.is_dir():
            for p in sorted(d.glob("*.pc")):
                try:
                    ts = float(p.stem)
                except ValueError:
                    continue
                recs.append(ImageRecord(ts, str(p), depth_io.read_xyz_image(p)))
        recs.sort(key=lambda r: r.timestamp)
        out.append(recs)
    return out


def add_sift_args(p):
    """The reference's detector flags (interest_point.cc:51-57)."""
    p.add_argument("--feature_detector", default="SIFT",
                   help="SIFT (DoG + gradient histograms) or SURF "
                        "(determinant-of-Hessian + Haar-style sums), the "
                        "reference's detector families (matching.cc:48-183)")
    p.add_argument("--sift_nFeatures", type=int, default=None,
                   help="overrides --max_features when given (reference "
                        "default 10000)")
    p.add_argument("--sift_nOctaveLayers", type=int, default=3)
    p.add_argument("--sift_contrastThreshold", type=float, default=None,
                   help="detection-response threshold; default is "
                        "per-detector (SIFT DoG contrast 0.015, SURF "
                        "Hessian 1e-6)")
    p.add_argument("--sift_edgeThreshold", type=float, default=10.0)
    p.add_argument("--sift_sigma", type=float, default=1.6)
    p.add_argument("--num_nearest_neighbors_for_global_descriptor_matching",
                   type=int, default=0,
                   help=">0: pick match pairs by global-descriptor (VLAD) "
                        "retrieval instead of temporal --num_overlaps "
                        "(theia_flags.txt:57-62)")
    p.add_argument("--num_gmm_clusters_for_fisher_vector", type=int,
                   default=16, help="retrieval codebook size "
                                    "(theia_flags.txt:61)")
    p.add_argument("--match_out_of_core", action="store_true",
                   help="spill per-image features to disk and match through "
                        "an LRU cache (theia_flags.txt:30-46)")
    p.add_argument("--matching_working_directory", default=None,
                   help="feature-spill directory for --match_out_of_core")
    p.add_argument("--matching_max_num_images_in_cache", type=int,
                   default=128)


def frontend_config_from_args(args, **overrides):
    """FrontendConfig from the shared CLI flags (+ per-tool overrides)."""
    from multiview_tpu.sfm.pipeline import FrontendConfig

    kw = dict(
        max_features=(args.sift_nFeatures if getattr(args, "sift_nFeatures",
                                                     None)
                      else args.max_features),
        num_scales=getattr(args, "sift_nOctaveLayers", 3),
        sigma0=getattr(args, "sift_sigma", 1.6),
        feature_detector=getattr(args, "feature_detector", "SIFT").lower(),
        contrast_threshold=getattr(args, "sift_contrastThreshold", None),
        edge_threshold=getattr(args, "sift_edgeThreshold", 10.0),
        num_overlaps=getattr(args, "num_overlaps", 2),
        retrieval_neighbors=getattr(
            args, "num_nearest_neighbors_for_global_descriptor_matching", 0),
        retrieval_clusters=getattr(
            args, "num_gmm_clusters_for_fisher_vector", 16),
        match_out_of_core=getattr(args, "match_out_of_core", False),
        matching_working_directory=getattr(
            args, "matching_working_directory", None),
        matching_max_num_images_in_cache=getattr(
            args, "matching_max_num_images_in_cache", 128))
    kw.update(overrides)
    return FrontendConfig(**kw)
