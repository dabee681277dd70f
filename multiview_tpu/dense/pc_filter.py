"""Point-cloud filtering — the ASP ``pc_filter`` role in ``multi_stereo``
(`/root/reference/rig_calibrator/bin/multi_stereo:191-224`): between stereo
and TSDF fusion, each per-pair cloud is cleaned (distance gates, outlier
removal) and written in the left camera's coordinates for voxblox.

TPU mapping: the distance gates are trivial elementwise masks; statistical
outlier removal (the PCL-style k-NN mean-distance test the ASP tool family
provides) is a brute-force k-nearest-neighbor query — an [N x N] distance
problem evaluated in MXU-friendly chunked matmul tiles, the same pattern as
descriptor matching, instead of a KD-tree.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_mean_distance(points: jnp.ndarray, k: int = 8, chunk: int = 2048
                      ) -> jnp.ndarray:
    """Mean distance from each point to its k nearest neighbors (excluding
    itself). points [N,3] -> [N]. Chunked |x-y|^2 = |x|^2 + |y|^2 - 2 x.y
    tiles; the 2 x.y term is an MXU matmul."""
    pts = points
    N = pts.shape[0]
    pad = (-N) % chunk
    if pad:
        pts = jnp.concatenate([pts, jnp.full((pad, 3), 1e15, pts.dtype)])
    M = pts.shape[0]
    sq = jnp.sum(pts * pts, axis=1)

    def body(c, _):
        q = jax.lax.dynamic_slice_in_dim(pts, c * chunk, chunk)      # [C,3]
        qsq = jax.lax.dynamic_slice_in_dim(sq, c * chunk, chunk)
        d2 = qsq[:, None] + sq[None, :] - 2.0 * (q @ pts.T)           # [C,M]
        # exclude self-matches (diagonal of this block)
        rows = c * chunk + jnp.arange(chunk)
        d2 = jnp.where(rows[:, None] == jnp.arange(M)[None, :], jnp.inf, d2)
        nd2, _ = jax.lax.top_k(-d2, k)
        return c + 1, jnp.sqrt(jnp.maximum(-nd2, 0.0)).mean(axis=1)

    _, md = jax.lax.scan(body, 0, None, length=M // chunk)
    return md.reshape(-1)[:N]


def statistical_outlier_removal(points_cam: np.ndarray, k: int = 8,
                                std_ratio: float = 2.0) -> np.ndarray:
    """Keep-mask for points whose k-NN mean distance is within
    mean + std_ratio * std of the cloud-wide distribution (PCL
    StatisticalOutlierRemoval semantics)."""
    if len(points_cam) <= k + 1:
        return np.ones(len(points_cam), bool)
    md = np.asarray(knn_mean_distance(jnp.asarray(points_cam, jnp.float32),
                                      k=k))
    thresh = md.mean() + std_ratio * md.std()
    return md <= thresh


def pc_filter(points_cam: np.ndarray,
              max_distance_from_camera: float = 0.0,
              outlier_removal: bool = True, k: int = 8,
              std_ratio: float = 2.0) -> Tuple[np.ndarray, np.ndarray]:
    """Filter a per-pair stereo cloud given in the left camera's frame
    (pc_filter role, multi_stereo:191-224). Returns (filtered points,
    keep mask). ``max_distance_from_camera`` <= 0 disables that gate
    (ASP's --max-distance-from-camera)."""
    keep = np.isfinite(points_cam).all(axis=1)
    if max_distance_from_camera > 0:
        keep &= np.linalg.norm(points_cam, axis=1) <= max_distance_from_camera
    if outlier_removal and keep.any():
        sub = points_cam[keep]
        keep_idx = np.nonzero(keep)[0]
        keep2 = statistical_outlier_removal(sub, k=k, std_ratio=std_ratio)
        keep = np.zeros(len(points_cam), bool)
        keep[keep_idx[keep2]] = True
    return points_cam[keep], keep
