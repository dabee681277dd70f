"""RPC distortion fitting: approximate any distortion model with a rational
polynomial, then fit its inverse.

TPU re-design of `/root/reference/camera_model/rpc_distortion.cc:495-739`
(genUndistDistPairs / fitRpcDist / fitRpcUndist / evalRpcDistUndist): the
sample grid is generated as one batched conversion, each per-degree fit is a
jitted dense LM solve (autodiff Jacobians instead of Ceres numeric diff),
and the progressive degree-by-degree warm start is a small host loop.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.geometry import distortion as D
from multiview_tpu.geometry.camera import CameraParams, UNDISTORTED, DISTORTED
from multiview_tpu.solver.lm import levenberg_marquardt


def gen_undist_dist_pairs(cam: CameraParams, num_samples: int) -> Tuple[np.ndarray, np.ndarray]:
    """Sample the undistorted image uniformly; keep points whose distorted
    image lands inside the distorted crop window. Returns *centered* pixel
    pairs (undist_c, dist_c). Mirrors ``genUndistDistPairs``
    (`rpc_distortion.cc:499-557`)."""
    uw, uh = cam.undistorted_size
    xs = jnp.asarray(np.linspace(0.0, uw - 1.0, num_samples), cam.dtype)
    ys = jnp.asarray(np.linspace(0.0, uh - 1.0, num_samples), cam.dtype)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="ij"), axis=-1).reshape(-1, 2)
    dist = cam.convert(grid, UNDISTORTED, DISTORTED)

    dsize = np.asarray(cam.distorted_size, float)
    crop = np.asarray(cam.distorted_crop_size, float)
    keep = np.all(np.abs(np.asarray(dist) - dsize / 2.0) <= crop / 2.0, axis=-1)

    undist_c = np.asarray(grid)[keep] - np.asarray(cam.undistorted_half_size)
    dist_c = np.asarray(dist)[keep] - np.asarray(cam.distorted_half_size)
    return undist_c, dist_c


def _fit_fixed_degree(src, dst, coeffs0, num_iterations, parameter_tolerance):
    """LM fit of RPC coefficients mapping src -> dst (one degree).
    Mirrors ``fitCurrDegRPC`` (`rpc_distortion.cc:559-620`), no robust loss."""
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)

    def residual(coeffs):
        return (D.compute_rpc(src, coeffs) - dst).ravel()

    res = levenberg_marquardt(
        residual, jnp.asarray(coeffs0),
        max_iterations=num_iterations,
        parameter_tolerance=parameter_tolerance,
        function_tolerance=1e-16,
    )
    return np.asarray(res.x), float(res.cost)


def fit_rpc_to_pairs(src, dst, rpc_degree: int, num_iterations: int = 100,
                     parameter_tolerance: float = 1e-12) -> np.ndarray:
    """Progressively fit RPC of increasing degree (1..rpc_degree) mapping
    src -> dst, warm-starting each degree from the previous
    (`rpc_distortion.cc:636-655`)."""
    coeffs = D.rpc_identity_params(1)
    for deg in range(1, rpc_degree + 1):
        if deg >= 2:
            coeffs = D.rpc_increment_degree(coeffs)
        coeffs, _ = _fit_fixed_degree(src, dst, coeffs, num_iterations, parameter_tolerance)
    return coeffs


def fit_rpc_dist(cam: CameraParams, rpc_degree: int, num_samples: int = 400,
                 num_iterations: int = 100, parameter_tolerance: float = 1e-12) -> np.ndarray:
    """Fit RPC distortion coefficients to cam's distortion model
    (``fitRpcDist``, `rpc_distortion.cc:622-656`)."""
    undist_c, dist_c = gen_undist_dist_pairs(cam, num_samples)
    return fit_rpc_to_pairs(undist_c, dist_c, rpc_degree, num_iterations, parameter_tolerance)


def fit_rpc_undist(rpc_dist_coeffs: np.ndarray, cam: CameraParams, num_samples: int = 400,
                   num_iterations: int = 100, parameter_tolerance: float = 1e-12) -> np.ndarray:
    """Fit the inverse RPC: coefficients mapping RPC-distorted pixels back to
    undistorted ones (``fitRpcUndist``, `rpc_distortion.cc:658-721`)."""
    undist_c, _ = gen_undist_dist_pairs(cam, num_samples)
    dist_c = np.asarray(D.compute_rpc(jnp.asarray(undist_c), jnp.asarray(rpc_dist_coeffs)))
    deg = D.rpc_degree_from_num_params(len(rpc_dist_coeffs))
    return fit_rpc_to_pairs(dist_c, undist_c, deg, num_iterations, parameter_tolerance)


def eval_rpc_dist_undist(cam: CameraParams, dist_undist_coeffs: np.ndarray,
                         num_samples: int = 400) -> float:
    """Max distort->undistort round-trip error in pixels
    (``evalRpcDistUndist``, `rpc_distortion.cc:723-739`) — the reference's
    printed quality metric."""
    undist_c, _ = gen_undist_dist_pairs(cam, num_samples)
    n = len(dist_undist_coeffs) // 2
    p = jnp.asarray(undist_c)
    d = D.compute_rpc(p, jnp.asarray(dist_undist_coeffs[:n]))
    u = D.compute_rpc(d, jnp.asarray(dist_undist_coeffs[n:]))
    return float(jnp.max(jnp.linalg.norm(u - p, axis=-1)))


def fit_rpc_dist_undist(cam: CameraParams, rpc_degree: int, num_samples: int = 400,
                        num_iterations: int = 100,
                        parameter_tolerance: float = 1e-12) -> np.ndarray:
    """Full pipeline: fit distortion RPC + its inverse; returns the
    concatenated [dist|undist] coefficient vector in the reference's storage
    convention (`camera_params.cc:225-253`). The ``fit_rpc`` tool and
    ``updateRpcUndistortion`` equivalent."""
    dist_coeffs = fit_rpc_dist(cam, rpc_degree, num_samples, num_iterations,
                               parameter_tolerance)
    undist_coeffs = fit_rpc_undist(dist_coeffs, cam, num_samples, num_iterations,
                                   parameter_tolerance)
    return np.concatenate([dist_coeffs, undist_coeffs])
