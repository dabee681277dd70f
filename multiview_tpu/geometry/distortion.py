"""Lens distortion models as pure JAX functions on *centered* pixels.

Behavioral parity with the reference camera model
(`/root/reference/camera_model/camera_params.cc:260-355`):

- ``none``  : pure offset shuffle between centered frames
- ``fov``   : 1-coefficient FOV/fisheye model (atan radial warp)
- ``tsai``  : 4/5-coefficient OpenCV radtan model (k1,k2,p1,p2[,k3]);
              undistortion is the cv::undistortPoints fixed-point iteration
- ``rpc``   : rational-polynomial distortion of arbitrary degree with a
              separately fitted rational inverse
              (`/root/reference/camera_model/rpc_distortion.cc`)

The reference dispatches on the distortion-coefficient vector length
(`camera_params.cc:181-207`); here the model name is static (shapes must be
static under jit) and :func:`model_from_num_coeffs` reproduces the dispatch
for I/O layers.

Conventions (mirroring DistortCentered/UndistortCentered):
  undist_c : pixel in UNDISTORTED_C frame (origin at undistorted image center)
  dist_c   : pixel in DISTORTED_C frame   (origin at distorted image center)
For the RPC model, coefficients are stored as ``concat(distort, undistort)``
halves, exactly like the reference's ``distortion_coeffs_``
(`camera_params.cc:225-253`).

All functions broadcast over leading batch dims and are vmap/jit-safe.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

VALID_MODELS = ("none", "fov", "tsai", "rpc")


def model_from_num_coeffs(n: int) -> str:
    """Reference's coeff-length dispatch (`camera_params.cc:181-207`)."""
    if n == 0:
        return "none"
    if n == 1:
        return "fov"
    if n in (4, 5):
        return "tsai"
    if n > 5 and n % 2 == 0:
        return "rpc"
    raise ValueError(f"Irregular distortion vector size: {n}")


# ----------------------------------------------------------------------------
# RPC rational polynomial machinery
# (reference: rpc_distortion.cc:43-57,116-195,301-356)
# ----------------------------------------------------------------------------


def rpc_degree_from_num_params(num_dist_params: int) -> int:
    """`rpc_distortion.cc:43-45`."""
    return int(round(np.sqrt(2.0 * num_dist_params + 5.0) / 2.0 - 1.5))


def rpc_num_params_from_degree(deg: int) -> int:
    """`rpc_distortion.cc:47-49`: 2*(d+1)*(d+2)-2."""
    return 2 * (deg + 1) * (deg + 2) - 2


def _monomial_exponents(deg: int, start: int) -> np.ndarray:
    """Exponent pairs (px, py) for monomials x^(d-i) y^i, d=start..deg, i=0..d,
    in the reference's coefficient order (`rpc_distortion.cc:143-154`)."""
    out = []
    for d in range(start, deg + 1):
        for i in range(d + 1):
            out.append((d - i, i))
    return np.asarray(out, dtype=np.int32)


def compute_rpc(p, coeffs):
    """Evaluate the RPC map at centered pixel(s) p [...,2] with `coeffs` [n].

    coeffs layout: [num_x | den_x | num_y | den_y] where num has
    (n+2)/4 entries and den one fewer (implicit leading 1)
    (`rpc_distortion.cc:184-195`). Mirrors ``compute_rpc``
    (`rpc_distortion.cc:116-160`).
    """
    n = coeffs.shape[-1]
    deg = rpc_degree_from_num_params(n)
    if rpc_num_params_from_degree(deg) != n or deg <= 0:
        raise ValueError(f"Incorrect number of RPC coefficients: {n}")

    num_len = (n + 2) // 4
    den_len = num_len - 1

    num_exp = _monomial_exponents(deg, 0)   # [num_len, 2]
    den_exp = _monomial_exponents(deg, 1)   # [den_len, 2]

    x = p[..., 0:1]
    y = p[..., 1:2]

    def monomials(exps):
        # x^px * y^py for each monomial; exps are static numpy arrays, so the
        # gathers below resolve at trace time (integer powers, not exp/log)
        max_d = int(exps.max()) if len(exps) else 0
        xpows = jnp.concatenate(
            [jnp.ones_like(x)] + [x ** k for k in range(1, max_d + 1)], axis=-1)
        ypows = jnp.concatenate(
            [jnp.ones_like(y)] + [y ** k for k in range(1, max_d + 1)], axis=-1)
        return xpows[..., exps[:, 0]] * ypows[..., exps[:, 1]]

    mon_num = monomials(num_exp)  # [..., num_len]
    mon_den = monomials(den_exp)  # [..., den_len]

    num_x = coeffs[..., 0:num_len]
    den_x = coeffs[..., num_len:num_len + den_len]
    num_y = coeffs[..., num_len + den_len:2 * num_len + den_len]
    den_y = coeffs[..., 2 * num_len + den_len:]

    vx = jnp.sum(mon_num * num_x, axis=-1)
    wx = 1.0 + jnp.sum(mon_den * den_x, axis=-1)
    vy = jnp.sum(mon_num * num_y, axis=-1)
    wy = 1.0 + jnp.sum(mon_den * den_y, axis=-1)
    return jnp.stack([vx / wx, vy / wy], axis=-1)


def rpc_identity_params(deg: int, dtype=np.float64) -> np.ndarray:
    """Coefficients of the identity RPC transform of given degree
    (`rpc_distortion.cc:301-318`)."""
    n = rpc_num_params_from_degree(deg)
    num_len = (n + 2) // 4
    den_len = num_len - 1
    num_x = np.zeros(num_len, dtype)
    num_y = np.zeros(num_len, dtype)
    den = np.zeros(den_len, dtype)
    num_x[1] = 1.0  # coefficient of x
    num_y[2] = 1.0  # coefficient of y
    return np.concatenate([num_x, den, num_y, den])


def rpc_increment_degree(params: np.ndarray) -> np.ndarray:
    """Raise each of the four polynomials by one degree with zero-filled new
    coefficients (`rpc_distortion.cc:336-356`). Host-side helper for the
    progressive RPC fit."""
    params = np.asarray(params)
    n = params.shape[0]
    deg = rpc_degree_from_num_params(n)
    num_len = (n + 2) // 4
    den_len = num_len - 1
    num_x = params[:num_len]
    den_x = params[num_len:num_len + den_len]
    num_y = params[num_len + den_len:2 * num_len + den_len]
    den_y = params[2 * num_len + den_len:]
    pad = deg + 2  # count of new monomials of degree deg+1
    z = np.zeros(pad, params.dtype)
    return np.concatenate([num_x, z, den_x, z, num_y, z, den_y, z])


# ----------------------------------------------------------------------------
# Distort: UNDISTORTED_C -> DISTORTED_C  (camera_params.cc:260-314)
# ----------------------------------------------------------------------------


def distort_centered(model: str, coeffs, undist_c, focal, optical_offset, dist_half_size):
    """Map centered undistorted pixels to centered distorted pixels.

    Parity with ``CameraParameters::DistortCentered``
    (`camera_params.cc:260-314`).
    """
    if model == "none":
        return undist_c + optical_offset - dist_half_size

    if model == "fov":
        c0 = coeffs[..., 0]
        precalc1 = 1.0 / c0
        precalc2 = 2.0 * jnp.tan(c0 / 2.0)
        norm = undist_c / focal
        # sqrt has an infinite gradient at 0; clamp inside (center pixel case)
        ru = jnp.sqrt(jnp.maximum(jnp.sum(norm * norm, axis=-1), 1e-24))
        rd = jnp.arctan(ru * precalc2) * precalc1
        conv = jnp.where(ru > 1e-5, rd / ru, 1.0)
        return (optical_offset - dist_half_size) + conv[..., None] * norm * focal

    if model == "tsai":
        k1 = coeffs[..., 0]
        k2 = coeffs[..., 1]
        p1 = coeffs[..., 2]
        p2 = coeffs[..., 3]
        k3 = coeffs[..., 4] if coeffs.shape[-1] == 5 else jnp.zeros_like(k1)
        norm = undist_c / focal
        nx, ny = norm[..., 0], norm[..., 1]
        r2 = nx * nx + ny * ny
        radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        dx = radial * nx + 2 * p1 * nx * ny + p2 * (r2 + 2 * nx * nx)
        dy = radial * ny + p1 * (r2 + 2 * ny * ny) + 2 * p2 * nx * ny
        d = jnp.stack([dx, dy], axis=-1)
        return d * focal + (optical_offset - dist_half_size)

    if model == "rpc":
        # first half of coeffs = distortion RPC (camera_params.cc:225-235)
        n = coeffs.shape[-1] // 2
        return compute_rpc(undist_c, coeffs[..., :n])

    raise ValueError(f"Unknown distortion model: {model}")


# ----------------------------------------------------------------------------
# Undistort: DISTORTED_C -> UNDISTORTED_C  (camera_params.cc:316-355)
# ----------------------------------------------------------------------------


def undistort_centered(model: str, coeffs, dist_c, focal, optical_offset, dist_half_size,
                       tsai_iters: int = 20):
    """Map centered distorted pixels to centered undistorted pixels.

    Parity with ``CameraParameters::UndistortCentered``
    (`camera_params.cc:316-355`). The Tsai branch reproduces the
    cv::undistortPoints fixed-point iteration (the reference calls OpenCV at
    `camera_params.cc:335-349`); more iterations than OpenCV's 5 are used for
    a tighter round-trip.
    """
    if model == "none":
        return dist_c - (optical_offset - dist_half_size)

    if model == "fov":
        c0 = coeffs[..., 0]
        precalc2 = 2.0 * jnp.tan(c0 / 2.0)
        norm = (dist_c - (optical_offset - dist_half_size)) / focal
        rd = jnp.sqrt(jnp.maximum(jnp.sum(norm * norm, axis=-1), 1e-24))
        ru = jnp.tan(rd * c0) / precalc2
        conv = jnp.where(rd > 1e-5, ru / rd, 1.0)
        return conv[..., None] * norm * focal

    if model == "tsai":
        k1 = coeffs[..., 0]
        k2 = coeffs[..., 1]
        p1 = coeffs[..., 2]
        p2 = coeffs[..., 3]
        k3 = coeffs[..., 4] if coeffs.shape[-1] == 5 else jnp.zeros_like(k1)
        # cv::undistortPoints: normalize by the *distorted* intrinsics
        xy0 = (dist_c - (optical_offset - dist_half_size)) / focal
        xy = xy0

        for _ in range(tsai_iters):
            x, y = xy[..., 0], xy[..., 1]
            r2 = x * x + y * y
            icdist = 1.0 / (1.0 + ((k3 * r2 + k2) * r2 + k1) * r2)
            dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
            dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
            xy = (xy0 - jnp.stack([dx, dy], axis=-1)) * icdist[..., None]

        # back through the undistorted intrinsics (center = undist half size),
        # then re-center: undist_c = normalized * focal
        return xy * focal

    if model == "rpc":
        # second half of coeffs = fitted undistortion RPC
        n = coeffs.shape[-1] // 2
        return compute_rpc(dist_c, coeffs[..., n:])

    raise ValueError(f"Unknown distortion model: {model}")
