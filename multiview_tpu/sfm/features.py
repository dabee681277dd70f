"""Feature detection + description: DoG/SIFT-like and Hessian/SURF-like.

The role of OpenCV's SIFT *and* SURF in the reference front-end
(`/root/reference/rig_calibrator/src/interest_point.cc:51-106`: default
10000 features/image; detector selection + SURF dynamic retry
`/root/reference/rig_calibrator/src/matching.cc:48-183`) re-designed for
TPU: the Gaussian pyramid is separable convolutions, extrema detection is a
vectorized 3x3x3 neighborhood test over whole scale slabs, and descriptors
are computed for all keypoints at once with a vmapped rotated-patch gather
(map_coordinates) + histogram soft binning. Everything is statically
shaped: top-K selection pads to ``max_features`` with a validity mask.

Two detector families, selected by ``detector=``:

- ``"sift"`` — DoG extrema + 128-d gradient-histogram descriptors.
- ``"surf"`` — scale-normalized determinant-of-Hessian maxima (the role of
  SURF's box-filter Fast Hessian, computed here with exact Gaussian second
  derivatives — box filters were a CPU-integral-image trick, not a spec)
  + 64-d per-cell [sum dx, sum dy, sum |dx|, sum |dy|] descriptors,
  zero-padded to 128 so every downstream matching kernel sees one shape.

No learned weights, no external deps — detector output feeds
sfm/matching.py's MXU distance kernels.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class Keypoints(NamedTuple):
    xy: jnp.ndarray        # [K,2] (x,y) in input-image pixels
    scale: jnp.ndarray     # [K] blur sigma at detection
    response: jnp.ndarray  # [K] |DoG| response
    angle: jnp.ndarray     # [K] dominant orientation (radians)
    valid: jnp.ndarray     # [K] bool


def _gauss_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur, reflect padding. img [H,W]."""
    radius = max(1, int(np.ceil(3.0 * sigma)))
    k = jnp.asarray(_gauss_kernel1d(sigma, radius))
    pad = [(radius, radius)]
    x = jnp.pad(img, pad + [(0, 0)], mode="reflect")
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1,
                 out_axes=1)(x)
    x = jnp.pad(x, [(0, 0)] + pad, mode="reflect")
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(x)
    return x


@functools.lru_cache(maxsize=None)
def _detect_jit(max_features: int, num_scales: int, num_octaves: int,
                sigma0: float, edge_threshold: float, detector: str):
    """Compiled single-image detector; the contrast threshold stays a traced
    argument so the adaptive retry loop reuses one executable."""
    return jax.jit(lambda im, ct: detect_and_describe(
        im, max_features=max_features, num_scales=num_scales,
        num_octaves=num_octaves, sigma0=sigma0, contrast_threshold=ct,
        edge_threshold=edge_threshold, detector=detector))


def detect_and_describe_dynamic(img, max_features: int = 1000,
                                min_features: Optional[int] = None,
                                contrast_threshold: Optional[float] = None,
                                max_retries: int = 5, num_scales: int = 3,
                                num_octaves: int = 4, sigma0: float = 1.6,
                                edge_threshold: float = 10.0,
                                detector: str = "sift"):
    """Adaptive-threshold detection: lower the detection threshold until at
    least ``min_features`` keypoints are found (or retries run out) — the
    reference's DynamicDetector retry loop that tunes the SURF Hessian
    threshold into a target range
    (`/root/reference/rig_calibrator/src/matching.cc:48-183`). For
    ``detector="surf"`` the traced threshold IS the Hessian threshold;
    ``contrast_threshold=None`` starts from the detector-family default."""
    if min_features is None:
        min_features = max(8, max_features // 10)
    fn = _detect_jit(max_features, num_scales, num_octaves, sigma0,
                     edge_threshold, detector)
    img = jnp.asarray(img, jnp.float32)
    th = (contrast_threshold if contrast_threshold is not None
          else default_threshold(detector))
    for _ in range(max_retries):
        kp, desc = fn(img, th)
        if int(kp.valid.sum()) >= min_features:
            return kp, desc
        th *= 0.25
    return kp, desc


def default_threshold(detector: str) -> float:
    """Detection-response threshold default per detector family (SIFT's is a
    DoG contrast, SURF's a scale-normalized determinant-of-Hessian)."""
    return 1e-6 if detector == "surf" else 0.015


def detect_and_describe(img, max_features: int = 1000, num_scales: int = 3,
                        num_octaves: int = 4, sigma0: float = 1.6,
                        contrast_threshold: float = 0.015,
                        edge_threshold: float = 10.0,
                        detector: str = "sift") -> Tuple[Keypoints, jnp.ndarray]:
    """Detect keypoints and compute 128-d descriptors.

    img: [H,W] float grayscale in [0,1]. Returns (Keypoints, descriptors
    [max_features, 128]); invalid rows are zeroed and masked.
    ``detector``: "sift" (DoG + gradient histograms) or "surf"
    (determinant-of-Hessian + Haar-style sums, padded to 128).
    """
    if detector not in ("sift", "surf"):
        raise ValueError(f"unknown detector {detector!r}")
    img = jnp.asarray(img, jnp.float32)

    all_kp = []
    base = img
    for octave in range(num_octaves):
        if detector == "surf":
            kps = _detect_octave_hessian(base, octave, num_scales, sigma0,
                                         contrast_threshold, max_features)
        else:
            kps = _detect_octave(base, octave, num_scales, sigma0,
                                 contrast_threshold, edge_threshold,
                                 max_features)
        all_kp.append(kps)
        H, W = base.shape
        if min(H, W) // 2 < 16:
            break
        base = gaussian_blur(base, sigma0)[::2, ::2]

    xy = jnp.concatenate([k[0] for k in all_kp])
    scale = jnp.concatenate([k[1] for k in all_kp])
    resp = jnp.concatenate([k[2] for k in all_kp])
    valid = jnp.concatenate([k[3] for k in all_kp])

    # global top-K by response among valid
    score = jnp.where(valid, resp, -jnp.inf)
    top = jax.lax.top_k(score, max_features)[1]
    xy, scale, resp, valid = xy[top], scale[top], resp[top], valid[top]

    angle = _orientations(img, xy, scale, valid)
    if detector == "surf":
        desc = _surf_descriptors(img, xy, scale, angle, valid)
    else:
        desc = _descriptors(img, xy, scale, angle, valid)
    kp = Keypoints(xy, scale, resp, angle, valid)
    return kp, desc


def _detect_octave_hessian(base, octave, num_scales, sigma0,
                           hessian_threshold, per_octave_k):
    """Scale-normalized determinant-of-Hessian maxima in one octave — the
    role of SURF's Fast Hessian (`matching.cc:48-183` selects SURF by this
    response). Exact Gaussian second derivatives replace SURF's box-filter
    approximation (an integral-image CPU trick; separable convs are the TPU
    shape of the same operator). Returns (xy, sigma, resp, valid) padded to
    per_octave_k rows in original-resolution coordinates."""
    k = 2.0 ** (1.0 / num_scales)
    sigmas = [sigma0 * k ** s for s in range(num_scales + 2)]
    L = jnp.stack([gaussian_blur(base, s) for s in sigmas])   # [S,H,W]

    lxx = jnp.roll(L, -1, 2) + jnp.roll(L, 1, 2) - 2 * L
    lyy = jnp.roll(L, -1, 1) + jnp.roll(L, 1, 1) - 2 * L
    lxy = 0.25 * (jnp.roll(L, (-1, -1), (1, 2)) + jnp.roll(L, (1, 1), (1, 2))
                  - jnp.roll(L, (-1, 1), (1, 2)) - jnp.roll(L, (1, -1), (1, 2)))
    signorm = jnp.asarray(sigmas, jnp.float32)[:, None, None] ** 4
    doh = (lxx * lyy - lxy * lxy) * signorm                   # [S,H,W]

    center = doh[1:-1]
    # 26-neighbor maximum test (DoH blobs are positive maxima)
    neighs = []
    for ds in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if ds == 0 and dy == 0 and dx == 0:
                    continue
                neighs.append(jnp.roll(doh, (ds, dy, dx), axis=(0, 1, 2))[1:-1])
    is_max = functools.reduce(jnp.logical_and, [center > n for n in neighs])
    extremum = is_max & (center > hessian_threshold)

    Hc, Wc = base.shape
    border = 8
    ygrid = jax.lax.broadcasted_iota(jnp.int32, center.shape, 1)
    xgrid = jax.lax.broadcasted_iota(jnp.int32, center.shape, 2)
    inside = ((xgrid >= border) & (xgrid < Wc - border)
              & (ygrid >= border) & (ygrid < Hc - border))
    extremum = extremum & inside

    score = jnp.where(extremum, center, 0.0).reshape(-1)
    vals, flat_idx = jax.lax.top_k(score, per_octave_k)
    s_idx = flat_idx // (Hc * Wc)
    y_idx = (flat_idx % (Hc * Wc)) // Wc
    x_idx = flat_idx % Wc
    valid = vals > 0.0

    # sub-pixel refinement on the DoH response (same quadratic fit as DoG)
    c00 = center[s_idx, y_idx, x_idx]
    cxm = center[s_idx, y_idx, jnp.maximum(x_idx - 1, 0)]
    cxp = center[s_idx, y_idx, jnp.minimum(x_idx + 1, Wc - 1)]
    cym = center[s_idx, jnp.maximum(y_idx - 1, 0), x_idx]
    cyp = center[s_idx, jnp.minimum(y_idx + 1, Hc - 1), x_idx]
    gx = 0.5 * (cxp - cxm)
    gy = 0.5 * (cyp - cym)
    hxx = cxp + cxm - 2 * c00
    hyy = cyp + cym - 2 * c00
    dx = jnp.clip(-gx / jnp.where(jnp.abs(hxx) > 1e-12, hxx, 1e-12), -0.5, 0.5)
    dy = jnp.clip(-gy / jnp.where(jnp.abs(hyy) > 1e-12, hyy, 1e-12), -0.5, 0.5)

    factor = float(2 ** octave)
    xy = (jnp.stack([x_idx, y_idx], axis=-1).astype(jnp.float32)
          + jnp.stack([dx, dy], axis=-1)) * factor
    sig = jnp.asarray(sigmas[1:num_scales + 1],
                      jnp.float32)[jnp.clip(s_idx, 0, num_scales - 1)] * factor
    return xy, sig, vals, valid


def _detect_octave(base, octave, num_scales, sigma0, contrast_threshold,
                   edge_threshold, per_octave_k):
    """DoG extrema in one octave. Returns (xy, sigma, resp, valid) padded to
    per_octave_k rows (image coordinates of the original resolution)."""
    k = 2.0 ** (1.0 / num_scales)
    sigmas = [sigma0 * k ** s for s in range(num_scales + 3)]
    gauss = [gaussian_blur(base, s) for s in sigmas]
    dog = jnp.stack([gauss[i + 1] - gauss[i] for i in range(len(gauss) - 1)])

    D = dog  # [S,H,W]
    center = D[1:-1]

    # 26-neighbor extremum test, vectorized with shifted slabs
    def shifts(x):
        outs = []
        for ds in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if ds == 0 and dy == 0 and dx == 0:
                        continue
                    outs.append(jnp.roll(x, (ds, dy, dx), axis=(0, 1, 2))[1:-1])
        return outs

    neigh = shifts(D)
    is_max = functools.reduce(jnp.logical_and, [center > n for n in neigh])
    is_min = functools.reduce(jnp.logical_and, [center < n for n in neigh])
    extremum = (is_max | is_min) & (jnp.abs(center) > contrast_threshold)

    # edge rejection via Hessian trace^2/det ratio
    dxx = jnp.roll(center, -1, 2) + jnp.roll(center, 1, 2) - 2 * center
    dyy = jnp.roll(center, -1, 1) + jnp.roll(center, 1, 1) - 2 * center
    dxy = 0.25 * (jnp.roll(center, (-1, -1), (1, 2)) + jnp.roll(center, (1, 1), (1, 2))
                  - jnp.roll(center, (-1, 1), (1, 2)) - jnp.roll(center, (1, -1), (1, 2)))
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_threshold
    edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
    extremum = extremum & edge_ok

    # kill border detections
    Hc, Wc = base.shape
    border = 8
    ygrid = jax.lax.broadcasted_iota(jnp.int32, center.shape, 1)
    xgrid = jax.lax.broadcasted_iota(jnp.int32, center.shape, 2)
    inside = ((xgrid >= border) & (xgrid < Wc - border)
              & (ygrid >= border) & (ygrid < Hc - border))
    extremum = extremum & inside

    score = jnp.where(extremum, jnp.abs(center), 0.0).reshape(-1)
    vals, flat_idx = jax.lax.top_k(score, per_octave_k)
    s_idx = flat_idx // (Hc * Wc)
    y_idx = (flat_idx % (Hc * Wc)) // Wc
    x_idx = flat_idx % Wc
    valid = vals > 0.0

    # sub-pixel refinement: quadratic fit of the DoG around the extremum,
    # offset = -H^-1 g in (x, y), clipped to half a pixel
    c00 = center[s_idx, y_idx, x_idx]
    cxm = center[s_idx, y_idx, jnp.maximum(x_idx - 1, 0)]
    cxp = center[s_idx, y_idx, jnp.minimum(x_idx + 1, Wc - 1)]
    cym = center[s_idx, jnp.maximum(y_idx - 1, 0), x_idx]
    cyp = center[s_idx, jnp.minimum(y_idx + 1, Hc - 1), x_idx]
    gx = 0.5 * (cxp - cxm)
    gy = 0.5 * (cyp - cym)
    hxx = cxp + cxm - 2 * c00
    hyy = cyp + cym - 2 * c00
    dx = jnp.clip(-gx / jnp.where(jnp.abs(hxx) > 1e-12, hxx, 1e-12), -0.5, 0.5)
    dy = jnp.clip(-gy / jnp.where(jnp.abs(hyy) > 1e-12, hyy, 1e-12), -0.5, 0.5)

    factor = float(2 ** octave)
    xy = (jnp.stack([x_idx, y_idx], axis=-1).astype(jnp.float32)
          + jnp.stack([dx, dy], axis=-1)) * factor
    sig = jnp.asarray([sigmas[1 + s] for s in range(num_scales + 1)],
                      jnp.float32)[jnp.clip(s_idx, 0, num_scales)] * factor
    return xy, sig, vals, valid


def _patch_grid(xy, scale, angle, n: int, spacing: float):
    """Rotated sampling grid around each keypoint: [K, n, n, 2] (row, col)."""
    lin = (jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0)
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    step = spacing * scale
    rx = (ca[:, None, None] * gx[None] - sa[:, None, None] * gy[None]) * step[:, None, None]
    ry = (sa[:, None, None] * gx[None] + ca[:, None, None] * gy[None]) * step[:, None, None]
    rows = xy[:, 1][:, None, None] + ry
    cols = xy[:, 0][:, None, None] + rx
    return rows, cols


def _sample(img, rows, cols):
    return jax.scipy.ndimage.map_coordinates(img, [rows, cols], order=1,
                                             mode="nearest")


def _orientations(img, xy, scale, valid, n: int = 16):
    """Dominant gradient orientation per keypoint (36-bin histogram)."""
    rows, cols = _patch_grid(xy, scale, jnp.zeros_like(scale), n, 0.75)
    patch = _sample(img, rows, cols)                       # [K,n,n]
    gy = jnp.gradient(patch, axis=1)
    gx = jnp.gradient(patch, axis=2)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)
    bins = jnp.floor((ang + np.pi) / (2 * np.pi) * 36).astype(jnp.int32) % 36
    # gaussian weighting by radius
    lin = (jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0)
    wy, wx = jnp.meshgrid(lin, lin, indexing="ij")
    w = jnp.exp(-(wx * wx + wy * wy) / (2 * (n / 3.0) ** 2))
    weights = (mag * w[None]).reshape(len(xy), -1)
    bins = bins.reshape(len(xy), -1)
    hist = jax.vmap(lambda b, wgt: jnp.zeros(36).at[b].add(wgt))(bins, weights)
    # smooth circularly
    hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    peak = jnp.argmax(hist, axis=-1)
    return (peak.astype(jnp.float32) + 0.5) / 36.0 * 2 * np.pi - np.pi


def _descriptors(img, xy, scale, angle, valid, n: int = 16):
    """SIFT-like 4x4x8 descriptors -> [K,128], L2-normalized, 0.2-clipped.

    The sampling grid is rotated by the keypoint orientation, so gradients
    of the sampled patch are ALREADY expressed in the keypoint frame
    (d/d(patch-x) is the directional derivative along the rotated axis) —
    no further rotation of the gradient angles is needed (subtracting the
    orientation again double-rotates and silently destroys invariance
    beyond ~45 degrees of in-plane rotation)."""
    rows, cols = _patch_grid(xy, scale, angle, n, 1.0)
    patch = _sample(img, rows, cols)
    gy = jnp.gradient(patch, axis=1)
    gx = jnp.gradient(patch, axis=2)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)
    obin = jnp.floor((ang + np.pi) / (2 * np.pi) * 8).astype(jnp.int32) % 8

    cell_y = jnp.arange(n) // (n // 4)
    cell_x = jnp.arange(n) // (n // 4)
    cy = jnp.broadcast_to(cell_y[:, None], (n, n))
    cx = jnp.broadcast_to(cell_x[None, :], (n, n))
    flat_bin = ((cy * 4 + cx)[None] * 8 + obin)            # [K,n,n]

    K = len(xy)
    desc = jax.vmap(lambda b, m: jnp.zeros(128).at[b.reshape(-1)].add(m.reshape(-1)))(
        flat_bin, mag)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-8)
    desc = jnp.minimum(desc, 0.2)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-8)
    return desc * valid[:, None]


def _surf_descriptors(img, xy, scale, angle, valid, n: int = 16):
    """SURF-style descriptors -> [K,128] (64 real dims zero-padded).

    Per 4x4 cell of the rotated patch: [sum dx, sum dy, sum |dx|, sum |dy|]
    of keypoint-frame gradients (the Haar-wavelet responses of SURF,
    computed as image gradients on the sampled patch), Gaussian-weighted,
    L2-normalized. Padding to 128 keeps one descriptor shape across both
    detector families for the matching kernels (zero columns add nothing to
    L2 distances)."""
    rows, cols = _patch_grid(xy, scale, angle, n, 1.0)
    patch = _sample(img, rows, cols)                          # [K,n,n]
    # patch gradients are already in the keypoint frame (rotated grid) —
    # see _descriptors; rotating them again would break invariance
    dy = jnp.gradient(patch, axis=1)
    dx = jnp.gradient(patch, axis=2)

    lin = (jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0)
    wy, wx = jnp.meshgrid(lin, lin, indexing="ij")
    w = jnp.exp(-(wx * wx + wy * wy) / (2 * (n / 3.0) ** 2))[None]

    cell = jnp.arange(n) // (n // 4)
    cy = jnp.broadcast_to(cell[:, None], (n, n))
    cx = jnp.broadcast_to(cell[None, :], (n, n))
    cell_id = (cy * 4 + cx)[None]                             # [1,n,n]

    K = len(xy)
    feats = jnp.stack([dx, dy, jnp.abs(dx), jnp.abs(dy)], axis=-1) * w[..., None]
    bins = cell_id[..., None] * 4 + jnp.arange(4)             # [1,n,n,4]
    bins = jnp.broadcast_to(bins, feats.shape)
    desc = jax.vmap(lambda b, f: jnp.zeros(64).at[b.reshape(-1)].add(f.reshape(-1)))(
        bins, feats)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-8)
    desc = jnp.pad(desc, ((0, 0), (0, 64)))
    return desc * valid[:, None]
