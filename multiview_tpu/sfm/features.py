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
                sigma0: float, edge_threshold: float, detector: str,
                min_features: Optional[int], max_retries: int):
    """Compiled single-image detector; the contrast threshold stays a traced
    argument so one executable serves every threshold."""
    return jax.jit(lambda im, ct: detect_and_describe(
        im, max_features=max_features, num_scales=num_scales,
        num_octaves=num_octaves, sigma0=sigma0, contrast_threshold=ct,
        edge_threshold=edge_threshold, detector=detector,
        min_features=min_features, max_retries=max_retries))


def detect_and_describe_dynamic(img, max_features: int = 1000,
                                min_features: Optional[int] = None,
                                contrast_threshold: Optional[float] = None,
                                max_retries: int = 5, num_scales: int = 3,
                                num_octaves: int = 4, sigma0: float = 1.6,
                                edge_threshold: float = 10.0,
                                detector: str = "sift"):
    """Adaptive-threshold detection: effectively lowers the detection
    threshold until at least ``min_features`` keypoints are found — the
    reference's DynamicDetector retry loop that tunes the SURF Hessian
    threshold into a target range
    (`/root/reference/rig_calibrator/src/matching.cc:48-183`).

    ONE dispatch, no retries: detection runs at the schedule's floor
    threshold and the in-graph threshold selection (``_adaptive_valid``)
    returns exactly the keypoints the sequential 0.25x-retry loop would —
    the candidate set at a lower threshold is a superset with identical
    responses, so every retry's outcome is a response cut of the floor
    detection. (The serialized per-image retry loop was the dominant cost
    of the r4 front-end: ~2x detection + per-image dispatches, 123.5
    ms/image for a 15 ms pipeline.)

    For ``detector="surf"`` the traced threshold IS the Hessian threshold;
    ``contrast_threshold=None`` starts from the detector-family default."""
    if min_features is None:
        min_features = max(8, max_features // 10)
    fn = _detect_jit(max_features, num_scales, num_octaves, sigma0,
                     edge_threshold, detector, min_features, max_retries)
    img = jnp.asarray(img, jnp.float32)
    th = (contrast_threshold if contrast_threshold is not None
          else default_threshold(detector))
    return fn(img, th)


def _adaptive_valid(resp, valid, th0, min_features: int, max_retries: int):
    """In-graph replica of the DynamicDetector retry schedule: given
    responses detected at the floor threshold ``th0 * 0.25**(max_retries-1)``,
    keep the keypoints above the FIRST threshold of the geometric schedule
    [th0, th0*0.25, ...] with >= min_features survivors (or the floor when
    none reaches it) — bitwise the sequential retry loop's surviving set."""
    ks = jnp.arange(max_retries, dtype=resp.dtype)
    ths = th0 * 0.25 ** ks                                    # descending
    counts = jnp.sum((resp[None, :] > ths[:, None]) & valid[None, :], axis=1)
    ok = counts >= min_features
    idx = jnp.where(jnp.any(ok), jnp.argmax(ok), max_retries - 1)
    return valid & (resp > ths[idx])


def default_threshold(detector: str) -> float:
    """Detection-response threshold default per detector family (SIFT's is a
    DoG contrast, SURF's a scale-normalized determinant-of-Hessian)."""
    return 1e-6 if detector == "surf" else 0.015


def detect_keypoints(img, max_features: int = 1000, num_scales: int = 3,
                     num_octaves: int = 4, sigma0: float = 1.6,
                     contrast_threshold: float = 0.015,
                     edge_threshold: float = 10.0,
                     detector: str = "sift",
                     min_features: Optional[int] = None,
                     max_retries: int = 5,
                     per_octave_k: Optional[int] = None):
    """Detection half: pyramid + per-octave extrema + global top-K.

    With ``min_features``, detection runs at the adaptive schedule's floor
    threshold and ``_adaptive_valid`` selects the effective threshold
    in-graph (the single-dispatch DynamicDetector — see
    detect_and_describe_dynamic).

    Returns (bases tuple of per-octave images, xy, scale, resp, valid),
    all sorted by detection response (invalid rows have score -inf and
    therefore sort LAST — slicing the first k rows keeps every valid
    keypoint whenever k >= the valid count, the property the bucketed
    descriptor pass in pipeline.detect_all relies on; the adaptive valid
    cut keeps that prefix property, resp being the sort key)."""
    bases, scores, centers = detect_scores(
        img, num_scales, num_octaves, sigma0, contrast_threshold,
        edge_threshold, detector,
        min_features=min_features, max_retries=max_retries)
    xy, scale, resp, valid = select_keypoints(
        scores, centers, num_scales, sigma0, max_features, detector,
        per_octave_k=per_octave_k)
    if min_features is not None:
        valid = _adaptive_valid(resp, valid, contrast_threshold,
                                min_features, max_retries)
    return (bases, xy, scale, resp, valid)


def detect_scores(img, num_scales: int = 3, num_octaves: int = 4,
                  sigma0: float = 1.6, contrast_threshold: float = 0.015,
                  edge_threshold: float = 10.0, detector: str = "sift",
                  min_features: Optional[int] = None, max_retries: int = 5):
    """Score-map half of detection: pyramid + extrema tests, NO top-k.

    Returns (bases, scores, centers): per-octave base images, masked
    response maps (0 everywhere but at extrema above the floor threshold),
    and the raw DoG/DoH center slabs needed for sub-pixel refinement.
    Splitting here lets the batch-level callers count candidates in-graph
    (``jnp.sum(score > 0)``) and pick a top-k bucket BEFORE selection —
    ``lax.top_k`` cost scales with k (measured 19 -> 50 ms per 8 images
    from k=128 to k=10000) while typical scenes yield ~2k extrema."""
    if detector not in ("sift", "surf"):
        raise ValueError(f"unknown detector {detector!r}")
    img = jnp.asarray(img, jnp.float32)

    floor = (contrast_threshold if min_features is None
             else contrast_threshold * 0.25 ** (max_retries - 1))
    bases, scores, centers = [], [], []
    base = img
    for octave in range(num_octaves):
        bases.append(base)
        if detector == "surf":
            sc, ce = _octave_scores_hessian(base, num_scales, sigma0, floor)
        else:
            sc, ce = _octave_scores_dog(base, num_scales, sigma0, floor,
                                        edge_threshold)
        scores.append(sc)
        centers.append(ce)
        H, W = base.shape
        if min(H, W) // 2 < 16:
            break
        base = gaussian_blur(base, sigma0)[::2, ::2]
    return tuple(bases), tuple(scores), tuple(centers)


def select_keypoints(scores, centers, num_scales: int, sigma0: float,
                     max_features: int, detector: str = "sift",
                     per_octave_k: Optional[int] = None):
    """Selection half: per-octave top-k + sub-pixel refinement + global
    top-``max_features``, padded to ``max_features`` rows.

    ``per_octave_k`` bounds the per-octave top-k (default: max_features).
    Whenever every octave's candidate count is <= per_octave_k the result's
    VALID rows are bitwise those of the unbounded selection (candidates are
    a superset at the floor threshold; weaker k only drops rows that would
    be cut anyway) — the exactness contract the batch-level top-k bucket
    ladder in sfm/pipeline.py relies on (it picks the bucket from in-graph
    candidate counts)."""
    all_kp = []
    for octave, (sc, ce) in enumerate(zip(scores, centers)):
        k_o = min(per_octave_k or max_features, int(np.prod(sc.shape)))
        all_kp.append(_octave_select(sc, ce, octave, num_scales, sigma0,
                                     k_o, detector))

    xy = jnp.concatenate([k[0] for k in all_kp])
    scale = jnp.concatenate([k[1] for k in all_kp])
    resp = jnp.concatenate([k[2] for k in all_kp])
    valid = jnp.concatenate([k[3] for k in all_kp])

    # global top-K by response among valid
    k_fin = min(max_features, xy.shape[0])
    score = jnp.where(valid, resp, -jnp.inf)
    top = jax.lax.top_k(score, k_fin)[1]
    xy, scale, resp, valid = xy[top], scale[top], resp[top], valid[top]
    if k_fin < max_features:
        n = max_features - k_fin
        xy = jnp.pad(xy, ((0, n), (0, 0)))
        scale = jnp.pad(scale, (0, n))
        resp = jnp.pad(resp, (0, n))
        valid = jnp.pad(valid, (0, n))
    return xy, scale, resp, valid


def describe_keypoints(bases, xy, scale, resp, valid, sigma0: float = 1.6,
                       detector: str = "sift",
                       pad_to: Optional[int] = None):
    """Description half: patches + orientations + descriptors for the given
    (possibly response-truncated) keypoint rows. With ``pad_to``, outputs
    are zero-padded back to that many rows (padded rows invalid) so
    downstream static shapes are unchanged by descriptor bucketing."""
    patches, pcx, pcy, sloc = _extract_patches(list(bases), xy, scale, sigma0)
    angle = _orientations(patches, pcx, pcy, sloc)
    if detector == "surf":
        desc = _surf_descriptors(patches, pcx, pcy, sloc, angle, valid)
    else:
        desc = _descriptors(patches, pcx, pcy, sloc, angle, valid)
    kp = Keypoints(xy, scale, resp, angle, valid)
    if pad_to is not None and pad_to > xy.shape[0]:
        n = pad_to - xy.shape[0]
        kp = Keypoints(
            jnp.pad(xy, ((0, n), (0, 0))), jnp.pad(scale, (0, n)),
            jnp.pad(resp, (0, n)), jnp.pad(angle, (0, n)),
            jnp.pad(valid, (0, n)))
        desc = jnp.pad(desc, ((0, n), (0, 0)))
    return kp, desc


def detect_and_describe(img, max_features: int = 1000, num_scales: int = 3,
                        num_octaves: int = 4, sigma0: float = 1.6,
                        contrast_threshold: float = 0.015,
                        edge_threshold: float = 10.0,
                        detector: str = "sift",
                        min_features: Optional[int] = None,
                        max_retries: int = 5) -> Tuple[Keypoints, jnp.ndarray]:
    """Detect keypoints and compute 128-d descriptors.

    img: [H,W] float grayscale in [0,1]. Returns (Keypoints, descriptors
    [max_features, 128]); invalid rows are zeroed and masked.
    ``detector``: "sift" (DoG + gradient histograms) or "surf"
    (determinant-of-Hessian + Haar-style sums, padded to 128).
    ``min_features``: in-graph adaptive thresholding (see detect_keypoints).
    """
    bases, xy, scale, resp, valid = detect_keypoints(
        img, max_features, num_scales, num_octaves, sigma0,
        contrast_threshold, edge_threshold, detector,
        min_features=min_features, max_retries=max_retries)
    return describe_keypoints(bases, xy, scale, resp, valid, sigma0, detector)


def _octave_scores_hessian(base, num_scales, sigma0, hessian_threshold):
    """Scale-normalized determinant-of-Hessian response maps in one octave
    — the role of SURF's Fast Hessian (`matching.cc:48-183` selects SURF by
    this response). Exact Gaussian second derivatives replace SURF's
    box-filter approximation (an integral-image CPU trick; separable convs
    are the TPU shape of the same operator). Returns (score, center):
    masked responses (0 off-extremum) and the raw DoH slabs."""
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
    return jnp.where(extremum, center, 0.0), center


def _octave_scores_dog(base, num_scales, sigma0, contrast_threshold,
                       edge_threshold):
    """DoG extrema response maps in one octave. Returns (score, center):
    |DoG| masked to extrema passing contrast/edge/border tests (0
    elsewhere) and the raw signed DoG slabs for refinement."""
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
    return jnp.where(extremum, jnp.abs(center), 0.0), center


def _octave_select(score, center, octave, num_scales, sigma0, per_octave_k,
                   detector):
    """Top-``per_octave_k`` selection + sub-pixel refinement over one
    octave's masked score map. Returns (xy, sigma, resp, valid) in
    original-resolution coordinates."""
    Sc, Hc, Wc = center.shape
    vals, flat_idx = jax.lax.top_k(score.reshape(-1), per_octave_k)
    s_idx = flat_idx // (Hc * Wc)
    y_idx = (flat_idx % (Hc * Wc)) // Wc
    x_idx = flat_idx % Wc
    valid = vals > 0.0

    # sub-pixel refinement: quadratic fit of the response around the
    # extremum, offset = -H^-1 g in (x, y), clipped to half a pixel
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

    k = 2.0 ** (1.0 / num_scales)
    factor = float(2 ** octave)
    xy = (jnp.stack([x_idx, y_idx], axis=-1).astype(jnp.float32)
          + jnp.stack([dx, dy], axis=-1)) * factor
    if detector == "surf":
        sigmas = [sigma0 * k ** s for s in range(num_scales + 2)]
        sig = jnp.asarray(sigmas[1:num_scales + 1], jnp.float32)[
            jnp.clip(s_idx, 0, num_scales - 1)] * factor
    else:
        sigmas = [sigma0 * k ** s for s in range(num_scales + 3)]
        sig = jnp.asarray([sigmas[1 + s] for s in range(num_scales + 1)],
                          jnp.float32)[jnp.clip(s_idx, 0, num_scales)] * factor
    return xy, sig, vals, valid


_PATCH = 64  # static upright window side, in octave-level pixels


def _extract_patches(bases, xy, scale, sigma0):
    """Per-keypoint upright patches from the Gaussian pyramid.

    TPU shape of the reference's per-keypoint patch work (OpenCV samples a
    rotated grid point-by-point): per-ELEMENT gathers serialize on TPU
    (measured 5.1 s for 8x10k keypoints), so each keypoint instead takes ONE
    contiguous ``dynamic_slice`` of a fixed [64,64] window from its pyramid
    level (row-granular block gather), and all rotation/scaling happens
    inside that window with batched matmuls (see ``_resample``).

    Each keypoint is assigned the octave where its local scale falls in
    [sigma0, 2*sigma0), so the descriptor extent fits the static window —
    EXCEPT the top octave (o is clipped to len(bases)-1), whose two highest
    scale slots keep sloc up to 2.52*sigma0 and rotated corner samples can
    exceed the half-window; those samples clamp to the window edge in
    ``_resample`` (nearest semantics), a graceful quality taper rather than
    a hard error. Octave images are edge-padded onto a full-resolution
    canvas so out-of-bounds sampling clamps (the former map_coordinates
    mode="nearest" semantics).

    Returns (patches [K,P,P], cx, cy patch-local centers, sloc local scale).
    """
    H = max(bases[0].shape[0], _PATCH)   # canvas >= window (tiny images)
    W = max(bases[0].shape[1], _PATCH)
    canvas = jnp.stack([
        jnp.pad(b, ((0, H - b.shape[0]), (0, W - b.shape[1])), mode="edge")
        for b in bases])                                      # [O,H,W]
    o = jnp.clip(jnp.floor(jnp.log2(jnp.maximum(scale, 1e-6) / sigma0))
                 .astype(jnp.int32), 0, len(bases) - 1)
    f = jnp.exp2(o.astype(jnp.float32))
    cx = xy[:, 0] / f
    cy = xy[:, 1] / f
    oy = jnp.clip(jnp.round(cy).astype(jnp.int32) - _PATCH // 2, 0, H - _PATCH)
    ox = jnp.clip(jnp.round(cx).astype(jnp.int32) - _PATCH // 2, 0, W - _PATCH)

    def one(o_i, oy_i, ox_i):
        return jax.lax.dynamic_slice(canvas, (o_i, oy_i, ox_i),
                                     (1, _PATCH, _PATCH))[0]

    patches = jax.vmap(one)(o, oy, ox)                        # [K,P,P]
    return (patches, cx - ox.astype(jnp.float32),
            cy - oy.astype(jnp.float32), scale / f)


def _resample(patches, pcx, pcy, step, m: int):
    """Axis-aligned bilinear resampling inside each patch as two batched
    matmuls (separable hat-function weights) — the MXU form of per-keypoint
    scale adaptation. patches [K,P,P]; step [K] (octave px per output px).
    Returns [K,m,m] with rows = y."""
    lin = jnp.arange(m, dtype=jnp.float32) - (m - 1) / 2.0
    rows = pcy[:, None] + lin[None, :] * step[:, None]        # [K,m]
    cols = pcx[:, None] + lin[None, :] * step[:, None]
    # clamp into the window so out-of-window samples read the edge value
    # (nearest/clamp semantics — the window edge coincides with the image
    # edge after ox/oy clipping in _extract_patches); without this the hat
    # weights vanish and border keypoints silently read 0.0
    rows = jnp.clip(rows, 0.0, _PATCH - 1.0)
    cols = jnp.clip(cols, 0.0, _PATCH - 1.0)
    idx = jnp.arange(_PATCH, dtype=jnp.float32)
    wr = jnp.clip(1.0 - jnp.abs(rows[:, :, None] - idx), 0.0, 1.0)  # [K,m,P]
    wc = jnp.clip(1.0 - jnp.abs(cols[:, :, None] - idx), 0.0, 1.0)
    hp = jax.lax.Precision.HIGHEST  # tiny matmuls; keep f32 sample fidelity
    t = jnp.einsum("kmp,kpq->kmq", wr, patches, precision=hp)
    return jnp.einsum("kmq,knq->kmn", t, wc, precision=hp)


def _histogram(weights, bins, nbins: int, weight_dtype=jnp.bfloat16):
    """[K,S] weights scattered into [K,nbins] by [K,S] int bins — as a
    one-hot batched matmul (TPU scatter-add serializes per row: measured
    3.1 s for 8x10k keypoint histograms; the one-hot contraction streams
    on the MXU instead).

    The one-hot matrix is bf16 (exact 0/1); the weights default to bf16
    (~0.4% per-sample rounding, accumulation is f32) — an accepted tradeoff
    for the 128-dim descriptor contractions. Argmax-sensitive callers (the
    36-bin orientation peak, where a flipped near-tie rotates the whole
    descriptor) pass weight_dtype=f32."""
    oh = (bins[:, :, None] == jnp.arange(nbins)).astype(weight_dtype)
    return jax.lax.dot_general(
        weights.astype(weight_dtype)[:, None, :], oh,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]


def _orientations(patches, pcx, pcy, sloc, n: int = 16):
    """Dominant gradient orientation per keypoint (36-bin histogram) from
    the upright scale-adapted patch."""
    K = len(patches)
    p = _resample(patches, pcx, pcy, 0.75 * sloc, n)          # [K,n,n]
    gy = jnp.gradient(p, axis=1)
    gx = jnp.gradient(p, axis=2)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)
    bins = jnp.floor((ang + np.pi) / (2 * np.pi) * 36).astype(jnp.int32) % 36
    lin = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0
    wy, wx = jnp.meshgrid(lin, lin, indexing="ij")
    w = jnp.exp(-(wx * wx + wy * wy) / (2 * (n / 3.0) ** 2))
    hist = _histogram((mag * w[None]).reshape(K, -1),
                      bins.reshape(K, -1), 36, weight_dtype=jnp.float32)
    # smooth circularly
    hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    peak = jnp.argmax(hist, axis=-1)
    return (peak.astype(jnp.float32) + 0.5) / 36.0 * 2 * np.pi - np.pi


def _keypoint_frame_grads(patches, pcx, pcy, sloc, angle, m: int):
    """Upright m x m resample at the keypoint scale, gradients rotated into
    the keypoint frame, plus each sample's descriptor-frame coords (u,v).

    Rotating the GRADIENTS (and binning by rotated coordinates) is
    mathematically the rotated-sampling-grid descriptor — R(-theta) of the
    upright gradient is the directional derivative along the rotated axes —
    but keeps the sampling axis-aligned and therefore separable/matmul-able
    (the classic axis-aligned-window SIFT formulation)."""
    p = _resample(patches, pcx, pcy, sloc, m)                 # [K,m,m]
    gy_up = jnp.gradient(p, axis=1)
    gx_up = jnp.gradient(p, axis=2)
    ca = jnp.cos(angle)[:, None, None]
    sa = jnp.sin(angle)[:, None, None]
    gx = ca * gx_up + sa * gy_up                              # keypoint frame
    gy = -sa * gx_up + ca * gy_up
    lin = jnp.arange(m, dtype=jnp.float32) - (m - 1) / 2.0
    py, px = jnp.meshgrid(lin, lin, indexing="ij")            # sample units
    u = ca * px[None] + sa * py[None]                         # [K,m,m]
    v = -sa * px[None] + ca * py[None]
    wg = jnp.exp(-(px * px + py * py) / (2 * (16 / 3.0) ** 2))[None]
    return gx, gy, u, v, wg


def _cell_bins(u, v, n: int = 16):
    """4x4 spatial cell index from descriptor-frame coords; samples outside
    the n x n descriptor square are masked."""
    half = n / 2.0
    inside = (jnp.abs(u) < half) & (jnp.abs(v) < half)
    cx = jnp.clip(jnp.floor((u + half) / (n // 4)), 0, 3).astype(jnp.int32)
    cy = jnp.clip(jnp.floor((v + half) / (n // 4)), 0, 3).astype(jnp.int32)
    return cy * 4 + cx, inside


def _descriptors(patches, pcx, pcy, sloc, angle, valid, m: int = 24):
    """SIFT-like 4x4x8 descriptors -> [K,128], L2-normalized, 0.2-clipped.

    The m x m upright window (m=24 > 16*sqrt(2)) covers the rotated 16 x 16
    descriptor square at every orientation; binning by rotated (u,v) keeps
    exactly the cells of the rotated-grid formulation."""
    K = len(patches)
    gx, gy, u, v, wg = _keypoint_frame_grads(patches, pcx, pcy, sloc, angle, m)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)
    obin = jnp.floor((ang + np.pi) / (2 * np.pi) * 8).astype(jnp.int32) % 8
    cell, inside = _cell_bins(u, v)

    s = m * m
    wt = (mag * wg * inside).reshape(K, s)
    # two one-hot factors: [K,s,16] cells x [K,s,8] orientations -> [K,16,8]
    coh = (cell.reshape(K, s, 1) == jnp.arange(16)).astype(jnp.bfloat16)
    ooh = (obin.reshape(K, s, 1) == jnp.arange(8)).astype(jnp.bfloat16)
    ooh = ooh * wt[:, :, None].astype(jnp.bfloat16)
    desc = jax.lax.dot_general(
        coh, ooh, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).reshape(K, 128)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-8)
    desc = jnp.minimum(desc, 0.2)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-8)
    return desc * valid[:, None]


def _surf_descriptors(patches, pcx, pcy, sloc, angle, valid, m: int = 24):
    """SURF-style descriptors -> [K,128] (64 real dims zero-padded).

    Per 4x4 cell: [sum dx, sum dy, sum |dx|, sum |dy|] of keypoint-frame
    gradients (the Haar-wavelet responses of SURF), Gaussian-weighted,
    L2-normalized. Same upright-window + rotated-binning scheme as
    ``_descriptors``; padding to 128 keeps one descriptor shape across both
    detector families (zero columns add nothing to L2 distances)."""
    K = len(patches)
    dx, dy, u, v, wg = _keypoint_frame_grads(patches, pcx, pcy, sloc, angle, m)
    cell, inside = _cell_bins(u, v)

    s = m * m
    w = (wg * inside).reshape(K, s)
    feats = jnp.stack([dx.reshape(K, s), dy.reshape(K, s),
                       jnp.abs(dx).reshape(K, s), jnp.abs(dy).reshape(K, s)],
                      axis=-1) * w[:, :, None]                # [K,s,4]
    coh = (cell.reshape(K, s, 1) == jnp.arange(16)).astype(jnp.bfloat16)
    desc = jax.lax.dot_general(
        coh, feats.astype(jnp.bfloat16), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).reshape(K, 64)    # [K,16,4]
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-8)
    desc = jnp.pad(desc, ((0, 0), (0, 64)))
    return desc * valid[:, None]
