"""Batched RANSAC model estimation: all hypotheses evaluated in parallel.

Replaces the reference's sequential cv::estimateAffine2D RANSAC
(`/root/reference/rig_calibrator/src/interest_point.cc:133-143`: threshold
20 px, 10000 iters, confidence 0.8) with a vectorized design: a fixed batch
of K minimal-sample hypotheses is solved and scored in one shot (vmapped
small solves + one [K,N] scoring pass), then the best model is refit on its
inliers. Statically shaped, jit-compiled, no data-dependent loop — the
TPU-native shape of RANSAC.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: jnp.ndarray     # [2,3] affine  (or [3,3] for other models)
    inliers: jnp.ndarray   # [N] bool
    num_inliers: jnp.ndarray


def _fit_affine2d(src, dst, w=None):
    """LS affine fit dst ~ A src + t. src/dst [K,2] -> [2,3]."""
    n = src.shape[0]
    if w is None:
        w = jnp.ones(n, src.dtype)
    A = jnp.concatenate([src, jnp.ones((n, 1), src.dtype)], axis=-1)  # [K,3]
    Aw = A * w[:, None]
    # normal equations, 3x3
    H = A.T @ Aw
    H = H + 1e-12 * jnp.eye(3, dtype=src.dtype)
    bx = Aw.T @ dst[:, 0]
    by = Aw.T @ dst[:, 1]
    sol_x = jnp.linalg.solve(H, bx)
    sol_y = jnp.linalg.solve(H, by)
    return jnp.stack([sol_x, sol_y])


def _apply_affine2d(model, pts):
    return pts @ model[:, :2].T + model[:, 2]


def ransac_affine2d(src, dst, valid=None, threshold: float = 20.0,
                    num_hypotheses: int = 512, refit_rounds: int = 2,
                    key: Optional[jax.Array] = None) -> RansacResult:
    """Batched-hypothesis RANSAC for a 2D affine map.

    src, dst: [N,2]; valid: [N] rows to use (padded rows False).
    threshold: inlier reprojection threshold in pixels (reference: 20).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    n = src.shape[0]
    if n < 3:
        return RansacResult(jnp.eye(2, 3), jnp.zeros(n, bool), jnp.asarray(0))
    if valid is None:
        valid = jnp.ones(n, bool)
    vf = valid.astype(src.dtype)

    # sample minimal sets (3 correspondences) among valid rows
    probs = vf / jnp.maximum(jnp.sum(vf), 1.0)
    samples = jax.random.choice(key, n, shape=(num_hypotheses, 3), replace=True,
                                p=probs)

    def one_hypothesis(rows):
        m = _fit_affine2d(src[rows], dst[rows])
        err = jnp.linalg.norm(_apply_affine2d(m, src) - dst, axis=-1)
        inl = (err <= threshold) & valid
        return m, jnp.sum(inl)

    models, scores = jax.vmap(one_hypothesis)(samples)
    best = jnp.argmax(scores)
    model = models[best]

    # iterative refit on inliers (weighted LS with inlier mask)
    def refit(_, model):
        err = jnp.linalg.norm(_apply_affine2d(model, src) - dst, axis=-1)
        inl = (err <= threshold) & valid
        return _fit_affine2d(src, dst, w=inl.astype(src.dtype))

    model = jax.lax.fori_loop(0, refit_rounds, refit, model)
    err = jnp.linalg.norm(_apply_affine2d(model, src) - dst, axis=-1)
    inliers = (err <= threshold) & valid
    return RansacResult(model, inliers, jnp.sum(inliers))


# ----------------------------------------------------------------------------
# Essential matrix (for relative pose in the global SfM initializer)
# ----------------------------------------------------------------------------


def _fit_essential_8pt(x1, x2):
    """Normalized 8-point algorithm on unit-plane coordinates x1,x2 [K,2].
    Returns E [3,3] (not rank-projected; caller projects)."""
    k = x1.shape[0]
    one = jnp.ones((k, 1), x1.dtype)
    X1 = jnp.concatenate([x1, one], axis=-1)
    X2 = jnp.concatenate([x2, one], axis=-1)
    # rows: kron(x2, x1) for x2^T E x1 = 0
    A = jnp.einsum("ki,kj->kij", X2, X1).reshape(k, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[-1].reshape(3, 3)
    # project to essential manifold: singular values (s,s,0)
    U, S, Vt2 = jnp.linalg.svd(E)
    s = (S[0] + S[1]) / 2.0
    return U @ jnp.diag(jnp.stack([s, s, jnp.zeros_like(s)])) @ Vt2


def _sampson_err(E, x1, x2):
    one = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
    X1 = jnp.concatenate([x1, one], axis=-1)
    X2 = jnp.concatenate([x2, one], axis=-1)
    Ex1 = X1 @ E.T
    Etx2 = X2 @ E
    num = jnp.sum(X2 * Ex1, axis=-1) ** 2
    den = Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-30)


def ransac_essential(x1, x2, valid=None, threshold: float = 1e-3,
                     num_hypotheses: int = 512,
                     key: Optional[jax.Array] = None) -> RansacResult:
    """Batched RANSAC essential matrix from unit-plane correspondences.

    threshold is on the Sampson error in normalized coordinates.
    """
    if key is None:
        key = jax.random.PRNGKey(1)
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    n = x1.shape[0]
    if n < 8:
        return RansacResult(jnp.eye(3), jnp.zeros(n, bool), jnp.asarray(0))
    if valid is None:
        valid = jnp.ones(n, bool)
    probs = valid.astype(x1.dtype) / jnp.maximum(jnp.sum(valid), 1.0)
    samples = jax.random.choice(key, n, shape=(num_hypotheses, 8), replace=True,
                                p=probs)

    def one(rows):
        E = _fit_essential_8pt(x1[rows], x2[rows])
        err = _sampson_err(E, x1, x2)
        inl = (err <= threshold) & valid
        return E, jnp.sum(inl)

    models, scores = jax.vmap(one)(samples)
    best = jnp.argmax(scores)
    E = models[best]
    err = _sampson_err(E, x1, x2)
    inliers = (err <= threshold) & valid

    # refit on the full inlier set (weighted 8-point): a minimal-sample model
    # is noise-amplified; the LS refit recovers the sqrt(N/8) accuracy factor
    def refit(_, E):
        err = _sampson_err(E, x1, x2)
        w = ((err <= threshold) & valid).astype(x1.dtype)
        one_col = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
        X1 = jnp.concatenate([x1, one_col], axis=-1)
        X2 = jnp.concatenate([x2, one_col], axis=-1)
        A = jnp.einsum("ki,kj->kij", X2, X1).reshape(x1.shape[0], 9)
        Aw = A * w[:, None]
        _, _, Vt = jnp.linalg.svd(Aw, full_matrices=False)
        E2 = Vt[-1].reshape(3, 3)
        U, S, Vt2 = jnp.linalg.svd(E2)
        s = (S[0] + S[1]) / 2.0
        return U @ jnp.diag(jnp.stack([s, s, jnp.zeros_like(s)])) @ Vt2

    E = jax.lax.fori_loop(0, 2, refit, E)
    err = _sampson_err(E, x1, x2)
    inliers = (err <= threshold) & valid
    return RansacResult(E, inliers, jnp.sum(inliers))


def _cheirality_count(R, t, x1, x2, inliers):
    """Number of inlier correspondences with positive LS depths under
    (R, t): z2 * x2 = R (z1 * x1) + t."""
    one = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
    f1 = jnp.concatenate([x1, one], axis=-1)
    f2 = jnp.concatenate([x2, one], axis=-1)
    Rf1 = f1 @ R.T
    # [z1, z2]: minimize |z1*Rf1 - z2*f2 + t|^2
    a = jnp.sum(Rf1 * Rf1, axis=-1)
    b = -jnp.sum(Rf1 * f2, axis=-1)
    c = jnp.sum(f2 * f2, axis=-1)
    d = -jnp.sum(Rf1 * t, axis=-1)
    e = jnp.sum(f2 * t, axis=-1)
    det = a * c - b * b
    z1 = (c * d - b * e) / jnp.maximum(det, 1e-30)
    z2 = (a * e - b * d) / jnp.maximum(det, 1e-30)
    ok = (z1 > 0) & (z2 > 0) & inliers
    return jnp.sum(ok)


def decompose_essential(E, x1, x2, inliers):
    """Recover (R, t) from E by cheirality voting over the 4 candidates.

    Returns world2-from-world1 rotation R [3,3] and unit translation t [3]
    with x2 ~ R x1 + t convention (cam1 frame to cam2 frame).
    """
    U, _, Vt = jnp.linalg.svd(E)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)

    def fix(R):
        return R * jnp.sign(jnp.linalg.det(R))

    R1 = fix(U @ W @ Vt)
    R2 = fix(U @ W.T @ Vt)
    t = U[:, 2]

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    counts = jnp.stack([_cheirality_count(R, tt, x1, x2, inliers)
                        for R, tt in cands])
    best = jnp.argmax(counts)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best]


# ----------------------------------------------------------------------------
# Homography: planar two-view geometry
# (near-planar scenes — nadir surveys, walls — make the essential matrix
#  degenerate: the linear 8-point problem admits a solution family and the
#  recovered rotation can be 10+ degrees off while fitting every
#  correspondence. Estimating H and decomposing it is the stable path;
#  TheiaSfM likewise carries a homography model for planar scenes.)
# ----------------------------------------------------------------------------


def _fit_homography_dlt(x1, x2, w=None):
    """DLT homography on unit-plane coordinates: x2 ~ H x1. Returns H [3,3]."""
    k = x1.shape[0]
    one = jnp.ones((k, 1), x1.dtype)
    X1 = jnp.concatenate([x1, one], axis=-1)
    u, v = x2[..., 0], x2[..., 1]
    zeros = jnp.zeros_like(X1)
    r1 = jnp.concatenate([zeros, -X1, v[:, None] * X1], axis=-1)
    r2 = jnp.concatenate([X1, zeros, -u[:, None] * X1], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)
    if w is not None:
        A = A * jnp.concatenate([w, w])[:, None]
    # full_matrices=False: A is [2N,9] in the inlier refit (N padded
    # correspondences), so a full U would be a [2N,2N] intermediate —
    # gigabytes at reference-scale match counts. BUT the minimal 4-point
    # fit gives [8,9], where economy Vt has only 8 rows and loses the
    # null vector; zero-padding A to 9 rows leaves A^T A (hence V)
    # unchanged while keeping Vt square.
    if A.shape[0] < 9:
        A = jnp.concatenate(
            [A, jnp.zeros((9 - A.shape[0], 9), A.dtype)], axis=0)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    return Vt[-1].reshape(3, 3)


def _transfer_err(H, x1, x2):
    """Squared forward transfer error |H x1 - x2|^2 on the unit plane."""
    one = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
    X1 = jnp.concatenate([x1, one], axis=-1)
    Hx = X1 @ H.T
    z = Hx[..., 2:3]
    z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    p = Hx[..., :2] / z
    return jnp.sum((p - x2) ** 2, axis=-1)


def ransac_homography(x1, x2, valid=None, threshold: float = 1e-3,
                      num_hypotheses: int = 512,
                      key: Optional[jax.Array] = None) -> RansacResult:
    """Batched RANSAC homography from unit-plane correspondences.

    ``threshold`` gates the squared transfer error — the same units as
    ransac_essential's Sampson gate, so inlier counts of the two models are
    directly comparable for model selection."""
    if key is None:
        key = jax.random.PRNGKey(5)
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    n = x1.shape[0]
    if n < 4:
        return RansacResult(jnp.eye(3), jnp.zeros(n, bool), jnp.asarray(0))
    if valid is None:
        valid = jnp.ones(n, bool)
    probs = valid.astype(x1.dtype) / jnp.maximum(jnp.sum(valid), 1.0)
    samples = jax.random.choice(key, n, shape=(num_hypotheses, 4),
                                replace=True, p=probs)

    def one(rows):
        H = _fit_homography_dlt(x1[rows], x2[rows])
        err = _transfer_err(H, x1, x2)
        inl = (err <= threshold) & valid
        return H, jnp.sum(inl)

    models, scores = jax.vmap(one)(samples)
    best = jnp.argmax(scores)
    H = models[best]

    def refit(_, H):
        err = _transfer_err(H, x1, x2)
        w = ((err <= threshold) & valid).astype(x1.dtype)
        return _fit_homography_dlt(x1, x2, w=w)

    H = jax.lax.fori_loop(0, 2, refit, H)
    err = _transfer_err(H, x1, x2)
    inliers = (err <= threshold) & valid
    return RansacResult(H, inliers, jnp.sum(inliers))


def decompose_homography(H, x1, x2, inliers):
    """Recover (R, t, n) from a calibrated homography H ~ R + t n^T / d
    (Faugeras-Lustman SVD method), disambiguated by cheirality voting over
    the 8 candidates. Returns (R [3,3], unit t [3], plane normal n [3]) in
    the x2 ~ R x1 + t convention."""
    U, S, Vt = jnp.linalg.svd(H)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = S[0], S[1], S[2]

    eps = 1e-12
    denom = jnp.maximum(d1 * d1 - d3 * d3, eps)
    aux1 = jnp.sqrt(jnp.maximum(d1 * d1 - d2 * d2, 0.0) / denom)
    aux3 = jnp.sqrt(jnp.maximum(d2 * d2 - d3 * d3, 0.0) / denom)

    cands_R, cands_t, cands_n = [], [], []

    # d' > 0: rotation about the plane-intersection axis by theta
    stheta_a = (jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2)
                                     * (d2 * d2 - d3 * d3), 0.0))
                / jnp.maximum((d1 + d3) * d2, eps))
    ctheta = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    for e1, e3 in ((1.0, 1.0), (1.0, -1.0), (-1.0, 1.0), (-1.0, -1.0)):
        st = e1 * e3 * stheta_a
        Rp = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                         H.dtype)
        Rp = Rp.at[0, 0].set(ctheta).at[0, 2].set(-st)
        Rp = Rp.at[2, 0].set(st).at[2, 2].set(ctheta)
        tp = (d1 - d3) * jnp.stack([e1 * aux1, jnp.zeros_like(d1),
                                    -e3 * aux3])
        npl = jnp.stack([e1 * aux1, jnp.zeros_like(d1), e3 * aux3])
        cands_R.append(s * (U @ Rp @ Vt))
        cands_t.append(U @ tp)
        cands_n.append(V @ npl)

    # d' < 0: the camera crosses the plane (rarely physical, kept for
    # completeness of the 8-candidate vote)
    sphi_a = (jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2)
                                   * (d2 * d2 - d3 * d3), 0.0))
              / jnp.maximum(jnp.abs(d1 - d3) * d2, eps))
    cphi = (d1 * d3 - d2 * d2) / jnp.maximum(jnp.abs(d1 - d3) * d2, eps)
    for e1, e3 in ((1.0, 1.0), (1.0, -1.0), (-1.0, 1.0), (-1.0, -1.0)):
        sp = e1 * e3 * sphi_a
        Rp = jnp.asarray([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0],
                          [0.0, 0.0, -1.0]], H.dtype)
        Rp = Rp.at[0, 0].set(cphi).at[0, 2].set(sp)
        Rp = Rp.at[2, 0].set(sp).at[2, 2].set(-cphi)
        tp = (d1 + d3) * jnp.stack([e1 * aux1, jnp.zeros_like(d1),
                                    e3 * aux3])
        npl = jnp.stack([e1 * aux1, jnp.zeros_like(d1), e3 * aux3])
        cands_R.append(s * (U @ Rp @ Vt))
        cands_t.append(U @ tp)
        cands_n.append(V @ npl)

    Rs = jnp.stack(cands_R)
    ts = jnp.stack(cands_t)
    ns = jnp.stack(cands_n)
    tnorm = jnp.linalg.norm(ts, axis=-1, keepdims=True)
    ts = ts / jnp.maximum(tnorm, 1e-12)
    counts = jnp.stack([_cheirality_count(Rs[i], ts[i], x1, x2, inliers)
                        for i in range(8)])
    best = jnp.argmax(counts)
    return Rs[best], ts[best], ns[best]


# ----------------------------------------------------------------------------
# Absolute pose (PnP) — the incremental-SfM view-registration solver
# (the role of Theia's RANSAC absolute-pose estimation behind
#  --absolute_pose_reprojection_error_threshold / --min_num_absolute_pose_inliers,
#  /root/reference/rig_calibrator/theia_flags.txt:109-114)
# ----------------------------------------------------------------------------


class PnpResult(NamedTuple):
    pose: jnp.ndarray      # [7] world->cam [tx,ty,tz,qx,qy,qz,qw]
    inliers: jnp.ndarray   # [N] bool
    num_inliers: jnp.ndarray


def _fit_pnp_dlt(X, x, w=None):
    """Weighted DLT absolute pose from world points X [K,3] and unit-plane
    observations x [K,2]: nullspace of the 2K x 12 system for P=[R|t], then
    projection of the left 3x3 onto SO(3) (scale absorbed into t)."""
    k = X.shape[0]
    dtype = X.dtype
    if w is None:
        w = jnp.ones(k, dtype)
    Xh = jnp.concatenate([X, jnp.ones((k, 1), dtype)], axis=-1)   # [K,4]
    z = jnp.zeros((k, 4), dtype)
    r1 = jnp.concatenate([Xh, z, -x[:, 0:1] * Xh], axis=-1)       # [K,12]
    r2 = jnp.concatenate([z, Xh, -x[:, 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]])       # [2K,12]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    P = Vt[-1].reshape(3, 4)
    # the nullspace vector's sign is arbitrary: fix it FIRST by cheirality
    # (majority of the weighted points must land at positive depth) so that
    # P ~ +s[R|t]; only then is the SO(3) projection well-posed (the left
    # 3x3 of -s[R|t] has three EQUAL singular values, so projecting it
    # without the sign fix lands on an arbitrary rotation).
    z = Xh @ P[2]
    sgn = jnp.sign(jnp.sum(jnp.sign(z) * w))
    P = P * jnp.where(sgn == 0, 1.0, sgn)
    U, S, Vt2 = jnp.linalg.svd(P[:, :3])
    d = jnp.linalg.det(U @ Vt2)  # +1 for any sane sample; guard anyway
    R = U @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], dtype)
                     + jnp.asarray([0.0, 0.0, 1.0], dtype) * d) @ Vt2
    scale = jnp.mean(S)
    t = P[:, 3] / jnp.where(scale > 1e-30, scale, 1e-30)
    return R, t


def _fit_pnp_planar(X, x, w=None):
    """Homography-based absolute pose for (near-)coplanar world points —
    the configuration where the 6-point DLT is rank-deficient. Fits the
    points' plane frame, estimates the plane->image homography
    H ~ [R e1, R e2, R O + t], and recovers (R, t) Zhang-style."""
    k = X.shape[0]
    dtype = X.dtype
    if w is None:
        w = jnp.ones(k, dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-30)
    O = jnp.sum(X * w[:, None], axis=0) / wsum
    Xc = X - O
    _, _, VtP = jnp.linalg.svd(Xc * w[:, None], full_matrices=False)
    e1, e2 = VtP[0], VtP[1]
    e3 = jnp.cross(e1, e2)                 # right-handed plane frame
    uv = jnp.stack([Xc @ e1, Xc @ e2], axis=-1)
    uvh = jnp.concatenate([uv, jnp.ones((k, 1), dtype)], axis=-1)
    z3 = jnp.zeros((k, 3), dtype)
    r1 = jnp.concatenate([uvh, z3, -x[:, 0:1] * uvh], axis=-1)
    r2 = jnp.concatenate([z3, uvh, -x[:, 1:2] * uvh], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]])
    _, _, Vt9 = jnp.linalg.svd(A, full_matrices=False)
    H = Vt9[-1].reshape(3, 3)
    # cheirality: centroid (plane coords (0,0)) must land at positive depth
    s = jnp.sign(H[2, 2])
    H = H * jnp.where(s == 0, 1.0, s)
    lam = 2.0 / jnp.maximum(jnp.linalg.norm(H[:, 0])
                            + jnp.linalg.norm(H[:, 1]), 1e-30)
    c1 = H[:, 0] * lam
    c2 = H[:, 1] * lam
    RE = jnp.stack([c1, c2, jnp.cross(c1, c2)], axis=1)   # ~ R @ E
    U, _, Vt3 = jnp.linalg.svd(RE)
    d = jnp.linalg.det(U @ Vt3)
    RE = U @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], dtype)
                      + jnp.asarray([0.0, 0.0, 1.0], dtype) * d) @ Vt3
    E = jnp.stack([e1, e2, e3], axis=1)                   # columns
    R = RE @ E.T
    t = lam * H[:, 2] - R @ O
    return R, t


def _pnp_err(R, t, X, x):
    Xc = X @ R.T + t
    zc = jnp.where(jnp.abs(Xc[:, 2]) > 1e-30, Xc[:, 2], 1e-30)
    proj = Xc[:, :2] / zc[:, None]
    return jnp.linalg.norm(proj - x, axis=-1), Xc[:, 2]


def ransac_pnp(X, x, valid=None, threshold: float = 4e-3,
               num_hypotheses: int = 512, refit_rounds: int = 2,
               key: Optional[jax.Array] = None) -> PnpResult:
    """Batched-hypothesis RANSAC absolute pose (world->cam) from 2D-3D
    correspondences.

    X: [N,3] world points; x: [N,2] unit-plane (undistorted, focal-
    normalized) observations; threshold: reprojection error on the unit
    plane (the reference recipe's 4 px at 1024-wide images ~ 4e-3 at
    f~1000, theia_flags.txt:112). Minimal solver: 6-point DLT + SO(3)
    projection; scoring enforces positive depth.
    """
    from multiview_tpu.geometry import pose as pose_mod
    if key is None:
        key = jax.random.PRNGKey(2)
    X = jnp.asarray(X)
    x = jnp.asarray(x)
    n = X.shape[0]
    if n < 6:
        return PnpResult(pose_mod.pose_identity(X.dtype),
                         jnp.zeros(n, bool), jnp.asarray(0))
    if valid is None:
        valid = jnp.ones(n, bool)
    probs = valid.astype(X.dtype) / jnp.maximum(jnp.sum(valid), 1.0)
    samples = jax.random.choice(key, n, shape=(num_hypotheses, 6),
                                replace=True, p=probs)

    def score_of(R, t):
        err, depth = _pnp_err(R, t, X, x)
        return jnp.sum((err <= threshold) & (depth > 0) & valid)

    def dual_fit(Xs, xs, w=None):
        """Run both minimal solvers and keep whichever scores higher: the
        6-point DLT handles general scenes, the homography pose handles the
        coplanar configuration where the DLT is rank-deficient."""
        Ra, ta = _fit_pnp_dlt(Xs, xs, w=w)
        Rb, tb = _fit_pnp_planar(Xs, xs, w=w)
        na, nb = score_of(Ra, ta), score_of(Rb, tb)
        pick = nb > na
        return (jnp.where(pick, Rb, Ra), jnp.where(pick, tb, ta),
                jnp.maximum(na, nb))

    def one(rows):
        return dual_fit(X[rows], x[rows])

    Rs, ts, scores = jax.vmap(one)(samples)
    best = jnp.argmax(scores)
    R, t = Rs[best], ts[best]

    def refit(_, Rt):
        R, t = Rt
        err, depth = _pnp_err(R, t, X, x)
        w = ((err <= threshold) & (depth > 0) & valid).astype(X.dtype)
        R2, t2, _ = dual_fit(X, x, w=w)
        # keep the refit only if it does not lose inliers
        keep = score_of(R2, t2) >= score_of(R, t)
        return jnp.where(keep, R2, R), jnp.where(keep, t2, t)

    R, t = jax.lax.fori_loop(0, refit_rounds, refit, (R, t))
    err, depth = _pnp_err(R, t, X, x)
    inliers = (err <= threshold) & (depth > 0) & valid
    pose = pose_mod.make_pose(t, pose_mod.matrix_to_quat(R))
    return PnpResult(pose, inliers, jnp.sum(inliers))
