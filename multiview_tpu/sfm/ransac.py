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


def decompose_essential(E, x1, x2, inliers):
    """Recover (R, t) from E by cheirality voting over the 4 candidates.

    Returns world2-from-world1 rotation R [3,3] and unit translation t [3]
    with x2 ~ R x1 + t convention (cam1 frame to cam2 frame).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    d1 = jnp.linalg.det(U @ Vt)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)

    def fix(R):
        return R * jnp.sign(jnp.linalg.det(R))

    R1 = fix(U @ W @ Vt)
    R2 = fix(U @ W.T @ Vt)
    t = U[:, 2]

    def count_cheiral(R, t):
        # triangulate by midpoint depth test: depth in cam1 and cam2 positive
        one = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
        f1 = jnp.concatenate([x1, one], axis=-1)
        f2 = jnp.concatenate([x2, one], axis=-1)
        # solve for depths: z2 * x2 = R (z1 * x1) + t  (2 unknowns, 3 eqs)
        Rf1 = f1 @ R.T
        # [z1, z2]: minimize |z1*Rf1 - z2*f2 + t|^2
        # LS depths for z1*Rf1 + t ~ z2*f2:
        # [a b; b c][z1; z2] = [d; e] with the values below
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

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    counts = jnp.stack([count_cheiral(R, tt) for R, tt in cands])
    best = jnp.argmax(counts)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best]
