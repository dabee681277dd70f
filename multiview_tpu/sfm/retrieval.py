"""Global-descriptor image retrieval for match-pair selection.

The role of Theia's global-descriptor preselection
(`/root/reference/rig_calibrator/theia_flags.txt:57-62`:
``num_nearest_neighbors_for_global_descriptor_matching=100``,
``num_gmm_clusters_for_fisher_vector=16``): instead of matching every image
against every other (or only its temporal neighbors, the rig_calibrator's
``num_overlaps`` scheme, `interest_point.cc:498-502`), aggregate each
image's local descriptors into ONE global vector and match each image only
against its K most similar images.

TPU-native design: the codebook is a small k-means (matmul distances +
one-hot segment-sum updates — the same no-scatter pattern as the Schur
solver), aggregation is VLAD (sum of residuals to the assigned centroid,
power + L2 normalized — the Fisher-vector role with 16 clusters), and
similarity is one [N,N] MXU matmul.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_codebook(desc: jnp.ndarray, valid: jnp.ndarray, k: int = 16,
                    iters: int = 10, seed: int = 0) -> jnp.ndarray:
    """k-means over pooled local descriptors. desc [M,D], valid [M] ->
    centroids [k,D]. Empty clusters re-seed to the overall mean."""
    m, d = desc.shape
    key = jax.random.PRNGKey(seed)
    probs = valid.astype(desc.dtype)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    init_rows = jax.random.choice(key, m, shape=(k,), replace=False, p=probs)
    cent = desc[init_rows]
    vf = valid.astype(desc.dtype)[:, None]
    mean_all = jnp.sum(desc * vf, axis=0) / jnp.maximum(jnp.sum(vf), 1.0)

    def step(cent, _):
        # assignment by squared distance (expanded: matmul on the MXU)
        d2 = (jnp.sum(desc * desc, -1, keepdims=True)
              - 2.0 * desc @ cent.T + jnp.sum(cent * cent, -1)[None, :])
        assign = jnp.argmin(d2, axis=-1)
        onehot = (assign[:, None] == jnp.arange(k)[None, :]).astype(desc.dtype)
        onehot = onehot * vf
        sums = onehot.T @ desc                     # [k,D], no scatter
        cnts = jnp.sum(onehot, axis=0)[:, None]
        new = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1.0), mean_all)
        return new, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent


@jax.jit
def vlad_descriptors(desc: jnp.ndarray, valid: jnp.ndarray,
                     centroids: jnp.ndarray) -> jnp.ndarray:
    """VLAD aggregation per image. desc [N,K,D], valid [N,K],
    centroids [C,D] -> [N, C*D] power- and L2-normalized."""
    n, k_, d = desc.shape
    c = centroids.shape[0]
    d2 = (jnp.sum(desc * desc, -1)[..., None]
          - 2.0 * jnp.einsum("nkd,cd->nkc", desc, centroids)
          + jnp.sum(centroids * centroids, -1)[None, None, :])
    assign = jnp.argmin(d2, axis=-1)                        # [N,K]
    onehot = (assign[..., None] == jnp.arange(c)[None, None, :])
    onehot = onehot.astype(desc.dtype) * valid[..., None].astype(desc.dtype)
    resid = desc[:, :, None, :] - centroids[None, None, :, :]   # [N,K,C,D]
    v = jnp.sum(resid * onehot[..., None], axis=1)              # [N,C,D]
    v = v.reshape(n, c * d)
    # signed square-root (power) normalization then L2
    v = jnp.sign(v) * jnp.sqrt(jnp.abs(v))
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def select_pairs(descs: Sequence, valids: Sequence, num_neighbors: int,
                 num_clusters: int = 16, max_train: int = 20000,
                 seed: int = 0) -> List[Tuple[int, int]]:
    """Retrieval-based pair selection: each image proposes its
    ``num_neighbors`` most similar images (by VLAD cosine similarity) as
    match candidates. Returns sorted unique (i, j) pairs with i < j.

    descs: per-image [K,D] local descriptors; valids: per-image [K] masks —
    any indexable sequences (lists or a disk-backed FeatureStore view:
    images are visited in chunks, so out-of-core collections stream).
    """
    n = len(descs)
    # pass 1: subsample training descriptors per image (streams the store)
    per = max(8, max_train // max(n, 1))
    train, tval = [], []
    for i in range(n):
        d = np.asarray(descs[i])
        v = np.asarray(valids[i])
        rows = np.where(v)[0]
        if len(rows) > per:  # strided, not top-N: unbiased codebook sample
            rows = rows[:: max(1, len(rows) // per)][:per]
        train.append(d[rows])
        tval.append(np.ones(len(rows), bool))
    cent = kmeans_codebook(jnp.asarray(np.concatenate(train)),
                           jnp.asarray(np.concatenate(tval)),
                           k=num_clusters, seed=seed)
    # pass 2: VLAD per chunk of images -> small [N, C*D] global matrix
    gs = []
    chunk = min(64, n)
    for c0 in range(0, n, chunk):
        sel = list(range(c0, min(c0 + chunk, n)))
        # pad the last chunk by repeating its first image: one compiled
        # vlad_descriptors executable per chunk size (compile hygiene)
        padded = sel + [sel[0]] * (chunk - len(sel))
        dchunk = jnp.stack([jnp.asarray(descs[i]) for i in padded])
        vchunk = jnp.stack([jnp.asarray(valids[i]) for i in padded])
        gs.append(np.asarray(vlad_descriptors(dchunk, vchunk,
                                              cent))[:len(sel)])
    g = jnp.asarray(np.concatenate(gs))
    sim = np.array(g @ g.T)                                 # one MXU matmul
    np.fill_diagonal(sim, -np.inf)
    kq = min(num_neighbors, n - 1)
    nn = np.argpartition(-sim, kq - 1, axis=1)[:, :kq]
    pairs = set()
    for i in range(n):
        for j in nn[i]:
            pairs.add((min(i, int(j)), max(i, int(j))))
    return sorted(pairs)
