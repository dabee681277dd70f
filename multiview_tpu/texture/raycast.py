"""Batched ray-mesh intersection.

The BVH role (rayint + mve, used by ``ray_mesh_intersect``
`/root/reference/rig_calibrator/src/texture_processing.cc:1436-1479` and the
occlusion tests inside projectTexture). A BVH is branchy pointer-chasing —
the TPU-native shape is brute-force Möller-Trumbore over [rays x triangles]
tiles: dense, regular, VPU-saturating, and for the mesh sizes the reference
handles (~10^5 faces) a few Gops per thousand rays — microseconds of TPU
time. Double-chunked (sequential over ray blocks AND triangle blocks) so
the live [ray_chunk x tri_chunk] tiles bound HBM no matter how many rays
or faces the caller throws at it. Ray blocks are dispatched as SEPARATE
device executions from the host: a single execution fusing every block
(lax.map) ran for minutes at ~10^6 rays x 10^5 tris and tripped the remote
TPU worker's execution watchdog (observed: worker killed at a ~100 s
execution, fine at ~26 s); one executable is compiled once and reused for
every block, so the host loop costs only dispatch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("chunk",))
def _ray_block_intersect(o, d, tv, min_dist, max_dist, chunk: int):
    """Nearest hit of one ray block [rc,3] against padded tri soup
    [Tpad,3,3] (Tpad % chunk == 0). min_dist: [rc] per-ray lower bound.
    Returns (best_t [rc], best_i [rc] int32)."""
    rc = o.shape[0]
    dtype = o.dtype
    eps = 1e-12
    n_chunks = tv.shape[0] // chunk

    def body(c, carry):
        best_t, best_i = carry
        tri = jax.lax.dynamic_slice_in_dim(tv, c * chunk, chunk)  # [C,3,3]
        v0 = tri[:, 0]
        e1 = tri[:, 1] - v0
        e2 = tri[:, 2] - v0
        # Moller-Trumbore, broadcast [rc,1,3] x [1,C,3]
        pvec = jnp.cross(d[:, None, :], e2[None, :, :])           # [rc,C,3]
        det = jnp.sum(pvec * e1[None], axis=-1)                   # [rc,C]
        inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
        tvec = o[:, None, :] - v0[None]
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1[None, :, :])
        v = jnp.sum(qvec * d[:, None, :], axis=-1) * inv_det
        t = jnp.sum(qvec * e2[None], axis=-1) * inv_det
        ok = ((jnp.abs(det) > eps) & (u >= 0) & (v >= 0) & (u + v <= 1)
              & (t >= min_dist[:, None]) & (t <= max_dist))
        t = jnp.where(ok, t, jnp.inf)
        ci = jnp.argmin(t, axis=-1)
        ct = t[jnp.arange(rc), ci]
        better = ct < best_t
        best_i = jnp.where(better, (c * chunk + ci).astype(jnp.int32),
                           best_i)
        best_t = jnp.minimum(best_t, ct)
        return best_t, best_i

    init = (jnp.full(rc, jnp.inf, dtype), jnp.full(rc, -1, jnp.int32))
    return jax.lax.fori_loop(0, n_chunks, body, init)


def ray_mesh_intersect(origins, dirs, tri_verts, min_dist=0.0,
                       max_dist: float = 100.0, chunk: int = 2048,
                       ray_chunk: int = 16384, tri_chunk: int = 0):
    """Nearest intersection of each ray with a triangle soup.

    origins, dirs: [R,3] (dirs need not be unit). tri_verts: [T,3,3].
    min_dist: scalar or per-ray [R]/[R,1]. Returns (t [R], tri_idx [R]
    int32, hit [R] bool); t in units of |dirs|. Mirrors the semantics of
    the reference's ray_mesh_intersect with its [min_dist, max_dist] search
    window (texture_processing.cc:1436-1479).

    Peak HBM is O(ray_chunk * chunk) regardless of R and T, and peak
    single-execution device time is O(ray_chunk * T) — each ray block is
    its own dispatch of one shared executable (see module docstring).
    Host-level function: do not call under jit (callers are the host-side
    texture/mesh-constraint stages).
    """
    R = origins.shape[0]
    T = tri_verts.shape[0]
    dtype = origins.dtype
    if R == 0:
        return (jnp.zeros(0, dtype), jnp.zeros(0, jnp.int32),
                jnp.zeros(0, bool))

    pad_T = (-T) % chunk
    tv = jnp.concatenate(
        [jnp.asarray(tri_verts),
         jnp.full((pad_T, 3, 3), 1e30, dtype)]) if pad_T else jnp.asarray(tri_verts)

    md = jnp.broadcast_to(jnp.asarray(min_dist, dtype).reshape(-1), (R,)) \
        if np.ndim(min_dist) == 0 else jnp.asarray(min_dist, dtype).reshape(R)
    mx = jnp.asarray(max_dist, dtype)

    # power-of-2 block size below ray_chunk: callers pass data-dependent ray
    # counts (e.g. the compacted occlusion set), and an exact rc = R would
    # compile one executable per distinct count (CLAUDE.md compile hygiene)
    rc = min(ray_chunk, 1 << max(R - 1, 1).bit_length())
    pad_R = (-R) % rc
    o_all = jnp.concatenate([origins, jnp.zeros((pad_R, 3), dtype)]) \
        if pad_R else origins
    d_all = jnp.concatenate([dirs, jnp.ones((pad_R, 3), dtype)]) \
        if pad_R else dirs
    md_all = jnp.concatenate([md, jnp.zeros(pad_R, dtype)]) if pad_R else md
    o_all = o_all.reshape(-1, rc, 3)
    d_all = d_all.reshape(-1, rc, 3)
    md_all = md_all.reshape(-1, rc)

    # triangles are also host-chunked so one execution's work stays bounded
    # (~rc * 2^21 tests ~ 8 s) even on multi-million-triangle soups;
    # tri_chunk > 0 overrides the auto size (tests force small chunks)
    tri_mega = tri_chunk or max(chunk, (1 << 21) // max(rc // 16384, 1))
    tri_mega = max(chunk, tri_mega - tri_mega % chunk)
    n_mega = (tv.shape[0] + tri_mega - 1) // tri_mega

    ts, idxs = [], []
    for b in range(o_all.shape[0]):
        bt = bi = None
        for m in range(n_mega):
            sub = tv[m * tri_mega:(m + 1) * tri_mega]
            st, si = _ray_block_intersect(o_all[b], d_all[b], sub,
                                          md_all[b], mx, chunk)
            si = jnp.where(si >= 0, si + m * tri_mega, si)
            if bt is None:
                bt, bi = st, si
            else:
                better = st < bt
                bi = jnp.where(better, si, bi)
                bt = jnp.minimum(bt, st)
        ts.append(bt)
        idxs.append(bi)
    best_t = jnp.concatenate(ts)[:R] if len(ts) > 1 else ts[0][:R]
    best_i = jnp.concatenate(idxs)[:R] if len(idxs) > 1 else idxs[0][:R]
    hit = jnp.isfinite(best_t)
    return jnp.where(hit, best_t, 0.0), best_i, hit


def mesh_tri_verts(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """[T,3,3] triangle soup from indexed mesh."""
    return np.asarray(vertices)[np.asarray(faces)]
