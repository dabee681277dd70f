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


# ----------------------------------------------------------------------------
# Occupancy-grid occlusion (large face x view problems)
# ----------------------------------------------------------------------------


def build_occupancy_grid(tri_verts, dim: int = 192, max_span: int = 8):
    """Conservative voxel occupancy of a triangle soup (host-side, numpy).

    Each triangle marks every cell its AABB touches (axis spans clipped to
    ``max_span`` cells — mesh triangles are comparable to the voxel size in
    every producer here, so the clip never binds in practice). Returns
    (occ [X,Y,Z] uint8, origin [3], voxel float).

    Rationale: exact occlusion for texturing is O(rays x triangles) —
    at reference scale (410k faces x 100 views -> ~12M rays against the
    410k-triangle soup) the brute-force Moller-Trumbore pass measured
    2060 s of a 100-view texture run. Occlusion for VIEW SELECTION only
    needs blocked/not-blocked, so a fixed-step march over a conservative
    occupancy grid — regular gathers inside one scanned executable, no
    per-ray triangle products — replaces it at ~1/40 the wall time. The
    depth/mesh-constraint consumers keep the exact intersector (they need
    the hit point, not just visibility).
    """
    tv = np.asarray(tri_verts)
    lo = tv.min(axis=(0, 1))
    hi = tv.max(axis=(0, 1))
    extent = np.maximum(hi - lo, 1e-9)
    voxel = float(extent.max() / dim)
    dims = np.minimum(np.ceil(extent / voxel).astype(int) + 2, dim + 2)
    occ = np.zeros(tuple(dims), np.uint8)
    tlo = np.clip(np.floor((tv.min(axis=1) - lo) / voxel).astype(int),
                  0, dims - 1)
    thi = np.clip(np.floor((tv.max(axis=1) - lo) / voxel).astype(int),
                  0, dims - 1)
    thi = np.minimum(thi, tlo + max_span - 1)
    span = (thi - tlo).max(axis=0)
    for dx in range(int(span[0]) + 1):
        for dy in range(int(span[1]) + 1):
            for dz in range(int(span[2]) + 1):
                sel = ((tlo[:, 0] + dx <= thi[:, 0])
                       & (tlo[:, 1] + dy <= thi[:, 1])
                       & (tlo[:, 2] + dz <= thi[:, 2]))
                occ[tlo[sel, 0] + dx, tlo[sel, 1] + dy, tlo[sel, 2] + dz] = 1
    return occ, lo.astype(np.float32), voxel


@functools.partial(jax.jit, static_argnames=("steps",))
def _march_blocked_chunk(ctr, cam_ctr, occ_flat, occ_dims, origin,
                         inv_voxel, skip, steps: int):
    """Blocked mask [Fc,V] for face centers ctr against camera centers:
    fixed-step sampling of the occupancy grid strictly inside
    (skip, dist - skip) along each face->camera segment."""
    to_cam = cam_ctr[None, :, :] - ctr[:, None, :]        # [Fc,V,3]
    dist = jnp.linalg.norm(to_cam, axis=-1)
    d = to_cam / jnp.maximum(dist[..., None], 1e-30)
    span = dist - 2.0 * skip
    valid = span > 0

    sx, sy, sz = occ_dims

    def body(s, blocked):
        t = skip + span * ((s + 0.5) / steps)
        pos = ctr[:, None, :] + t[..., None] * d
        idx = jnp.floor((pos - origin) * inv_voxel).astype(jnp.int32)
        ix = jnp.clip(idx[..., 0], 0, sx - 1)
        iy = jnp.clip(idx[..., 1], 0, sy - 1)
        iz = jnp.clip(idx[..., 2], 0, sz - 1)
        lin = (ix * sy + iy) * sz + iz
        val = occ_flat[lin.reshape(-1)].reshape(lin.shape)
        return blocked | ((val > 0) & valid)

    return jax.lax.fori_loop(0, steps, body,
                             jnp.zeros(dist.shape, bool))


def occlusion_blocked_grid(face_ctr, face_normal, cam_ctr, tri_verts,
                           dim: int = 192, steps: int = 256,
                           skip_voxels: float = 1.5,
                           face_chunk: int = 4096):
    """[F,V] blocked mask via the occupancy-grid march (see
    build_occupancy_grid). ``skip_voxels`` voxels are excluded at BOTH
    segment ends (the face's own surface cell and the camera's cell)."""
    occ, origin, voxel = build_occupancy_grid(tri_verts, dim=dim)
    occ_flat = jnp.asarray(occ.reshape(-1))
    dims = occ.shape
    skip = skip_voxels * voxel
    F = face_ctr.shape[0]
    # a full-voxel normal offset clears the face's OWN surface-cell layer:
    # grazing rays otherwise run inside it for many samples and read as
    # self-occluded (grid shadow-acne; measured 18% false blocks on a
    # ground plane seen from low-elevation cameras)
    ctr = jnp.asarray(face_ctr) + voxel * jnp.asarray(face_normal)
    cam = jnp.asarray(cam_ctr)
    fc = min(face_chunk, 1 << max(F - 1, 1).bit_length())
    pad = (-F) % fc
    if pad:
        ctr = jnp.concatenate([ctr, jnp.broadcast_to(ctr[:1], (pad, 3))])
    out = []
    for b in range(ctr.shape[0] // fc):
        out.append(_march_blocked_chunk(
            ctr[b * fc:(b + 1) * fc], cam, occ_flat, dims,
            jnp.asarray(origin), jnp.float32(1.0 / voxel),
            jnp.float32(skip), steps))
    blocked = jnp.concatenate(out)[:F] if len(out) > 1 else out[0][:F]
    return blocked
