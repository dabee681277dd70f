"""Iso-surface extraction from a TSDF volume by marching tetrahedra.

The mesh-generation half of the voxblox role (fused_mesh.ply). Marching
tetrahedra instead of marching cubes: each cell splits into 6 tets whose 16
sign cases are trivially enumerable (no 256-entry case table), every cell is
processed independently with static shapes — one vectorized pass over the
volume, compaction on host.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.dense.tsdf import TsdfGrid

# cube corner offsets (x,y,z)
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], np.int32)

# 6-tet decomposition of the cube around the 0-6 diagonal
_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
], np.int32)

# tet edges: pairs of local tet-corner indices
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)

# case -> up to 2 triangles of tet-edge indices (-1 = unused).
# bit k set <=> tet corner k is inside (tsdf < 0).
_T = -np.ones((16, 2, 3), np.int32)
_T[1] = [[0, 1, 2], [-1, -1, -1]]                 # corner 0
_T[14] = [[0, 2, 1], [-1, -1, -1]]
_T[2] = [[0, 3, 4], [-1, -1, -1]]                 # corner 1
_T[13] = [[0, 4, 3], [-1, -1, -1]]
_T[4] = [[1, 5, 3], [-1, -1, -1]]                 # corner 2
_T[11] = [[1, 3, 5], [-1, -1, -1]]
_T[8] = [[2, 4, 5], [-1, -1, -1]]                 # corner 3
_T[7] = [[2, 5, 4], [-1, -1, -1]]
_T[3] = [[1, 3, 4], [1, 4, 2]]                    # corners 0,1
_T[12] = [[1, 4, 3], [1, 2, 4]]
_T[5] = [[0, 3, 5], [0, 5, 2]]                    # corners 0,2
_T[10] = [[0, 5, 3], [0, 2, 5]]
_T[9] = [[0, 4, 5], [0, 5, 1]]                    # corners 0,3
_T[6] = [[0, 5, 4], [0, 1, 5]]
_TRI_TABLE = _T


def extract_mesh(grid: TsdfGrid, min_weight: float = 1e-6
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """TSDF -> triangle mesh.

    Returns (vertices [M,3] world coords, faces [F,3] int32, vertex
    intensity [M]). Cells touching unobserved voxels (weight < min_weight)
    are skipped.
    """
    tsdf = grid.tsdf
    X, Y, Z = tsdf.shape
    dtype = tsdf.dtype
    Xc, Yc, Zc = X - 1, Y - 1, Z - 1

    # LAYOUT NOTE: all device intermediates keep the (large) voxel dims as
    # the two minor-most axes and the small structural dims (tet, triangle,
    # vertex, coordinate) leading. TPU tiling pads only the last two dims
    # to (8,128); a trailing (...,2,3) shape would be padded ~40x and OOM
    # on real volumes (observed: a 467 MB logical array allocated 19.9 GB).

    # corner value gathers: [8, Xc, Yc, Zc]
    def corner_slab(arr):
        slabs = []
        for dx, dy, dz in _CORNERS:
            slabs.append(arr[dx:Xc + dx, dy:Yc + dy, dz:Zc + dz])
        return jnp.stack(slabs, axis=0)

    vals = corner_slab(tsdf)
    wts = corner_slab(grid.weight)
    inten = corner_slab(grid.intensity)
    observed = jnp.all(wts >= min_weight, axis=0)              # [Xc,Yc,Zc]

    # world positions of the 8 corners of each cell: [8, 3, Xc, Yc, Zc]
    ii, jj, kk = jnp.meshgrid(jnp.arange(Xc), jnp.arange(Yc),
                              jnp.arange(Zc), indexing="ij")
    base = jnp.stack([ii, jj, kk], axis=0).astype(dtype)       # [3,.,.,.]
    corners_off = jnp.asarray(_CORNERS, dtype)                 # [8,3]
    pos = ((base[None] + corners_off[:, :, None, None, None] + 0.5)
           * grid.voxel_size + jnp.asarray(grid.origin,
                                           dtype)[None, :, None, None, None])

    # per-tet processing (leading-axis gathers)
    tet_vals = vals[_TETS]                 # [6,4,Xc,Yc,Zc]
    tet_pos = pos[_TETS]                   # [6,4,3,Xc,Yc,Zc]
    tet_int = inten[_TETS]                 # [6,4,Xc,Yc,Zc]

    inside = (tet_vals < 0.0).astype(jnp.int32)
    case = (inside[:, 0] + 2 * inside[:, 1] + 4 * inside[:, 2]
            + 8 * inside[:, 3])            # [6,Xc,Yc,Zc]

    # edge interpolation for all 6 tet edges
    e0 = _TET_EDGES[:, 0]
    e1 = _TET_EDGES[:, 1]
    va = tet_vals[:, e0]                   # [6,6,Xc,Yc,Zc]
    vb = tet_vals[:, e1]
    denom = va - vb
    t = va / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    pa = tet_pos[:, e0]                    # [6,6,3,Xc,Yc,Zc]
    pb = tet_pos[:, e1]
    ev = pa + t[:, :, None] * (pb - pa)    # edge vertices [6,6,3,.,.,.]
    ia = tet_int[:, e0]
    ib = tet_int[:, e1]
    eint = ia + t * (ib - ia)              # [6,6,Xc,Yc,Zc]

    # case -> triangle edge ids: [6,2,3,Xc,Yc,Zc]
    tri_edges = jnp.moveaxis(jnp.asarray(_TRI_TABLE)[case], (-2, -1), (1, 2))
    tri_valid = (tri_edges[:, :, 0] >= 0) & observed[None, None]  # [6,2,.,.,.]

    safe_edges = jnp.maximum(tri_edges, 0).reshape(6, 6, Xc, Yc, Zc)
    # gather triangle vertices along the edge axis: [6,6(2*3),3,Xc,Yc,Zc]
    idx = jnp.broadcast_to(safe_edges[:, :, None], (6, 6, 3, Xc, Yc, Zc))
    tri_verts = jnp.take_along_axis(ev, idx, axis=1)
    tri_int = jnp.take_along_axis(eint, safe_edges, axis=1)

    # compact on host: reorder to [...cells..., 3vert, 3coord]
    tv = np.moveaxis(np.asarray(tri_verts).reshape(6, 2, 3, 3, Xc, Yc, Zc),
                     (2, 3), (5, 6)).reshape(-1, 3, 3)
    ti = np.moveaxis(np.asarray(tri_int).reshape(6, 2, 3, Xc, Yc, Zc),
                     2, 5).reshape(-1, 3)
    mask = np.asarray(tri_valid).reshape(-1)   # (tet,tri,x,y,z) order = tv's
    tv = tv[mask]
    ti = ti[mask]

    if len(tv) == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int32), np.zeros(0)

    # weld duplicate vertices
    flat = tv.reshape(-1, 3)
    flat_i = ti.reshape(-1)
    key = np.round(flat / (grid.voxel_size * 1e-4)).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    verts = np.zeros((len(uniq), 3))
    vint = np.zeros(len(uniq))
    counts = np.zeros(len(uniq))
    np.add.at(verts, inv, flat)
    np.add.at(vint, inv, flat_i)
    np.add.at(counts, inv, 1.0)
    verts /= counts[:, None]
    vint /= counts
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    return verts, faces[good], vint
