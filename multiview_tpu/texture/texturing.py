"""Texture projection: view selection, atlas charts, sampling, seam leveling,
OBJ/MTL output.

Re-design of the ISAAC texturing variant
(`/root/reference/rig_calibrator/src/texture_processing.cc`): the
geometry-determined texture buffer (``formModel``, :687-882) samples each
face on a fixed-pixel-size grid in its own plane; ``projectTexture``
(:991-1433) picks the best view per face by a view-angle + distance cost
with an occlusion ray test; charts are packed into an atlas
(IsaacTextureAtlas, :72-206); texrecon's global seam leveling is a per-face
gain adjustment solved as a sparse LS on the face-adjacency graph.

TPU mapping: costs/occlusion/sampling are single batched kernels over all
faces x views and all texels; only shelf packing and OBJ emission stay on
host.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.geometry.camera import CameraParams, UNDISTORTED_C, DISTORTED
from multiview_tpu.texture import raycast


# ----------------------------------------------------------------------------
# View selection
# ----------------------------------------------------------------------------


def face_geometry(vertices, faces):
    """Centers [F,3], unit normals [F,3], areas [F]."""
    tri = vertices[faces]                       # [F,3,3]
    ctr = jnp.mean(tri, axis=1)
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * jnp.linalg.norm(n, axis=-1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
    return ctr, n, area


def view_costs(vertices, faces, world_to_cam_poses, occlusion: bool = True,
               max_dist: float = 100.0, max_angle_deg: float = 90.0,
               occlusion_method: str = "auto"):
    """Per-(face, view) cost = view-angle + distance, with facing /
    in-front / angle-gate / occlusion usability tests (projectTexture cost,
    texture_processing.cc:1044-1087; the UV variant additionally gates the
    face-normal-to-camera angle at 75 deg, :1055-1058).

    occlusion_method: "exact" (per-ray Moller-Trumbore against the full
    soup — O(rays x triangles)), "grid" (conservative occupancy-grid
    march, see raycast.build_occupancy_grid), or "auto" (grid above 4M
    face-view pairs, where the exact pass measured 2060 s of a 100-view
    410k-face texture run vs ~1 min for the march).

    Returns (cost [F,V] float with +inf at unusable entries, usable [F,V]).
    """
    ctr, normal, _ = face_geometry(vertices, faces)
    c2w = pose_mod.pose_inverse(world_to_cam_poses)     # [V,7]
    cam_ctr = pose_mod.pose_t(c2w)                      # [V,3]

    to_cam = cam_ctr[None, :, :] - ctr[:, None, :]      # [F,V,3]
    dist = jnp.linalg.norm(to_cam, axis=-1)
    dir_to_cam = to_cam / jnp.maximum(dist[..., None], 1e-30)

    cosang = jnp.sum(dir_to_cam * normal[:, None, :], axis=-1)
    # reference cost: angle + distance; smaller better, require facing
    ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    cost = ang + dist
    facing = cosang > 0.0
    angle_ok = ang <= jnp.deg2rad(max_angle_deg)

    # front-of-camera test: face center must project with positive depth
    Xc = pose_mod.pose_apply(world_to_cam_poses[None, :, :], ctr[:, None, :])
    in_front = Xc[..., 2] > 1e-6

    usable = facing & angle_ok & in_front & (dist < max_dist)

    if occlusion and occlusion_method not in ("exact", "grid", "auto"):
        raise ValueError(f"unknown occlusion_method {occlusion_method!r}")
    if occlusion:
        F, V = dist.shape
        if occlusion_method == "auto":
            occlusion_method = "grid" if F * V > 4_000_000 else "exact"
    if occlusion and occlusion_method == "grid":
        blocked = raycast.occlusion_blocked_grid(
            ctr, normal, cam_ctr, vertices[faces])
        usable = usable & ~blocked
    elif occlusion:
        # ray from just-off-surface face center toward each camera; if the
        # mesh is hit before the camera, the view is occluded. Only entries
        # that already pass the geometric gates are cast (host compaction;
        # typically halves the ray count — the raycast dominates this stage)
        F, V = dist.shape
        tri_soup = vertices[faces]
        # host-side gather: device gathers of a dynamic-length index set
        # would compile one executable per distinct count
        org_np = np.broadcast_to(
            np.asarray(ctr[:, None, :] + 1e-4 * normal[:, None, :]),
            (F, V, 3)).reshape(-1, 3)
        dir_np = np.asarray(dir_to_cam).reshape(-1, 3)
        dist_np = np.asarray(dist).reshape(-1)
        sel = np.nonzero(np.asarray(usable).reshape(-1))[0]
        blocked = np.zeros(F * V, bool)
        if len(sel):
            t, _, hit = raycast.ray_mesh_intersect(
                jnp.asarray(org_np[sel]), jnp.asarray(dir_np[sel]), tri_soup,
                min_dist=1e-3, max_dist=max_dist)
            blocked[sel] = np.asarray(hit) & (np.asarray(t) < dist_np[sel] - 1e-3)
        usable = usable & ~jnp.asarray(blocked.reshape(F, V))

    cost = jnp.where(usable, cost, jnp.inf)
    return cost, usable


def view_selection(vertices, faces, world_to_cam_poses, occlusion: bool = True,
                   max_dist: float = 100.0, max_angle_deg: float = 90.0):
    """Best view per face by cost = view-angle + distance with occlusion test
    (projectTexture cost, texture_processing.cc:1044-1087).

    Returns (best_view [F] int32, visible [F] bool).
    """
    cost, _ = view_costs(vertices, faces, world_to_cam_poses,
                         occlusion=occlusion, max_dist=max_dist,
                         max_angle_deg=max_angle_deg)
    best = jnp.argmin(cost, axis=-1).astype(jnp.int32)
    visible = jnp.isfinite(jnp.min(cost, axis=-1))
    return best, visible


def sample_face_view_colors(vertices, faces, images: Sequence,
                            cams: Sequence[CameraParams], world_to_cam_poses,
                            usable, grayscale: bool = False) -> jnp.ndarray:
    """Color of each face as seen in each view: face centers projected
    through the full distortion model and bilinearly sampled -> [F,V,C]
    per-channel colors ([F,V] for grayscale inputs or ``grayscale=True``) —
    the per-face-per-view colors texrecon's photometric outlier removal
    operates on. Unusable entries are 0.

    Per-channel output matters for rejection: a chroma-only cast (white-
    balance shift) is invisible in luminance but a strong outlier in a
    single channel (advisor r2 weak #7)."""
    ctr, _, _ = face_geometry(vertices, faces)
    cols = []
    for v in range(len(images)):
        img = np.asarray(images[v], np.float32)
        if grayscale and img.ndim == 3:
            img = img.mean(axis=-1)
        cols.append(_face_view_color(
            cams[v], jnp.asarray(img), jnp.asarray(world_to_cam_poses[v]),
            jnp.asarray(ctr)))
    colors = jnp.stack(cols, axis=1)                  # [F,V] or [F,V,C]
    usable = jnp.asarray(usable)
    if colors.ndim == 3:
        return jnp.where(usable[..., None], colors, 0.0)
    return jnp.where(usable, colors, 0.0)


@jax.jit
def _face_view_color(cam: CameraParams, img, w2c, ctr):
    """One view's face-center colors (compiled; reused across views)."""
    Xc = pose_mod.pose_apply(w2c, ctr)
    safe = jnp.where((Xc[:, 2:3] > 1e-6), Xc,
                     jnp.asarray([0.0, 0.0, 1.0], Xc.dtype))
    pix = cam.project_cam_to_dist_pix(safe)
    return _bilinear(img, pix[:, 0], pix[:, 1])


def _masked_median(x, mask):
    """Row-wise median over masked entries; 0 where a row is empty."""
    big = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(big, axis=1)
    n = jnp.sum(mask, axis=1)
    lo = jnp.take_along_axis(s, jnp.maximum((n - 1) // 2, 0)[:, None], axis=1)
    hi = jnp.take_along_axis(s, jnp.maximum(n // 2, 0)[:, None], axis=1)
    med = 0.5 * (lo + hi)
    return jnp.where(n[:, None] > 0, med, 0.0)


@functools.partial(jax.jit, static_argnames=("iterations", "reject_threshold",
                                             "min_sigma"))
def gauss_clamping(face_view_colors, usable, iterations: int = 4,
                   reject_threshold: float = 6e-3, min_sigma: float = 1e-3):
    """Photometric outlier removal (texrecon's ``-o gauss_clamping``,
    `bin/texrecon:142`): per face, the per-view colors are modeled as a
    per-channel Gaussian; views whose density falls below the rejection
    threshold IN ANY CHANNEL are dropped, iterating until stable — so a
    chroma-only cast (white-balance shift) is rejected even though its
    luminance is inconspicuous. The center/spread are median/MAD (a
    non-robust mean/std lets a single strong outlier inflate sigma enough
    to keep itself). face_view_colors: [F,V] luminance or [F,V,C]
    per-channel. Returns (usable [F,V], weights [F,V]) where weights
    multiply the view quality (1 at the center, ->0 for photometric
    outliers).
    """
    colors = jnp.asarray(face_view_colors, jnp.float32)
    keep = jnp.asarray(usable)
    # per-channel form: [F,V,C] (C=1 for luminance input). The per-view
    # keep decision requires EVERY channel's density above threshold, so a
    # chroma-only cast is rejected, not just re-leveled.
    chans = colors[..., None] if colors.ndim == 2 else colors
    F, V, C = chans.shape
    flat = jnp.transpose(chans, (0, 2, 1)).reshape(F * C, V)

    def stats(keep):
        keep_fc = jnp.broadcast_to(keep[:, None, :], (F, C, V)).reshape(F * C, V)
        med = _masked_median(flat, keep_fc)
        mad = _masked_median(jnp.abs(flat - med), keep_fc)
        sigma = jnp.maximum(1.4826 * mad, min_sigma)
        return med, sigma

    def gauss_of(keep):
        med, sigma = stats(keep)
        g = jnp.exp(-0.5 * ((flat - med) / sigma) ** 2)
        return jnp.transpose(g.reshape(F, C, V), (0, 2, 1))  # [F,V,C]

    def body(_, keep):
        gauss = gauss_of(keep)
        # multivariate (diagonal) density test: the product of per-channel
        # densities against threshold^C — one strongly-off channel kills
        # the product (chroma cast rejected) while mild noise spread over
        # channels survives. Reduces to the scalar test for C = 1.
        new_keep = keep & (jnp.prod(gauss, axis=-1) >= reject_threshold ** C)
        # never drop a face to zero views (keeps faces textured)
        enough = jnp.sum(new_keep, axis=1, keepdims=True) >= 1
        return jnp.where(enough, new_keep, keep)

    keep = jax.lax.fori_loop(0, iterations, body, keep)
    weights = jnp.mean(gauss_of(keep), axis=-1)
    return keep, jnp.where(keep, weights, 0.0)


def face_neighbors(faces: np.ndarray, adjacency: np.ndarray) -> np.ndarray:
    """Padded per-face neighbor table [F,3] (triangles have <=3 edge
    neighbors), -1 where absent. Host-side, from face_adjacency pairs."""
    nbr = np.full((len(faces), 3), -1, np.int32)
    cnt = np.zeros(len(faces), np.int32)
    for a, b in np.asarray(adjacency):
        if cnt[a] < 3:
            nbr[a, cnt[a]] = b
            cnt[a] += 1
        if cnt[b] < 3:
            nbr[b, cnt[b]] = a
            cnt[b] += 1
    return nbr


@functools.partial(jax.jit, static_argnames=("smoothness", "iterations"))
def mrf_view_selection(cost, usable, neighbors, smoothness: float = 0.1,
                       iterations: int = 20):
    """View-selection labeling as a Potts MRF on the face-adjacency graph —
    the mapmap solver's role in texrecon (SURVEY.md 2.2): labels minimize
    sum_f cost[f, l_f] + smoothness * sum_{(a,b) adj} [l_a != l_b].

    Solved with synchronous checkerboard ICM: each sweep updates half the
    faces (by index parity) to their best response given fixed neighbors —
    a batched, compiled loop instead of mapmap's sequential message passing.

    Returns (best_view [F] int32, visible [F] bool).
    """
    cost = jnp.asarray(cost)
    F, V = cost.shape
    nbr = jnp.asarray(neighbors)                        # [F,3]
    nbr_valid = (nbr >= 0)
    nbr_safe = jnp.maximum(nbr, 0)
    visible = jnp.isfinite(jnp.min(cost, axis=-1))
    labels0 = jnp.argmin(cost, axis=-1).astype(jnp.int32)
    parity = jnp.arange(F) % 2

    def sweep(i, labels):
        nl = labels[nbr_safe]                           # [F,3]
        # #neighbors disagreeing with each candidate label: [F,V]
        mismatch = jnp.sum(
            (nl[:, :, None] != jnp.arange(V, dtype=jnp.int32)[None, None, :])
            & nbr_valid[:, :, None], axis=1)
        total = cost + smoothness * mismatch.astype(cost.dtype)
        new = jnp.argmin(total, axis=-1).astype(jnp.int32)
        active = (parity == (i % 2)) & visible
        return jnp.where(active, new, labels)

    labels = jax.lax.fori_loop(0, iterations, sweep, labels0)
    return labels, visible


# ----------------------------------------------------------------------------
# Charts + atlas
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class Atlas:
    """Per-face axis-aligned charts shelf-packed into texture pages.

    Charts spill into as many ``max_page``-bounded pages as needed — the
    reference manages a *vector* of texture atlases the same way
    (texture_processing.cc:209-365 build_model over texture_atlases,
    :353-365 merge_texture_atlases). Single-page meshes keep
    ``face_page == 0`` everywhere and behave exactly as before.
    """

    size: Tuple[int, int]            # (W, H) of the largest page
    face_uv0: np.ndarray             # [F,2] texel origin of each chart
    face_wh: np.ndarray              # [F,2] chart size in texels
    face_basis: np.ndarray           # [F,2,3] in-plane axes (u,v) world dirs
    face_origin3d: np.ndarray        # [F,3] world point of chart texel (0,0)
    pixel_size: float
    face_page: np.ndarray = None     # [F] page index of each chart
    page_sizes: Sequence[Tuple[int, int]] = None   # [(W,H)] per page

    def __post_init__(self):
        if self.face_page is None:
            self.face_page = np.zeros(len(self.face_uv0), np.int32)
        if self.page_sizes is None:
            self.page_sizes = [self.size]

    @property
    def num_pages(self) -> int:
        return len(self.page_sizes)


def _new_pages(atlas: Atlas, channels: Tuple[int, ...], dtype=np.float32):
    return [np.zeros((h, w) + channels, dtype) for w, h in atlas.page_sizes]


def _as_pages(page_or_pages) -> list:
    """Normalize a rendered texture (single array or list of pages)."""
    if isinstance(page_or_pages, (list, tuple)):
        return list(page_or_pages)
    return [page_or_pages]


def _from_pages(pages: list):
    """Single page -> bare array (back-compat); else the list."""
    return pages[0] if len(pages) == 1 else pages


def build_atlas(vertices: np.ndarray, faces: np.ndarray, pixel_size: float,
                max_page: int = 8192, pad: int = 1) -> Atlas:
    """Per-face planar parametrization at fixed pixel_size + shelf packing
    (formModel + IsaacTextureAtlas roles). Host-side (irregular packing).

    Pages are bounded at ``max_page`` in BOTH dimensions; when a shelf
    would overflow a page's height the packer starts a new page
    (reference: texture_processing.cc:209-365 packs into a vector of
    atlases). A single chart larger than max_page is an error — choose a
    coarser ``pixel_size``."""
    tri = vertices[faces]                                  # [F,3,3]
    e1 = tri[:, 1] - tri[:, 0]
    n = np.cross(e1, tri[:, 2] - tri[:, 0])
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
    u = e1 / np.maximum(np.linalg.norm(e1, axis=-1, keepdims=True), 1e-30)
    v = np.cross(n, u)

    # face-local 2D coords of the 3 vertices
    rel = tri - tri[:, :1]
    pu = np.einsum("fij,fj->fi", rel, u)
    pv = np.einsum("fij,fj->fi", rel, v)
    umin, vmin = pu.min(1), pv.min(1)
    w_tex = np.maximum(1, np.ceil((pu.max(1) - umin) / pixel_size).astype(int) + 1)
    h_tex = np.maximum(1, np.ceil((pv.max(1) - vmin) / pixel_size).astype(int) + 1)

    if int(w_tex.max(initial=0)) + pad > max_page or \
            int(h_tex.max(initial=0)) + pad > max_page:
        f_big = int(np.argmax(np.maximum(w_tex, h_tex)))
        raise ValueError(
            f"chart of face {f_big} is {int(w_tex[f_big])}x{int(h_tex[f_big])}"
            f" texels, larger than max_page={max_page}; use a coarser"
            f" pixel_size (>= {pixel_size * (max(int(w_tex[f_big]), int(h_tex[f_big])) + pad) / max_page:.3g})")

    origin3d = tri[:, 0] + umin[:, None] * u + vmin[:, None] * v

    # shelf packing by descending height, spilling into bounded pages
    order = np.argsort(-h_tex)
    page_w = min(max_page, int(np.ceil(np.sqrt(np.sum((w_tex + pad) *
                                                      (h_tex + pad))))) * 2)
    x = y = shelf_h = 0
    page = 0
    uv0 = np.zeros((len(faces), 2), int)
    face_page = np.zeros(len(faces), np.int32)
    page_heights = []
    for f in order:
        fw, fh = int(w_tex[f]) + pad, int(h_tex[f]) + pad
        if x + fw > page_w:
            x = 0
            y += shelf_h
            shelf_h = 0
        if y + fh > max_page:
            # close this page, open the next. Charts are placed in
            # descending height order, so an overflow can only occur right
            # after a shelf wrap (shelf_h == 0) — the finished page's used
            # height is exactly y.
            page_heights.append(y)
            page += 1
            x = y = shelf_h = 0
        uv0[f] = (x, y)
        face_page[f] = page
        x += fw
        shelf_h = max(shelf_h, fh)
    page_heights.append(y + shelf_h)
    page_sizes = [(page_w, h) for h in page_heights]
    size = (page_w, max(h for _, h in page_sizes))
    return Atlas(size=size, face_uv0=uv0,
                 face_wh=np.stack([w_tex, h_tex], 1),
                 face_basis=np.stack([u, v], 1), face_origin3d=origin3d,
                 pixel_size=pixel_size, face_page=face_page,
                 page_sizes=page_sizes)


# ----------------------------------------------------------------------------
# Sampling the selected views into the atlas
# ----------------------------------------------------------------------------


def _bilinear(img, x, y):
    H, W = img.shape[:2]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    c00 = img[y0, x0]
    c10 = img[y0, x0 + 1]
    c01 = img[y0 + 1, x0]
    c11 = img[y0 + 1, x0 + 1]
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


@functools.partial(jax.jit, static_argnames=("max_chart",))
def _render_charts(cam: CameraParams, basis, org, w2c, img, pixel_size,
                   max_chart: int):
    """Texel grid -> 3D -> distorted pixels -> bilinear colors for a batch of
    charts: [S,2,3] basis, [S,3] origins -> [S,mc,mc(,C)] colors.

    One compiled executable per (camera, image shape, chart-bucket size) —
    eager per-view execution was pure remote-compile latency on TPU."""
    gy, gx = jnp.meshgrid(jnp.arange(max_chart, dtype=img.dtype),
                          jnp.arange(max_chart, dtype=img.dtype), indexing="ij")
    pts = (org[:, None, None, :]
           + (gx[None, ..., None] * pixel_size) * basis[:, None, None, 0, :]
           + (gy[None, ..., None] * pixel_size) * basis[:, None, None, 1, :])
    Xc = pose_mod.pose_apply(w2c, pts.reshape(-1, 3))
    pix = cam.project_cam_to_dist_pix(Xc)
    colors = _bilinear(img, pix[:, 0], pix[:, 1])
    out_shape = (basis.shape[0], max_chart, max_chart) + img.shape[2:]
    return colors.reshape(out_shape)


def _chart_tiles(atlas: Atlas, sel: np.ndarray, max_chart: int):
    """Decompose the charts of ``sel`` into [max_chart]^2 tiles: charts larger
    than max_chart are rendered as several tiles with shifted 3D origins, so
    no chart is ever truncated. Returns (tile_face [T], tile_xy [T,2])."""
    fw = atlas.face_wh[sel, 0]
    fh = atlas.face_wh[sel, 1]
    nx = (fw + max_chart - 1) // max_chart
    ny = (fh + max_chart - 1) // max_chart
    n_tiles = nx * ny
    tile_face = np.repeat(sel, n_tiles)
    tile_xy = np.empty((int(n_tiles.sum()), 2), np.int64)
    pos = 0
    for i in range(len(sel)):
        tys, txs = np.meshgrid(np.arange(ny[i]) * max_chart,
                               np.arange(nx[i]) * max_chart, indexing="ij")
        k = int(n_tiles[i])
        tile_xy[pos:pos + k, 0] = txs.ravel()
        tile_xy[pos:pos + k, 1] = tys.ravel()
        pos += k
    return tile_face, tile_xy


def render_atlas(atlas: Atlas, vertices, faces, best_view, visible,
                 images: Sequence, cams: Sequence[CameraParams],
                 world_to_cam_poses, face_gain: Optional[np.ndarray] = None,
                 vertex_gain: Optional[np.ndarray] = None,
                 max_chart: Optional[int] = None) -> np.ndarray:
    """Fill the atlas page: every chart texel is lifted to 3D, projected into
    its face's chosen view through the full distortion model, and bilinearly
    sampled (projectTexture atlas variant, texture_processing.cc:1165-1433).

    Charts are processed in one batched kernel over fixed [max_chart]^2
    tiles; charts larger than max_chart become several tiles (shifted 3D
    origins), so every mapped UV texel is filled regardless of face size.
    ``max_chart=None`` picks the power of two covering the 95th-percentile
    chart dimension (clamped to [8, 64]): kernel and gain work scale with
    max_chart^2 whatever the chart sizes, so a fixed 64 wastes ~98% of the
    texels on fine meshes (measured 60 s -> ~2 s at a 1 cm/texel pipeline
    run whose charts are ~8x8).
    Gains may be per-face [F] / [F,C] or per-vertex [V] / [V,C] (per-channel
    seam leveling). Returns the texture page [H,W] (or [H,W,C]) float [0,1]
    for a single-page atlas, or the list of pages for a multi-page atlas.
    """
    import os as _os
    import time as _time
    _dbg = bool(_os.environ.get("MV_RENDER_TIMING"))
    _acc = {"tiles": 0.0, "kernel": 0.0, "gain": 0.0, "scatter": 0.0}
    F = len(faces)
    if max_chart is None:
        p95 = float(np.percentile(atlas.face_wh.max(axis=1), 95)) if F else 8.0
        max_chart = int(min(64, max(8, 1 << int(np.ceil(np.log2(max(p95, 1)))))))
    sample_img = np.asarray(images[0])
    channels = () if sample_img.ndim == 2 else (sample_img.shape[2],)
    pages = _new_pages(atlas, channels)

    gy, gx = np.meshgrid(np.arange(max_chart), np.arange(max_chart), indexing="ij")

    # group faces by their selected view -> one batched projection per view
    best_view = np.asarray(best_view)
    visible = np.asarray(visible)
    for v in range(len(images)):
        sel = np.nonzero(visible & (best_view == v))[0]
        if len(sel) == 0:
            continue
        _t = _time.perf_counter()
        tile_face, tile_xy = _chart_tiles(atlas, sel, max_chart)
        _acc["tiles"] += _time.perf_counter() - _t
        # per-tile 3D origin: chart origin shifted by the tile offset
        basis_t = atlas.face_basis[tile_face]               # [T,2,3]
        org_t = (atlas.face_origin3d[tile_face]
                 + tile_xy[:, 0:1] * atlas.pixel_size * basis_t[:, 0]
                 + tile_xy[:, 1:2] * atlas.pixel_size * basis_t[:, 1])
        # fixed-size tile chunks: ONE compiled kernel per (camera, image
        # shape) total, instead of per-view eager dispatch (each eager op on
        # a new shape is a remote compile on TPU)
        CHUNK = 2048
        w2c = jnp.asarray(world_to_cam_poses[v], jnp.float32)
        img = jnp.asarray(np.asarray(images[v], np.float32))
        cam32 = jax.tree.map(lambda x: x.astype(jnp.float32)
                             if hasattr(x, "dtype") else x, cams[v])
        chunks = []
        for c0 in range(0, len(tile_face), CHUNK):
            n_part = min(CHUNK, len(tile_face) - c0)
            idx = np.arange(c0, c0 + n_part)
            if n_part < CHUNK:
                idx = np.concatenate([idx, np.full(CHUNK - n_part, idx[0])])
            basis = jnp.asarray(basis_t[idx], jnp.float32)
            org = jnp.asarray(org_t[idx], jnp.float32)
            _t = _time.perf_counter()
            out = _render_charts(cam32, basis, org, w2c, img,
                                 jnp.float32(atlas.pixel_size), max_chart)
            chunks.append(np.asarray(out)[:n_part])
            _acc["kernel"] += _time.perf_counter() - _t
        colors = np.concatenate(chunks)
        _t = _time.perf_counter()
        if vertex_gain is not None:
            # barycentric interpolation of per-vertex gains over each chart
            vertex_gain = np.asarray(vertex_gain)
            tri = vertices[faces[tile_face]]                # [T,3,3]
            e = tri - atlas.face_origin3d[tile_face][:, None, :]
            tu = np.einsum("sij,sj->si", e, atlas.face_basis[tile_face][:, 0])
            tv = np.einsum("sij,sj->si", e, atlas.face_basis[tile_face][:, 1])
            px = (tile_xy[:, 0, None, None] + gx[None]) * atlas.pixel_size
            py = (tile_xy[:, 1, None, None] + gy[None]) * atlas.pixel_size
            # solve barycentric for each texel in the 2D chart plane
            d = ((tu[:, 1] - tu[:, 0]) * (tv[:, 2] - tv[:, 0])
                 - (tu[:, 2] - tu[:, 0]) * (tv[:, 1] - tv[:, 0]))
            d = np.where(np.abs(d) > 1e-12, d, 1e-12)[:, None, None]
            w1 = ((px - tu[:, 0, None, None]) * (tv[:, 2] - tv[:, 0])[:, None, None]
                  - (py - tv[:, 0, None, None]) * (tu[:, 2] - tu[:, 0])[:, None, None]) / d
            w2 = ((py - tv[:, 0, None, None]) * (tu[:, 1] - tu[:, 0])[:, None, None]
                  - (px - tu[:, 0, None, None]) * (tv[:, 1] - tv[:, 0])[:, None, None]) / d
            w0 = 1.0 - w1 - w2
            vg = vertex_gain[faces[tile_face]]              # [T,3] or [T,3,C]
            if vg.ndim == 3:                                # per-channel gains
                corr = (w0[..., None] * vg[:, 0, None, None, :]
                        + w1[..., None] * vg[:, 1, None, None, :]
                        + w2[..., None] * vg[:, 2, None, None, :])
            else:
                corr = (w0 * vg[:, 0, None, None] + w1 * vg[:, 1, None, None]
                        + w2 * vg[:, 2, None, None])
                if channels:
                    corr = corr[..., None]
            colors = colors + corr
        elif face_gain is not None:
            face_gain = np.asarray(face_gain)
            fg = face_gain[tile_face]                       # [T] or [T,C]
            if fg.ndim == 2:
                colors = colors + fg[:, None, None, :]
            else:
                fg = fg[:, None, None]
                colors = colors + (fg[..., None] if channels else fg)

        _acc["gain"] += _time.perf_counter() - _t
        _t = _time.perf_counter()
        _scatter_tiles_into_pages(pages, atlas, tile_face, tile_xy, colors,
                                  max_chart, accumulate=False)
        _acc["scatter"] += _time.perf_counter() - _t
    if _dbg:
        print(f"[render_atlas] {_acc}")
    return _from_pages([np.clip(p, 0.0, 1.0) for p in pages])


def _scatter_tiles_into_pages(pages, atlas: Atlas, tile_face, tile_xy,
                              colors, max_chart: int, accumulate: bool):
    """Vectorized page write: all [T, mc, mc(,C)] tile colors land in their
    page texels with one fancy-index assignment per touched page (replaces
    the per-tile Python loop — O(texels) numpy instead of O(tiles) host
    iterations). Texels outside a tile's chart extent are masked off; tile
    regions never overlap, so fancy-index += is safe for accumulate."""
    if len(tile_face) == 0:
        return
    gy, gx = np.meshgrid(np.arange(max_chart), np.arange(max_chart),
                         indexing="ij")
    tx_off = tile_xy[:, 0, None, None] + gx[None]        # [T,mc,mc]
    ty_off = tile_xy[:, 1, None, None] + gy[None]
    fw = atlas.face_wh[tile_face, 0][:, None, None]
    fh = atlas.face_wh[tile_face, 1][:, None, None]
    valid = (tx_off < fw) & (ty_off < fh)
    px = atlas.face_uv0[tile_face, 0][:, None, None] + tx_off
    py = atlas.face_uv0[tile_face, 1][:, None, None] + ty_off
    pg = atlas.face_page[tile_face]
    for p in np.unique(pg):
        m = valid & (pg == p)[:, None, None]
        if accumulate:
            pages[p][py[m], px[m]] += colors[m]
        else:
            pages[p][py[m], px[m]] = colors[m]


# ----------------------------------------------------------------------------
# Global seam leveling
# ----------------------------------------------------------------------------


def vertex_gains_from_faces(num_vertices: int, faces: np.ndarray,
                            face_gains: np.ndarray) -> np.ndarray:
    """Average per-face gains onto vertices ([F] or [F,C] -> [V] or [V,C]).

    The interpolated per-vertex field is C0-continuous across every edge, so
    the low-frequency part of the seam step vanishes; residual per-texel
    seams are handled by ``local_seam_leveling`` (the Poisson step)."""
    face_gains = np.asarray(face_gains)
    squeeze = face_gains.ndim == 1
    fg = face_gains[:, None] if squeeze else face_gains
    sums = np.zeros((num_vertices, fg.shape[1]))
    counts = np.zeros(num_vertices)
    for k in range(3):
        np.add.at(sums, faces[:, k], fg)
        np.add.at(counts, faces[:, k], 1.0)
    out = sums / np.maximum(counts, 1.0)[:, None]
    return out[:, 0] if squeeze else out


def face_adjacency(faces: np.ndarray) -> np.ndarray:
    """[E,2] pairs of faces sharing an edge (host-side)."""
    edge_map = {}
    pairs = []
    for f, tri in enumerate(np.asarray(faces)):
        for a, b in ((0, 1), (1, 2), (2, 0)):
            key = (min(tri[a], tri[b]), max(tri[a], tri[b]))
            if key in edge_map:
                pairs.append((edge_map[key], f))
            else:
                edge_map[key] = f
    return np.asarray(pairs, np.int32).reshape(-1, 2)


def global_seam_leveling(face_colors: np.ndarray, best_view: np.ndarray,
                         adjacency: np.ndarray, reg: float = 1e-3,
                         iterations: int = 2000, tol: float = 1e-4,
                         return_info: bool = False):
    """Per-face additive gain g minimizing
    sum_adj (g_a - g_b + c_a - c_b)^2 [only across view seams] + reg*sum g^2
    — texrecon's global seam leveling reduced to the face graph, solved with
    damped Jacobi sweeps in JAX under a CONVERGENCE CRITERION: iteration
    stops when the normal-equations residual max|A g - b| drops below
    ``tol`` * max|b| (or at ``iterations``, now a safety cap rather than
    the de-facto answer — a large face graph with long diffusion paths no
    longer silently returns an unconverged solve; advisor r2 weak #6).

    face_colors: [F] mean sampled luminance per face, or [F,C] for
    independent per-channel gains (texrecon levels each color channel
    separately). Returns gains of the same shape; with ``return_info``,
    also a dict with iterations run and the final relative residual."""
    face_colors = np.asarray(face_colors)
    if len(adjacency) == 0:
        z = np.zeros(face_colors.shape)
        return (z, dict(iterations=0, rel_residual=0.0)) if return_info else z
    squeeze = face_colors.ndim == 1
    fc = face_colors[:, None] if squeeze else face_colors
    a = jnp.asarray(adjacency[:, 0])
    b = jnp.asarray(adjacency[:, 1])
    seam = (jnp.asarray(best_view)[a] != jnp.asarray(best_view)[b]).astype(jnp.float32)
    # seam edges demand g_a - g_b = c_b - c_a; same-view edges act as
    # smoothness (target 0, lower weight) so corrections diffuse into charts
    w = jnp.where(seam > 0, 1.0, 0.25)[:, None]
    c = jnp.asarray(fc, jnp.float32)                        # [F,C]
    target = (c[b] - c[a]) * seam[:, None]
    F = fc.shape[0]
    denom = jnp.full((F, 1), reg, jnp.float32)
    denom = denom.at[a].add(w).at[b].add(w)

    omega = 0.7  # damped Jacobi: plain Jacobi oscillates on seam pairs

    def rhs_of(g):
        rhs = jnp.zeros(c.shape, jnp.float32)
        rhs = rhs.at[a].add(w * (g[b] + target))
        rhs = rhs.at[b].add(w * (g[a] - target))
        return rhs

    b_norm = float(jnp.max(jnp.abs(rhs_of(jnp.zeros(c.shape, jnp.float32)))))
    b_norm = max(b_norm, 1e-30)

    # BOUNDED dispatches: 64 sweeps + one residual check per device
    # execution, convergence loop on host. A single while_loop execution
    # of the whole solve exceeded the remote TPU worker's execution
    # watchdog at reference scale (410k faces x 3 channels: worker killed
    # mid-texture) — and a bounded executable is reused every block, so
    # the host loop costs one round-trip per 64 sweeps.
    @jax.jit
    def run_block(g0):
        def sweep(_, gg):
            return (1.0 - omega) * gg + omega * rhs_of(gg) / denom

        g_new = jax.lax.fori_loop(0, 64, sweep, g0)
        # normal-equations residual of the UPDATED iterate
        res = jnp.max(jnp.abs(rhs_of(g_new) - denom * g_new))
        return g_new, res

    g = jnp.zeros(c.shape, jnp.float32)
    it = 0
    res = float("inf")
    while it < iterations and res > tol * b_norm:
        g, res_d = run_block(g)
        res = float(res_d)
        it += 64
    info = dict(iterations=int(it), rel_residual=float(res) / b_norm)
    g = np.asarray(g)
    g = g[:, 0] if squeeze else g
    return (g, info) if return_info else g


# ----------------------------------------------------------------------------
# Local (Poisson) seam leveling + seam metrics
# ----------------------------------------------------------------------------


def shared_edge_vertices(faces: np.ndarray, adjacency: np.ndarray):
    """For each adjacency pair, the two shared vertex ids.

    Returns (pairs [E',2] rows of ``adjacency`` that share exactly one edge,
    verts [E',2] the edge's endpoint vertex ids). Vectorized host-side."""
    faces = np.asarray(faces)
    adjacency = np.asarray(adjacency).reshape(-1, 2)
    A = faces[adjacency[:, 0]]                      # [E,3]
    B = faces[adjacency[:, 1]]
    shared = (A[:, :, None] == B[:, None, :]).any(axis=2)   # [E,3]
    ok = shared.sum(axis=1) == 2
    e_idx, slot = np.nonzero(shared & ok[:, None])
    verts = A[e_idx, slot].reshape(-1, 2)
    return adjacency[ok], verts


def _bilinear_np(img: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Host bilinear sample of [H,W(,C)] at float coords (x,y)."""
    H, W = img.shape[:2]
    x0 = np.clip(np.floor(x).astype(np.int64), 0, W - 2)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, H - 2)
    fx = np.clip(x - x0, 0.0, 1.0)
    fy = np.clip(y - y0, 0.0, 1.0)
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x0 + 1] * fx * (1 - fy)
            + img[y0 + 1, x0] * (1 - fx) * fy + img[y0 + 1, x0 + 1] * fx * fy)


def _edge_samples(page, atlas: Atlas, vertices, faces,
                  pairs: np.ndarray, edge_verts: np.ndarray,
                  samples_per_edge: int = 8, inset_texels: float = 0.75):
    """Sample the rendered page(s) on BOTH sides of each shared face edge.

    Each edge is sampled at K interior points; for each of its two faces the
    sample point is pulled ``inset_texels`` toward that face's centroid (so
    the bilinear read stays inside the face's own chart). ``page`` may be a
    single page or the list of pages of a multi-page atlas — each face is
    read from its own page, so cross-page seams are measured/leveled like
    any others. Returns
    (chart_xy [E,2,K,2] per-face chart-local texel coords,
     colors [E,2,K(,C)] page colors on each side)."""
    pages = _as_pages(page)
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    K = samples_per_edge
    t = (np.arange(K) + 0.5) / K
    v0 = vertices[edge_verts[:, 0]]
    v1 = vertices[edge_verts[:, 1]]
    P = v0[:, None, :] + t[None, :, None] * (v1 - v0)[:, None, :]  # [E,K,3]

    chart_xy = np.empty((len(pairs), 2, K, 2))
    cols_shape = (len(pairs), 2, K) + pages[0].shape[2:]
    colors = np.empty(cols_shape, np.float32)
    for side in range(2):
        f = pairs[:, side]
        ctr = vertices[faces[f]].mean(axis=1)       # [E,3]
        d = ctr[:, None, :] - P
        d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-30)
        Pf = P + inset_texels * atlas.pixel_size * d
        rel = Pf - atlas.face_origin3d[f][:, None, :]
        cx = np.einsum("ekj,ej->ek", rel, atlas.face_basis[f, 0]) / atlas.pixel_size
        cy = np.einsum("ekj,ej->ek", rel, atlas.face_basis[f, 1]) / atlas.pixel_size
        cx = np.clip(cx, 0.0, atlas.face_wh[f, 0:1] - 1.0)
        cy = np.clip(cy, 0.0, atlas.face_wh[f, 1:2] - 1.0)
        chart_xy[:, side, :, 0] = cx
        chart_xy[:, side, :, 1] = cy
        pgs = atlas.face_page[f]
        for p in np.unique(pgs):
            m = pgs == p
            colors[m, side] = _bilinear_np(
                pages[p],
                atlas.face_uv0[f[m], 0:1] + cx[m],
                atlas.face_uv0[f[m], 1:2] + cy[m])
    return chart_xy, colors


def seam_step_stats(page: np.ndarray, atlas: Atlas, vertices, faces,
                    best_view, visible, adjacency: np.ndarray,
                    samples_per_edge: int = 8):
    """Per-edge color step statistics of a rendered page — the texturing
    quality metric (mean |color difference| across each shared edge, sampled
    at texel resolution). Returns a dict with seam-edge (different views)
    and interior-edge (same view) stats."""
    best_view = np.asarray(best_view)
    visible = np.asarray(visible)
    pairs, edge_verts = shared_edge_vertices(faces, adjacency)
    keep = visible[pairs[:, 0]] & visible[pairs[:, 1]]
    pairs, edge_verts = pairs[keep], edge_verts[keep]
    if len(pairs) == 0:
        return dict(num_seam_edges=0, num_interior_edges=0)
    _, colors = _edge_samples(page, atlas, vertices, faces, pairs, edge_verts,
                              samples_per_edge)
    diff = np.abs(colors[:, 0] - colors[:, 1])      # [E,K(,C)]
    step = diff.reshape(len(pairs), -1).mean(axis=1)
    seam = best_view[pairs[:, 0]] != best_view[pairs[:, 1]]
    out = dict(num_seam_edges=int(seam.sum()),
               num_interior_edges=int((~seam).sum()))
    for name, m in (("seam", seam), ("interior", ~seam)):
        if m.any():
            out[f"{name}_mean"] = float(step[m].mean())
            out[f"{name}_median"] = float(np.median(step[m]))
            out[f"{name}_max"] = float(step[m].max())
    return out


@functools.partial(jax.jit, static_argnames=("iterations",))
def _jacobi_dirichlet_jit(corr, dval, dmask, iterations: int):
    """Device body of _jacobi_dirichlet: a fori_loop of neighbor averages.

    Neighbor access is ROLL + edge masks (replicated borders), channels
    moved off the minor dims: concatenating shifted SLICES along the
    (8,128)-tiled axes forces misaligned tile copies every sweep —
    measured 8.4 s for 60 sweeps at [10k,32,32,3] vs 0.21 s with rolls
    (lane/sublane rotations) and iota masks."""
    c0 = jnp.moveaxis(corr, -1, 1)                   # [N,C,G,G]
    dv = jnp.moveaxis(dval, -1, 1)
    dm = jnp.moveaxis(dmask, -1, 1)                  # [N,1,G,G]
    G = c0.shape[2]
    ri = jnp.arange(G).reshape(1, 1, G, 1)
    ci = jnp.arange(G).reshape(1, 1, 1, G)

    def sweep(_, c):
        up = jnp.where(ri == 0, c, jnp.roll(c, 1, axis=2))
        dn = jnp.where(ri == G - 1, c, jnp.roll(c, -1, axis=2))
        lf = jnp.where(ci == 0, c, jnp.roll(c, 1, axis=3))
        rt = jnp.where(ci == G - 1, c, jnp.roll(c, -1, axis=3))
        return jnp.where(dm, dv, (up + dn + lf + rt) * 0.25)

    out = jax.lax.fori_loop(0, iterations, sweep, c0)
    return jnp.moveaxis(out, 1, -1)


def _jacobi_dirichlet(corr, dval, dmask, iterations):
    """Damped-free Jacobi harmonic fill with Dirichlet cells and replicated
    (Neumann) borders. corr/dval [N,G,G,C], dmask [N,G,G,1] bool.

    Runs as ONE compiled device loop — the numpy version streamed
    ~iterations x 5 full-array copies through host memory (measured ~5 min
    of the texture stage at a 10k-face pipeline run; ~1 s on device)."""
    return np.asarray(_jacobi_dirichlet_jit(
        jnp.asarray(corr), jnp.asarray(dval), jnp.asarray(dmask),
        int(iterations)))


@functools.partial(jax.jit, static_argnames=("page_idx", "mc"))
def _apply_field_to_page_jit(page_dev, fields, tf, txy, fw, fh, uv0, wh,
                             face_page, page_idx: int, mc: int):
    """Bilinearly upsample each tile's [G,G,C] field over its chart texels
    and scatter-add into ONE page — device-resident (the page is the only
    host transfer). Tiles of other pages / out-of-chart texels scatter 0
    at clamped indices. corr is clipped with the page into [0,1]."""
    G = fields.shape[1]
    C = fields.shape[3]
    gy, gx = jnp.meshgrid(jnp.arange(mc), jnp.arange(mc), indexing="ij")
    tx_off = txy[:, 0, None, None] + gx[None]       # [T,mc,mc]
    ty_off = txy[:, 1, None, None] + gy[None]
    fwt = fw[tf][:, None, None]
    fht = fh[tf][:, None, None]
    gxn = jnp.clip(tx_off.astype(jnp.float32) / fwt * (G - 1), 0, G - 1)
    gyn = jnp.clip(ty_off.astype(jnp.float32) / fht * (G - 1), 0, G - 1)
    x0 = jnp.floor(gxn).astype(jnp.int32)
    y0 = jnp.floor(gyn).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, G - 1)
    y1 = jnp.minimum(y0 + 1, G - 1)
    fx = (gxn - x0)[..., None]
    fy = (gyn - y0)[..., None]
    fidx = tf[:, None, None]
    corr = (fields[fidx, y0, x0] * (1 - fx) * (1 - fy)
            + fields[fidx, y0, x1] * fx * (1 - fy)
            + fields[fidx, y1, x0] * (1 - fx) * fy
            + fields[fidx, y1, x1] * fx * fy)       # [T,mc,mc,C]
    valid = ((tx_off < wh[tf, 0][:, None, None])
             & (ty_off < wh[tf, 1][:, None, None])
             & (face_page[tf] == page_idx)[:, None, None])
    px = jnp.where(valid, uv0[tf, 0][:, None, None] + tx_off, 0).ravel()
    py = jnp.where(valid, uv0[tf, 1][:, None, None] + ty_off, 0).ravel()
    if page_dev.ndim == 2:
        vals = jnp.where(valid, corr[..., 0], 0.0).ravel()
    else:
        vals = jnp.where(valid[..., None], corr, 0.0).reshape(-1, C)
    return jnp.clip(page_dev.at[py, px].add(vals), 0.0, 1.0)


def local_seam_leveling(page: np.ndarray, atlas: Atlas, vertices, faces,
                        best_view, visible, adjacency: np.ndarray,
                        grid: int = 32, iterations: int = 60,
                        samples_per_edge: int = 8,
                        max_chart: Optional[int] = None,
                        chunk: int = 8192) -> np.ndarray:
    """Per-texel local seam leveling — the role of texrecon's Poisson texel
    editing (`/root/reference/rig_calibrator/bin/texrecon:132-154`,
    SURVEY.md texrecon row): after global gains, residual per-texel seams
    (parallax, misregistration, high-frequency exposure structure) remain.

    For every shared face edge, the page is sampled on both sides; each face
    receives Dirichlet constraints along that edge pulling its colors to the
    two-side mean, and a per-face harmonic correction field is solved on a
    coarse [grid]^2 chart raster (multigrid Jacobi) and bilinearly upsampled
    onto the chart texels. Corrections meet at every edge midpoint by
    construction, so the result is C0 across seams at texel resolution.

    Accepts a single page or the list of pages of a multi-page atlas and
    returns the same form."""
    import os as _os
    import time as _time
    _dbg = bool(_os.environ.get("MV_RENDER_TIMING"))
    _t0 = _time.perf_counter()

    def _mk(label):
        nonlocal _t0
        if _dbg:
            print(f"[local_leveling] {label}: {_time.perf_counter() - _t0:.1f} s")
        _t0 = _time.perf_counter()

    pages = _as_pages(page)
    best_view = np.asarray(best_view)
    visible = np.asarray(visible)
    faces = np.asarray(faces)
    F = len(faces)
    channels = pages[0].shape[2] if pages[0].ndim == 3 else 1
    pairs, edge_verts = shared_edge_vertices(faces, adjacency)
    keep = visible[pairs[:, 0]] & visible[pairs[:, 1]]
    pairs, edge_verts = pairs[keep], edge_verts[keep]
    if len(pairs) == 0:
        return page

    _mk("edge setup")
    chart_xy, colors = _edge_samples(page, atlas, vertices, faces, pairs,
                                     edge_verts, samples_per_edge)
    _mk("edge samples")
    colors = colors.reshape(len(pairs), 2, samples_per_edge, channels)
    mean_col = colors.mean(axis=1, keepdims=True)
    targets = mean_col - colors                     # [E,2,K,C] per-side pull

    # scatter constraints onto each face's [grid]^2 raster (normalized chart
    # coords; the raster is later bilinearly stretched over the true chart)
    fw = np.maximum(atlas.face_wh[:, 0] - 1.0, 1.0)
    fh = np.maximum(atlas.face_wh[:, 1] - 1.0, 1.0)

    # Everything from here to the final page pull-back stays RESIDENT ON
    # DEVICE: the earlier chunked host<->device version moved the [F,G,G,C]
    # rasters through the (remote-tunnel) transfer path every chunk and
    # level — measured ~90 s of pure transfer at F=59k faces vs ~2 s
    # device-resident.
    fw_j = jnp.asarray(fw, jnp.float32)
    fh_j = jnp.asarray(fh, jnp.float32)
    targets_j = jnp.asarray(targets, jnp.float32)   # [E,2,K,C]
    chart_j = jnp.asarray(chart_xy, jnp.float32)    # [E,2,K,2]
    pairs_j = jnp.asarray(pairs.astype(np.int32))

    def scatter(G):
        tsum = jnp.zeros((F, G, G, channels), jnp.float32)
        wcnt = jnp.zeros((F, G, G, 1), jnp.float32)
        for side in range(2):
            f = pairs_j[:, side]
            cgx = jnp.rint(chart_j[:, side, :, 0] / fw_j[f, None]
                           * (G - 1)).astype(jnp.int32)
            cgy = jnp.rint(chart_j[:, side, :, 1] / fh_j[f, None]
                           * (G - 1)).astype(jnp.int32)
            ff = jnp.repeat(f, samples_per_edge)
            tsum = tsum.at[ff, cgy.ravel(), cgx.ravel()].add(
                targets_j[:, side].reshape(-1, channels))
            wcnt = wcnt.at[ff, cgy.ravel(), cgx.ravel()].add(1.0)
        dmask = wcnt > 0
        dval = tsum / jnp.maximum(wcnt, 1.0)
        return dval, dmask

    # coarse-to-fine harmonic fill (Jacobi alone needs O(G^2) sweeps)
    levels = []
    G = grid
    while G >= 8:
        levels.append(G)
        G //= 2
    levels = levels[::-1]
    fields = None
    for G in levels:
        dval, dmask = scatter(G)
        if fields is None:
            cur = jnp.zeros((F, G, G, channels), jnp.float32)
        else:
            cur = jnp.repeat(jnp.repeat(fields, 2, axis=1),
                             2, axis=2)[:, :G, :G]
        fields = _jacobi_dirichlet_jit(cur, dval, dmask, int(iterations))
    fields.block_until_ready()

    _mk("multigrid jacobi")
    # apply: bilinearly upsample each face's field over its chart texels,
    # scatter into device-resident pages, pull each page back once
    G = levels[-1]
    if max_chart is None:
        p95 = float(np.percentile(atlas.face_wh.max(axis=1), 95)) if F else 8.0
        max_chart = int(min(64, max(8, 1 << int(np.ceil(np.log2(max(p95, 1)))))))
    sel = np.nonzero(visible)[0]
    tile_face, tile_xy = _chart_tiles(atlas, sel, max_chart)
    tf_j = jnp.asarray(tile_face.astype(np.int32))
    txy_j = jnp.asarray(tile_xy.astype(np.int32))
    uv0_j = jnp.asarray(atlas.face_uv0.astype(np.int32))
    wh_j = jnp.asarray(atlas.face_wh.astype(np.int32))
    pg_j = jnp.asarray(atlas.face_page.astype(np.int32))
    out_pages = []
    for p, pg_arr in enumerate(pages):
        out_pages.append(np.asarray(_apply_field_to_page_jit(
            jnp.asarray(pg_arr), fields, tf_j, txy_j, fw_j, fh_j,
            uv0_j, wh_j, pg_j, p, max_chart)))
    _mk("apply upsample")
    return out_pages if isinstance(page, (list, tuple)) else out_pages[0]


def mrf_energy(cost, labels, neighbors, smoothness: float) -> float:
    """Potts MRF energy of a view-selection labeling: data term + smoothness
    (half the directed disagreement count — each undirected edge appears in
    both faces' neighbor lists). Infinite/unlabeled faces contribute no data
    term. The quality metric for comparing argmin vs ICM labelings."""
    cost = np.asarray(cost)
    labels = np.asarray(labels)
    nbr = np.asarray(neighbors)
    F = cost.shape[0]
    data = cost[np.arange(F), labels]
    data = np.where(np.isfinite(data), data, 0.0).sum()
    valid = nbr >= 0
    nl = labels[np.maximum(nbr, 0)]
    mismatch = ((nl != labels[:, None]) & valid).sum() / 2.0
    return float(data + smoothness * mismatch)


# ----------------------------------------------------------------------------
# OBJ/MTL output
# ----------------------------------------------------------------------------


def write_textured_obj(prefix, vertices: np.ndarray, faces: np.ndarray,
                       atlas: Atlas, texture_page):
    """OBJ + MTL + PNG output (formObjCustomUV/formMtl/isaac_save_model,
    texture_processing.cc:884-988,492-535). Per-face UVs from the atlas.

    ``texture_page`` may be a single page or the list of pages of a
    multi-page atlas. A multi-page model writes one PNG + one material per
    page and groups faces under ``usemtl`` blocks by page, exactly the
    role of the reference's texture-atlas vector in isaac_save_model
    (texture_processing.cc:492-535)."""
    prefix = Path(prefix)
    prefix.parent.mkdir(parents=True, exist_ok=True)
    obj_path = prefix.with_suffix(".obj")
    mtl_path = prefix.with_suffix(".mtl")
    pages = _as_pages(texture_page)
    multi = len(pages) > 1

    from PIL import Image
    png_names = []
    for p, pg in enumerate(pages):
        png_path = (prefix.parent / f"{prefix.name}_{p}.png" if multi
                    else prefix.with_suffix(".png"))
        img = (np.clip(pg, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(png_path)
        png_names.append(png_path.name)

    # per-face UVs normalized by the face's own page size
    tri = vertices[faces]
    rel = tri - atlas.face_origin3d[:, None, :]
    pu = np.einsum("fij,fj->fi", rel, atlas.face_basis[:, 0]) / atlas.pixel_size
    pv = np.einsum("fij,fj->fi", rel, atlas.face_basis[:, 1]) / atlas.pixel_size
    sizes = np.asarray(atlas.page_sizes, float)          # [P,2] (W,H)
    Wf = sizes[atlas.face_page, 0][:, None]
    Hf = sizes[atlas.face_page, 1][:, None]
    us = (atlas.face_uv0[:, 0:1] + pu) / Wf
    vs = 1.0 - (atlas.face_uv0[:, 1:2] + pv) / Hf

    with open(mtl_path, "w") as m:
        for p, name in enumerate(png_names):
            mat = f"textured_{p}" if multi else "textured"
            m.write(f"newmtl {mat}\nmap_Kd {name}\n")
    with open(obj_path, "w") as o:
        o.write(f"mtllib {mtl_path.name}\n")
        for v in vertices:
            o.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in range(len(faces)):
            for k in range(3):
                o.write(f"vt {us[f, k]} {vs[f, k]}\n")
        # faces grouped by page -> one usemtl block per page
        order = (np.argsort(atlas.face_page, kind="stable") if multi
                 else np.arange(len(faces)))
        cur_page = -1
        for f in order:
            if multi and atlas.face_page[f] != cur_page:
                cur_page = int(atlas.face_page[f])
                o.write(f"usemtl textured_{cur_page}\n")
            elif not multi and cur_page < 0:
                cur_page = 0
                o.write("usemtl textured\n")
            tri_i = faces[f]
            t0 = 3 * int(f) + 1
            o.write(f"f {tri_i[0]+1}/{t0} {tri_i[1]+1}/{t0+1} {tri_i[2]+1}/{t0+2}\n")
    return obj_path
