"""Texture-stage wall time at reference scale (VERDICT r2 #3 'Done'
criterion): a >=50k-face mesh textures into max_page-bounded pages with
zero unfilled mapped texels, and the stage times are recorded.

Scene: a 160x160-quad terrain grid (51,200 faces) textured from 6
overhead views through the real per-view projection kernels.

Run (real TPU): cd /root/repo && python scripts/bench_texture_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import argparse
    import resource
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=160,
                    help="terrain grid side; faces = 2*n^2 (500 -> 500k "
                    "faces, the ISS-module regime of VERDICT r3 #8)")
    ap.add_argument("--pixel_size", type=float, default=None,
                    help="texel size in world units (default scales with "
                    "--n to keep texel counts bounded)")
    args = ap.parse_args()

    import jax.numpy as jnp
    from multiview_tpu.texture import texturing
    from multiview_tpu.geometry.camera import CameraParams
    from multiview_tpu.utils import synthetic as syn

    n = args.n                                # 2*n^2 faces
    pixel_size = args.pixel_size or 0.004 * (160.0 / n)
    xs = np.linspace(-2.0, 2.0, n + 1)
    vx, vy = np.meshgrid(xs, xs, indexing="ij")
    vz = 0.15 * np.sin(2.1 * vx) * np.cos(1.7 * vy)
    verts = np.stack([vx.ravel(), vy.ravel(), vz.ravel()], 1)
    faces = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            b = a + 1
            c = a + (n + 1)
            d = c + 1
            faces.append([a, d, b])
            faces.append([a, c, d])
    faces = np.asarray(faces, np.int32)

    views = []
    for k in range(6):
        pos = np.array([-1.2 + 0.5 * k, 0.2 * (k % 2), 3.0])
        views.append(syn.look_at_pose(pos, pos + np.array([0.0, 1e-6, -1.0])))
    cams = [CameraParams.create((640, 480), (500.0, 500.0), (320.0, 240.0))
            for _ in views]
    rng = np.random.default_rng(0)
    imgs = [rng.uniform(0.2, 1.0, (480, 640)).astype(np.float32)
            for _ in views]

    t = {}
    t0 = time.perf_counter()
    best, visible = texturing.view_selection(
        jnp.asarray(verts), jnp.asarray(faces),
        jnp.asarray(np.stack(views)), occlusion=False)
    t["view_selection_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    atlas = texturing.build_atlas(verts, faces, pixel_size=pixel_size,
                                  max_page=1024)
    t["build_atlas_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    pages = texturing.render_atlas(atlas, verts, faces, best, visible, imgs,
                                   cams, [jnp.asarray(v) for v in views],
                                   max_chart=16)
    t["render_atlas_s"] = round(time.perf_counter() - t0, 2)
    pages_l = pages if isinstance(pages, list) else [pages]

    t0 = time.perf_counter()
    adjacency = texturing.face_adjacency(faces)
    t["face_adjacency_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    stats = texturing.seam_step_stats(pages, atlas, verts, faces, best,
                                      visible, adjacency)
    t["seam_stats_s"] = round(time.perf_counter() - t0, 2)

    # zero unfilled mapped texels for visible faces (sampled: every 37th)
    vis = np.asarray(visible)
    unfilled = 0
    for f in range(0, len(faces), 37):
        if not vis[f]:
            continue
        p = atlas.face_page[f]
        x0, y0 = atlas.face_uv0[f]
        w, h = atlas.face_wh[f]
        if not (pages_l[p][y0:y0 + h, x0:x0 + w] > 0).all():
            unfilled += 1
    out = {
        "n_faces": int(len(faces)),
        "peak_host_rss_mb": int(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024),
        "n_views": len(views),
        "visible_frac": round(float(vis.mean()), 4),
        "num_pages": int(atlas.num_pages),
        "page_sizes": [list(map(int, s)) for s in atlas.page_sizes[:4]],
        "max_page": 1024,
        "texels_total": int(sum(w * h for w, h in atlas.page_sizes)),
        "sampled_faces_with_unfilled_texels": unfilled,
        "seam_edges": stats.get("num_seam_edges", 0),
        "timings_s": t,
        "total_s": round(sum(t.values()), 2),
    }
    assert unfilled == 0, "unfilled mapped texels at scale"
    assert all(w <= 1024 and h <= 1024 for w, h in atlas.page_sizes)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
