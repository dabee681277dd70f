"""Phase breakdown of the TPU front-end detect+describe path at the 10k
regime (the FRONTEND_SCALE operating point: 8x 640x480 images, 10k slots,
adaptive floor detection -> ~2k detections, descriptor bucket 2048).

Times BOTH the compute phases (independently jitted executables) and the
ORCHESTRATION costs the production detect_all pays through the remote
tunnel: host->device image transfer, the counts sync between the detect
and describe dispatches, and the per-image emit slicing.

Each phase timed best-of-N with a REAL device sync (np.asarray of a scalar
— jax.block_until_ready on axon arrays can return early, CLAUDE.md).

Run (real TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_frontend_breakdown.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, n=4):
    import jax
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        flat = jax.tree.leaves(out)
        np.asarray(flat[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax
    import jax.numpy as jnp
    from multiview_tpu.sfm import pipeline as pl
    from multiview_tpu.sfm import features as feat

    n_img = 8
    rng = np.random.default_rng(0)
    base = rng.uniform(size=(520, 680)).astype(np.float32)
    for _ in range(2):
        base = 0.25 * (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                       + np.roll(base, 1, 1) + np.roll(base, -1, 1))
    images = [np.ascontiguousarray(base[i * 4:i * 4 + 480, i * 3:i * 3 + 640])
              for i in range(n_img)]
    host_stack = np.stack(images)

    cfg = pl.FrontendConfig(max_features=10000, num_overlaps=3)
    min_features = max(8, cfg.max_features // 10)

    # 0. host->device transfer of the image stack
    def upload():
        x = jnp.asarray(host_stack)
        return x
    t_upload, stack = timeit(upload)

    detect_fn = pl._detect_only_fn(cfg.max_features, cfg.num_scales,
                                   cfg.num_octaves, cfg.sigma0,
                                   cfg.detect_threshold, cfg.edge_threshold,
                                   cfg.feature_detector, min_features)
    t_detect, det = timeit(lambda: detect_fn(stack))
    bases_b, xy_b, sc_b, resp_b, valid_b = det

    # counts sync (what the bucket decision costs on the critical path)
    det2 = detect_fn(stack)
    t0 = time.perf_counter()
    counts = np.asarray(det2[4].sum(axis=1))
    t_counts_sync = time.perf_counter() - t0

    slots = 1 << max(8, int(np.ceil(np.log2(max(int(counts.max()), 1)))))
    slots = min(slots, cfg.max_features)
    print(f"detections per image: {counts.tolist()}  bucket slots: {slots}",
          file=sys.stderr)

    xy_s = xy_b[:, :slots]
    sc_s = sc_b[:, :slots]
    resp_s = resp_b[:, :slots]
    valid_s = valid_b[:, :slots]

    patches_fn = jax.jit(jax.vmap(
        lambda bases, xy, sc: feat._extract_patches(list(bases), xy, sc,
                                                    cfg.sigma0)))
    t_patches, pat = timeit(lambda: patches_fn(bases_b, xy_s, sc_s))
    patches, pcx, pcy, sloc = pat

    orient_fn = jax.jit(jax.vmap(feat._orientations))
    t_orient, ang = timeit(lambda: orient_fn(patches, pcx, pcy, sloc))

    desc_fn = jax.jit(jax.vmap(feat._descriptors))
    t_desc, _ = timeit(lambda: desc_fn(patches, pcx, pcy, sloc, ang, valid_s))

    # full fused describe (what production runs) for cross-check
    describe_fn = pl._describe_only_fn(cfg.max_features, slots, cfg.sigma0,
                                       cfg.feature_detector)
    t_describe, desc_out = timeit(
        lambda: describe_fn(bases_b, xy_s, sc_s, resp_s, valid_s))

    # emit slicing: per-image lazy row slices of the batched outputs
    # (what detect_all's emit loop dispatches), then one sync
    kp_b, d_b = desc_out

    def emit():
        outs = []
        for row in range(n_img):
            outs.append((jax.tree.map(lambda x: x[row], kp_b), d_b[row]))
        return outs[-1][1]
    t_emit, _ = timeit(emit)

    # production end-to-end for cross-check
    t0 = time.perf_counter()
    kps, descs = pl.detect_all(images, cfg)
    jax.block_until_ready(descs[-1])
    np.asarray(descs[-1][0, 0])
    t_detect_all = time.perf_counter() - t0

    out = {
        "n_images": n_img,
        "slots": int(slots),
        "detections_mean": float(counts.mean()),
        "upload_ms": round(t_upload * 1e3, 2),
        "detect_ms_per_image": round(t_detect / n_img * 1e3, 2),
        "counts_sync_ms": round(t_counts_sync * 1e3, 2),
        "patches_ms_per_image": round(t_patches / n_img * 1e3, 2),
        "orient_ms_per_image": round(t_orient / n_img * 1e3, 2),
        "descriptors_ms_per_image": round(t_desc / n_img * 1e3, 2),
        "describe_fused_ms_per_image": round(t_describe / n_img * 1e3, 2),
        "emit_ms": round(t_emit * 1e3, 2),
        "sum_ms_per_image": round(
            (t_upload + t_detect + t_describe + t_emit) / n_img * 1e3
            + t_counts_sync / n_img * 1e3, 2),
        "detect_all_ms_per_image": round(t_detect_all / n_img * 1e3, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
