"""Front-end at the reference's DEFAULT scale: 10,000 features/image
(SIFT default, interest_point.cc:51), batched detection + Pallas-fused
matching on TPU. Reports per-image detect and per-pair match wall times.

Run (real TPU): cd /root/repo && python scripts/bench_frontend_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from multiview_tpu.sfm import pipeline as pl

    n_img = 8
    rng = np.random.default_rng(0)
    base = rng.uniform(size=(520, 680)).astype(np.float32)
    for _ in range(2):
        base = 0.25 * (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                       + np.roll(base, 1, 1) + np.roll(base, -1, 1))
    images = [np.ascontiguousarray(base[i * 4:i * 4 + 480,
                                        i * 3:i * 3 + 640])
              for i in range(n_img)]

    cfg = pl.FrontendConfig(max_features=10000, num_overlaps=3)

    # warm (compile), then time
    t0 = time.perf_counter()
    kps, descs = pl.detect_all(images, cfg)
    jax.block_until_ready(descs[-1])
    compile_detect_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    kps, descs = pl.detect_all(images, cfg)
    jax.block_until_ready(descs[-1])
    detect_s = time.perf_counter() - t0

    pair_ids = [(i, j) for i in range(n_img)
                for j in range(i + 1, min(i + 1 + cfg.num_overlaps, n_img))]
    t0 = time.perf_counter()
    raw = pl.match_pairs_batched(kps, descs, pair_ids, cfg)
    compile_match_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    raw = pl.match_pairs_batched(kps, descs, pair_ids, cfg)
    match_s = time.perf_counter() - t0

    n_feat = [int(np.asarray(k.valid).sum()) for k in kps]
    n_match = {f"{i}-{j}": len(v[0]) for (i, j), v in raw.items()}
    print(json.dumps({
        "n_images": n_img,
        "image_size": [640, 480],
        "max_features": cfg.max_features,
        "features_detected": n_feat,
        "n_pairs": len(pair_ids),
        "detect_s_warm": round(detect_s, 3),
        "detect_ms_per_image": round(detect_s / n_img * 1e3, 1),
        "match_s_warm": round(match_s, 3),
        "match_ms_per_pair": round(match_s / len(pair_ids) * 1e3, 1),
        "compile_s": {"detect": round(compile_detect_s, 1),
                      "match": round(compile_match_s, 1)},
        "matches_per_pair_median": int(np.median(list(n_match.values()))),
    }))


if __name__ == "__main__":
    main()
