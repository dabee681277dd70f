"""Selector-matmul floor microbench (PERFORMANCE.md roofline note 1).

Measures the in-loop cost of ONE folded bracket-selector matmul
[N,R]@[R,14] at the 384k production size — the op class that bounds the
steady-state Schur-CG iteration after the bracket fold — in bf16
storage and in int8 storage with an in-graph convert. If the op were
HBM-bandwidth-bound, int8 (half the bytes) would run ~2x faster; the
measured ~8% gain shows it is MXU/serialization-bound, i.e. the
documented floor is not reducible by further shrinking the stream.

Run (real TPU): PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/bench_selector_floor.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(N: int = 384000, R: int = 160, loops: int = 20, repeats: int = 5):
    import jax
    import jax.numpy as jnp

    idx = np.random.default_rng(0).integers(0, R, N)
    oh = jnp.asarray((idx[:, None] == np.arange(R)[None, :])
                     .astype(np.float32)).astype(jnp.bfloat16)
    W = jnp.asarray(np.random.default_rng(1).standard_normal((R, 14))
                    .astype(np.float32)).astype(jnp.bfloat16)

    def make(convert):
        def loop(oh, W):
            def body(c, _):
                a = oh.astype(jnp.bfloat16) if convert else oh
                y = jnp.matmul(a, c, preferred_element_type=jnp.float32)
                # carry-dependent perturbation keeps the loop serialized
                return c + y[:R].astype(jnp.bfloat16) * 1e-9, ()
            c, _ = jax.lax.scan(body, W, None, length=loops)
            return c
        return jax.jit(loop)

    out = {"N": N, "R": R, "loops": loops, "best_of": repeats}
    for name, fn, a in (("bf16", make(False), oh),
                        ("int8_convert", make(True), oh.astype(jnp.int8))):
        r = fn(a, W)
        np.asarray(r)[0, 0]          # real sync (CLAUDE.md: block_until_ready
        best = float("inf")          # can return early on tunnel arrays)
        for _ in range(repeats):
            t0 = time.perf_counter()
            r = fn(a, W)
            np.asarray(r)[0, 0]
            best = min(best, time.perf_counter() - t0)
        ms = best / loops * 1e3
        gbs = N * R * (2 if name == "bf16" else 1) / (ms / 1e3) / 1e9
        out[name] = {"ms_per_matmul": round(ms, 3),
                     "effective_gb_s": round(gbs, 1)}
        print(f"[selector floor] {name}: {ms:.3f} ms/matmul "
              f"({gbs:.0f} GB/s effective)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
