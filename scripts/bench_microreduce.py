"""Micro-bench: candidate primitives for the Schur-CG matvec at BA scale.

Answers, on the real TPU, which implementations to use inside the solver's
cg_blocks path (solver/schur.py) for:

  1. pose-column FORWARD expansion  x[R,7] -> per-row [.,N]:
       a) one-hot matmul  [7,R]@[R,N]   (bf16 one-hot)
       b) gather          take(W.T, idx, axis=1)
  2. pose-column REDUCTION  per-row contrib -> [7,R]:
       a) one-hot matmul  [7,N]@[N,R]
       b) scatter-add     .at[:, idx].add
       c) segment_sum     (sorted indices)
       d) cumsum boundary trick (sorted contiguous segments)
  3. block-Jacobian einsum layout:
       a) [N,k,B] einsum nkb,nb->nk     (trailing dims pad to (8,128): ~17x)
       b) [k,B,N] einsum kbn,bn->kn     (N-last: ~1.1x padding)

Run: PYTHONPATH=/root/repo python scripts/bench_microreduce.py [--n 384000 --r 160]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np


def timed(fn, *args, reps=20, label=""):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label:44s} {dt*1e3:8.3f} ms", file=sys.stderr)
    return dt, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=384000)
    ap.add_argument("--r", type=int, default=160)
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--b", type=int, default=29)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    N, R, K, B = args.n, args.r, args.k, args.b
    print(f"device={jax.devices()[0].device_kind} N={N} R={R} K={K} B={B}",
          file=sys.stderr)
    key = jax.random.PRNGKey(0)
    # sorted beg indices, roughly balanced segments
    idx = np.sort(np.random.default_rng(0).integers(0, R, N)).astype(np.int32)
    idx_j = jnp.asarray(idx)
    W = jax.random.normal(key, (R, 7), jnp.float32)
    WT = W.T  # [7,R]
    contribT = jax.random.normal(key, (7, N), jnp.float32)
    contrib = contribT.T
    ohT = (jnp.arange(R, dtype=jnp.int32)[:, None] == idx_j[None, :])
    ohT_bf = ohT.astype(jnp.bfloat16)
    oh_bf = ohT_bf.T

    print("-- forward expansion x[R,7] -> [7,N] --", file=sys.stderr)
    timed(jax.jit(lambda w, o: jnp.matmul(
        w.astype(jnp.bfloat16), o, preferred_element_type=jnp.float32)),
        WT, ohT_bf, label="fwd onehot matmul [7,R]@[R,N] bf16")
    timed(jax.jit(lambda w, i: jnp.take(w, i, axis=1)),
          WT, idx_j, label="fwd gather take(WT, idx, axis=1) -> [7,N]")
    timed(jax.jit(lambda w, i: jnp.take(w, i, axis=0)),
          W, idx_j, label="fwd gather take(W, idx, axis=0) -> [N,7]")

    print("-- reduction contrib -> pose [R,7] --", file=sys.stderr)
    timed(jax.jit(lambda c, o: jnp.matmul(
        c.astype(jnp.bfloat16), o, preferred_element_type=jnp.float32)),
        contribT, oh_bf, label="red onehot matmul [7,N]@[N,R] bf16")
    timed(jax.jit(lambda c, i: jnp.zeros((7, R), jnp.float32).at[:, i].add(c)),
          contribT, idx_j, label="red scatter [7,R].at[:,idx].add([7,N])")
    timed(jax.jit(lambda c, i: jnp.zeros((R, 7), jnp.float32).at[i].add(c)),
          contrib, idx_j, label="red scatter [R,7].at[idx].add([N,7])")
    timed(jax.jit(functools.partial(
        jax.ops.segment_sum, num_segments=R, indices_are_sorted=True)),
        contrib, idx_j, label="red segment_sum sorted [N,7]->[R,7]")

    # cumsum boundary trick: ends[r] = last row index of segment r (+1)
    ends = np.searchsorted(idx, np.arange(1, R + 1)).astype(np.int32)
    ends_j = jnp.asarray(ends)

    def red_cumsum(c, e):
        cs = jnp.cumsum(c, axis=1)  # [7,N]
        tot = jnp.concatenate([jnp.zeros((7, 1), c.dtype),
                               jnp.take(cs, e - 1, axis=1)], axis=1)
        return (tot[:, 1:] - tot[:, :-1])

    def red_cumsum_f64(c, e):
        cs = jnp.cumsum(c.astype(jnp.float64), axis=1)
        tot = jnp.concatenate([jnp.zeros((7, 1), cs.dtype),
                               jnp.take(cs, e - 1, axis=1)], axis=1)
        return (tot[:, 1:] - tot[:, :-1]).astype(c.dtype)

    timed(jax.jit(red_cumsum), contribT, ends_j,
          label="red cumsum-boundary f32 [7,N]")
    try:
        timed(jax.jit(red_cumsum_f64), contribT, ends_j,
              label="red cumsum-boundary f64 [7,N]")
    except Exception as exc:
        print(f"  f64 cumsum failed: {str(exc)[:120]}", file=sys.stderr)

    # accuracy of the candidates vs f64 reference
    ref = np.zeros((R, 7))
    np.add.at(ref, idx, np.asarray(contrib, np.float64))
    for name, fn, a, b2, tr in [
        ("onehot", lambda c, o: jnp.matmul(c.astype(jnp.bfloat16), o,
                                           preferred_element_type=jnp.float32),
         contribT, oh_bf, True),
        ("scatter", lambda c, i: jnp.zeros((R, 7), jnp.float32).at[i].add(c),
         contrib, idx_j, False),
        ("cumsum_f32", red_cumsum, contribT, ends_j, True),
    ]:
        got = np.asarray(jax.jit(fn)(a, b2), np.float64)
        if tr:
            got = got.T
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        print(f"  accuracy {name:12s} max-rel-err {rel:.2e}", file=sys.stderr)

    print("-- j_cam einsum layouts --", file=sys.stderr)
    jc = jax.random.normal(key, (N, K, B), jnp.float32)
    jcT = jnp.transpose(jc, (1, 2, 0))  # [K,B,N]
    xr = jax.random.normal(key, (N, B), jnp.float32)
    xrT = xr.T
    u = jax.random.normal(key, (N, K), jnp.float32)
    uT = u.T
    timed(jax.jit(lambda a, x: jnp.einsum("nkb,nb->nk", a, x)), jc, xr,
          label="Jx einsum nkb,nb->nk  [N,K,B]")
    timed(jax.jit(lambda a, x: jnp.einsum("kbn,bn->kn", a, x)), jcT, xrT,
          label="Jx einsum kbn,bn->kn  [K,B,N]")
    timed(jax.jit(lambda a, x: jnp.einsum("nkb,nk->nb", a, x)), jc, u,
          label="JTu einsum nkb,nk->nb [N,K,B]")
    timed(jax.jit(lambda a, x: jnp.einsum("kbn,kn->bn", a, x)), jcT, uT,
          label="JTu einsum kbn,kn->bn [K,B,N]")
    timed(jax.jit(lambda a: jnp.sum(a * a, axis=1)), jc,
          label="diag sum(j*j,axis=1)  [N,K,B]")
    timed(jax.jit(lambda a: jnp.sum(a * a, axis=0)), jcT,
          label="diag sum(j*j,axis=0)  [K,B,N]")

    print("-- j_pt / Hpp layouts --", file=sys.stderr)
    P = max(R * 15, 2400)
    pidx = jnp.asarray(np.random.default_rng(1).integers(0, P, N), jnp.int32)
    jp = jax.random.normal(key, (N, K, 3), jnp.float32)
    jpT = jnp.transpose(jp, (1, 2, 0))  # [K,3,N]
    timed(jax.jit(lambda a: jnp.zeros((P, 3, 3), jnp.float32).at[pidx].add(
        jnp.einsum("nri,nrj->nij", a, a))), jp,
        label="Hpp [N,K,3] einsum+scatter [N,3,3]")
    timed(jax.jit(lambda a: jnp.zeros((3, 3, P), jnp.float32).at[:, :, pidx].add(
        jnp.einsum("kin,kjn->ijn", a, a))), jpT,
        label="Hpp [K,3,N] einsum+scatter [3,3,N]")
    xp = jax.random.normal(key, (P, 3), jnp.float32)
    timed(jax.jit(lambda a, x: jnp.einsum("nkj,nj->nk", a, x[pidx])), jp, xp,
          label="Jp x  [N,K,3] gather+einsum")
    timed(jax.jit(lambda a, x: jnp.einsum(
        "kjn,jn->kn", a, jnp.take(x.T, pidx, axis=1))), jpT, xp,
        label="Jp x  [K,3,N] gatherT+einsum")
    timed(jax.jit(lambda a, x: jnp.zeros((P, 3), jnp.float32).at[pidx].add(
        jnp.einsum("nkj,nk->nj", a, x))), jp, u,
        label="JpT u [N,K,3] einsum+scatter")
    timed(jax.jit(lambda a, x: jnp.zeros((3, P), jnp.float32).at[:, pidx].add(
        jnp.einsum("kjn,kn->jn", a, x))), jpT, uT,
        label="JpT u [K,3,N] einsum+scatterT")


if __name__ == "__main__":
    main()
