"""Virtual-mesh scaling evidence for the sharded Schur solve (VERDICT r2
#10): real multi-chip hardware is unreachable from this environment, so the
proxy for the >=70%-at-4-hosts target (BASELINE.md) is, per device count
(1/2/4/8 virtual CPU devices):

- per-device WORK BALANCE: observation rows owned by each device after
  padding/sharding (imbalance = idle FLOPs on the lighter devices), and
- COLLECTIVE BYTES per LM iteration: the sum of all-reduce /
  all-gather / reduce-scatter / collective-permute operand bytes in the
  compiled partitioned HLO — what actually rides the ICI on real chips.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
         python scripts/bench_scaling_proxy.py
(conftest-style CPU forcing is done in-process; 8 virtual devices.)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


_COLL_RE = re.compile(
    r"=\s*(\S+)\s+(all-reduce|all-gather|reduce-scatter|collective-permute)"
    r"(?:-start)?\(")
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of every collective op in a compiled HLO dump."""
    out = {}
    for m in _COLL_RE.finditer(hlo_text):
        shape_str, kind = m.group(1), m.group(2)
        total = 0
        for sm in _SHAPE_RE.finditer(shape_str):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES.get(dt, 4)
        out[kind] = out.get(kind, 0) + total
        out["total"] = out.get("total", 0) + total
    return out


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="7k", choices=["7k", "38k", "384k"],
                    help="7k = the round-3 toy; 384k = the production regime"
                    " (VERDICT r3 weak #6)")
    args = ap.parse_args()

    from multiview_tpu.calib import problem as prob
    from multiview_tpu.parallel import sharding as sh
    from multiview_tpu.solver import schur
    from multiview_tpu.utils import synthetic as syn

    sizes = {"7k": (32, 6), "38k": (64, 10), "384k": (160, 20)}
    n_images, n_per_face = sizes[args.size]
    scene = syn.make_cube_scene(n_images=n_images, n_per_face=n_per_face,
                                pix_noise=0.3,
                                dist_coeffs=(-0.1, 0.02, 1e-4, -1e-4),
                                dtype=jnp.float32)
    state0 = syn.perturb_state(scene.true_state)
    cam_mask = prob.build_mask(state0, prob.FloatSpec(cam_poses=True),
                               no_rig=True, include_points=False)
    n_obs = sum(len(o) for o in scene.observations.pixels)
    rows = []
    for nd in (1, 2, 4, 8):
        mesh = sh.make_mesh(jax.devices()[:nd])
        obs = sh.shard_observations(scene.observations, mesh)
        st = sh.replicate(state0, mesh)
        solver = schur.make_schur_solver(
            st, obs, scene.models, prob.BAOptions(no_rig=True), cam_mask,
            max_iterations=1, cg_iterations=10, cg_tolerance=0.1)
        cam0 = prob.pack_state(st, include_points=False)
        compiled = jax.jit(solver).lower(cam0, st.points, obs).compile()
        coll = collective_bytes(compiled.as_text())
        n_padded = sum(len(o) for o in obs.pixels)
        per_dev = n_padded // nd
        balance = per_dev / (n_padded / nd)  # 1.0 = perfect (equal shards)
        # run it to confirm execution
        res = compiled(cam0, st.points, obs)
        jax.block_until_ready(res.cost)
        rows.append({
            "devices": nd,
            "obs_rows_total": int(n_padded),
            "obs_rows_per_device": int(per_dev),
            "work_balance": round(balance, 4),
            "collective_bytes_per_iter": coll,
            "final_cost": round(float(res.cost), 2),
        })
        print(f"[proxy] {nd} dev: {per_dev} rows/dev (balance "
              f"{balance:.3f}), collectives {coll}", file=sys.stderr)
    # equal-cost check across device counts (numerical equivalence)
    costs = [r["final_cost"] for r in rows]
    print(json.dumps({"n_obs": int(n_obs), "rows": rows,
                      "cost_spread": round(max(costs) - min(costs), 4)}))


if __name__ == "__main__":
    main()
