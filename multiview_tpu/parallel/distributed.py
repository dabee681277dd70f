"""Multi-host initialization and mesh construction.

The reference is strictly single-node shared-memory (SURVEY.md 2.3) — its
"distribution" is a thread pool and the filesystem. The TPU-native
equivalent (SURVEY.md 5, "Distributed communication backend"): each host
process joins a `jax.distributed` cluster, a global device mesh spans every
chip across hosts, observation/TSDF shards ride ICI within a slice and DCN
across hosts, and GSPMD inserts the psum/all_gather collectives. No NCCL/MPI
analogue is hand-written anywhere.

Typical multi-host launch (one process per host):

    from multiview_tpu.parallel import distributed as dist
    dist.initialize()            # no-op single-process; env-driven on pods
    mesh = dist.global_mesh()    # 1-D mesh over every chip of every host
    ... shard_observations(obs, mesh) ...

On TPU pods `jax.distributed.initialize()` discovers the topology from the
environment; for CPU/GPU clusters pass coordinator_address/num_processes/
process_id explicitly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh

from multiview_tpu.parallel.sharding import OBS_AXIS

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> bool:
    """Join (or create) the jax.distributed cluster.

    Safe to call unconditionally: a single-process run with no coordinator
    configured is a no-op, and double initialization is ignored. Returns
    True when a multi-process cluster is active.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    multi = (coordinator_address is not None
             or (num_processes or 0) > 1
             or _env_says_multiprocess())
    if multi:
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        if local_device_ids is not None:
            kwargs["local_device_ids"] = list(local_device_ids)
        jax.distributed.initialize(**kwargs)
    _initialized = True
    return jax.process_count() > 1


def _env_says_multiprocess() -> bool:
    import os
    return any(v in os.environ for v in
               ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS"))


def global_mesh(axis: str = OBS_AXIS) -> Mesh:
    """1-D mesh over every chip of every process (global devices, ordered so
    each host's chips are contiguous — shards of co-resident data stay on
    the owning host; reductions cross DCN only once per host)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), (axis,))


def host_chip_mesh(host_axis: str = "host", chip_axis: str = OBS_AXIS
                   ) -> Mesh:
    """2-D (hosts x local chips) mesh for layouts that want the DCN/ICI
    split explicit — e.g. TSDF slab sharding across hosts with per-chip
    observation sharding inside each slab."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = jax.process_count()
    per = len(devs) // n_proc
    grid = np.asarray(devs).reshape(n_proc, per)
    return Mesh(grid, (host_axis, chip_axis))


def process_slice(n_rows: int) -> Tuple[int, int]:
    """[start, stop) row range owned by this process for host-partitioned
    data loading (each host reads only its own keyframes/clouds)."""
    p = jax.process_index()
    n = jax.process_count()
    per = -(-n_rows // n)
    return min(p * per, n_rows), min((p + 1) * per, n_rows)
