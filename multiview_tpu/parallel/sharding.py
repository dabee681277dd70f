"""Device-mesh sharding of BA observation tensors.

The reference is single-node shared-memory (SURVEY.md 2.3); here keyframe
observations are sharded across TPU chips along the observation axis of every
per-observation tensor, the (small) state is replicated, and XLA/GSPMD
inserts the psum/all-gather collectives for the JᵀJ and gradient reductions
over ICI. This follows the annotate-shardings-and-let-XLA-partition recipe
rather than hand-written communication.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multiview_tpu.calib import problem as prob

OBS_AXIS = "obs"


def make_mesh(devices: Optional[Sequence] = None, axis: str = OBS_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(shape, devices: Optional[Sequence] = None,
                 host_axis: str = "host", chip_axis: str = OBS_AXIS) -> Mesh:
    """2-D (host x chip) mesh of the given shape — the explicit DCN/ICI
    split layout (distributed.host_chip_mesh's shape on real pods; here any
    shape can be built from local/virtual devices so tests exercise 2x4 and
    4x2 single-process). Observation rows shard over BOTH axes; reductions
    then lower to hierarchical collectives (intra-row then cross-row)."""
    if devices is None:
        devices = jax.devices()
    n = int(shape[0]) * int(shape[1])
    grid = np.asarray(devices)[:n].reshape(shape)
    return Mesh(grid, (host_axis, chip_axis))


def _pad_rows(arr: np.ndarray, n: int, fill=0):
    pad = n - arr.shape[0]
    if pad == 0:
        return arr
    pad_block = np.full((pad,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad_block])


def pad_pixel_obs(obs: prob.PixelObs, multiple: int) -> prob.PixelObs:
    """Pad observation rows to a multiple of the device count; padded rows are
    masked out so they contribute zero residuals."""
    n = len(obs)
    n_pad = -(-n // multiple) * multiple
    if n_pad == n:
        return obs
    return prob.PixelObs(
        pix=jnp.asarray(_pad_rows(np.asarray(obs.pix), n_pad)),
        beg_idx=jnp.asarray(_pad_rows(np.asarray(obs.beg_idx), n_pad)),
        end_idx=jnp.asarray(_pad_rows(np.asarray(obs.end_idx), n_pad)),
        point_idx=jnp.asarray(_pad_rows(np.asarray(obs.point_idx), n_pad)),
        dt_cam=jnp.asarray(_pad_rows(np.asarray(obs.dt_cam), n_pad)),
        dt_bracket=jnp.asarray(_pad_rows(np.asarray(obs.dt_bracket), n_pad)),
        mask=jnp.asarray(_pad_rows(np.asarray(obs.mask), n_pad, fill=False)),
        dist_half_size=obs.dist_half_size,
        sensor=obs.sensor)


def shard_pixel_obs(obs: prob.PixelObs, mesh: Mesh) -> prob.PixelObs:
    """Place each per-row tensor sharded along the obs axis; the per-sensor
    dist_half_size is replicated. On a 2-D (host x chip) mesh the rows shard
    over the product of both axes — reductions become hierarchical
    collectives (ICI within a host row, DCN across)."""
    n_dev = mesh.devices.size
    obs = pad_pixel_obs(obs, n_dev)
    row_sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    rep = NamedSharding(mesh, P())

    def place(x, sharding):
        return jax.device_put(x, sharding)

    return prob.PixelObs(
        pix=place(obs.pix, row_sharding),
        beg_idx=place(obs.beg_idx, row_sharding),
        end_idx=place(obs.end_idx, row_sharding),
        point_idx=place(obs.point_idx, row_sharding),
        dt_cam=place(obs.dt_cam, row_sharding),
        dt_bracket=place(obs.dt_bracket, row_sharding),
        mask=place(obs.mask, row_sharding),
        dist_half_size=place(obs.dist_half_size, rep),
        sensor=obs.sensor)


def shard_observations(observations: prob.Observations, mesh: Mesh) -> prob.Observations:
    return dataclasses.replace(
        observations,
        pixels=tuple(shard_pixel_obs(o, mesh) for o in observations.pixels))


def replicate(tree, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


# ----------------------------------------------------------------------------
# TSDF map-block sharding (SURVEY.md 2.3: voxblox's role scaled across chips)
# ----------------------------------------------------------------------------


def pad_tsdf_grid(grid, multiple: int, y_multiple: int = 1):
    """Pad the grid's X extent to ``multiple`` (and Y to ``y_multiple`` for
    2-D mesh layouts). Padded slabs have zero weight, so extraction and
    further integration ignore them; the origin is unchanged (padding grows
    the +X/+Y sides)."""
    pad_x = (-grid.shape[0]) % multiple
    pad_y = (-grid.shape[1]) % y_multiple
    if pad_x == 0 and pad_y == 0:
        return grid
    def padxy(a):
        if pad_x:
            a = jnp.concatenate(
                [a, jnp.zeros((pad_x,) + a.shape[1:], a.dtype)], axis=0)
        if pad_y:
            a = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], pad_y) + a.shape[2:], a.dtype)],
                axis=1)
        return a
    return dataclasses.replace(grid, tsdf=padxy(grid.tsdf),
                               weight=padxy(grid.weight),
                               intensity=padxy(grid.intensity))


def shard_tsdf_grid(grid, mesh: Mesh):
    """Shard the volume along the X slab axis (1-D mesh), or X over the host
    axis and Y over the chip axis (2-D host x chip mesh). Each device owns a
    contiguous block. The projective integrator (dense/tsdf.py) updates
    every voxel independently from a (replicated) depth image, so
    integration runs with zero cross-device communication — the TSDF-block
    sharding of SURVEY.md 2.3 without voxblox's block hash map."""
    rep = NamedSharding(mesh, P())
    if mesh.devices.ndim == 1:
        grid = pad_tsdf_grid(grid, mesh.devices.size)
        slab = NamedSharding(mesh, P(mesh.axis_names[0]))
    else:
        a0, a1 = mesh.axis_names
        grid = pad_tsdf_grid(grid, mesh.devices.shape[0],
                             mesh.devices.shape[1])
        slab = NamedSharding(mesh, P(a0, a1))
    return dataclasses.replace(
        grid,
        tsdf=jax.device_put(grid.tsdf, slab),
        weight=jax.device_put(grid.weight, slab),
        intensity=jax.device_put(grid.intensity, slab),
        origin=jax.device_put(grid.origin, rep))
