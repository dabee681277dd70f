"""Plane utilities: azimuth/elevation normals, 45-degree snapping, best-fit
planes.

Parity with the reference's plane helpers
(`/root/reference/rig_calibrator/src/dense_map_utils.cc:452-508`): the
azimuth/elevation decomposition drives the per-face y-z-plane texture
parametrization (`texture_processing.cc:750-762`), the snap and SVD fit are
exported utilities of the same module. All batched over leading axes.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def normal_to_azimuth_elevation(normal: jnp.ndarray
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unit (or any nonzero) normal [...,3] -> (azimuth, elevation), with the
    degenerate x=y=0 pole handled as the reference does
    (dense_map_utils.cc:452-463)."""
    x, y, z = normal[..., 0], normal[..., 1], normal[..., 2]
    polar = (x == 0) & (y == 0)
    azimuth = jnp.where(polar, 0.0, jnp.arctan2(y, x))
    elev_gen = jnp.arctan2(z, jnp.hypot(x, y))
    elev_polar = jnp.where(z >= 0, jnp.pi / 2.0, -jnp.pi / 2.0)
    return azimuth, jnp.where(polar, elev_polar, elev_gen)


def azimuth_elevation_to_normal(azimuth: jnp.ndarray, elevation: jnp.ndarray
                                ) -> jnp.ndarray:
    """(azimuth, elevation) -> unit normal [...,3]
    (dense_map_utils.cc:466-470)."""
    ca, sa = jnp.cos(azimuth), jnp.sin(azimuth)
    ce, se = jnp.cos(elevation), jnp.sin(elevation)
    return jnp.stack([ca * ce, sa * ce, se], axis=-1)


def snap_plane_normal(normal: jnp.ndarray) -> jnp.ndarray:
    """Snap a normal so both its angles are multiples of 45 degrees
    (snapPlaneNormal, dense_map_utils.cc:474-484)."""
    a, e = normal_to_azimuth_elevation(normal)
    r45 = jnp.pi / 4.0
    return azimuth_elevation_to_normal(r45 * jnp.round(a / r45),
                                       r45 * jnp.round(e / r45))


def best_fit_plane(points: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares plane through points [N,3] -> (centroid [3], unit
    normal [3]): the normal is the left-singular vector of the centered
    coordinates with the smallest singular value (bestFitPlane,
    dense_map_utils.cc:487-508)."""
    centroid = jnp.mean(points, axis=0)
    centered = (points - centroid).T                     # [3,N]
    u, _, _ = jnp.linalg.svd(centered, full_matrices=False)
    normal = u[:, 2]
    return centroid, normal
