"""Particle initialization (device-side).

* :func:`initialize_global` — uniform over free space: sample a permissible
  cell uniformly, uniform theta in [0, 2pi); grid->world as
  ``col*res + origin_x, row*res + origin_y`` with origin yaw ignored —
  exactly the reference's initialize_global
  (reference src/particle_filter.cpp:401-446).
* :func:`initialize_pose` — Gaussian cloud around a clicked/seed pose,
  sigma = 0.5 m (x, y), 0.4 rad (theta), uniform weights
  (reference :382-399).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from monte_carlo_localization_tpu.mapping.grid_map import GridMap
from monte_carlo_localization_tpu.utils.geometry import normalize_angle


def initialize_global(
    key: jax.Array,
    grid_map: GridMap,
    num_particles: int,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform particles over free cells. Returns (particles (N,3), log_weights (N,))."""
    k_cell, k_theta = jax.random.split(key)
    # num_free is traced data: a padded fleet map batch samples uniformly
    # over each member's REAL free-cell count.
    cell_idx = jax.random.randint(k_cell, (num_particles,), 0, grid_map.num_free)
    cells = grid_map.free_cells[cell_idx]  # (N, 2) row, col
    x = cells[:, 1].astype(dtype) * grid_map.resolution + grid_map.origin_x
    y = cells[:, 0].astype(dtype) * grid_map.resolution + grid_map.origin_y
    theta = jax.random.uniform(
        k_theta, (num_particles,), dtype=dtype, minval=0.0, maxval=2.0 * jnp.pi
    )
    particles = jnp.stack([x, y, theta], axis=1)
    log_weights = jnp.zeros((num_particles,), dtype=dtype)  # uniform
    return particles, log_weights


def initialize_pose(
    key: jax.Array,
    pose: jnp.ndarray,
    num_particles: int,
    sigma_xy: float = 0.5,
    sigma_theta: float = 0.4,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gaussian cloud around a seed pose. Returns (particles, log_weights)."""
    pose = jnp.asarray(pose, dtype=dtype)
    noise = jax.random.normal(key, (num_particles, 3), dtype=dtype)
    particles = jnp.stack(
        [
            pose[0] + noise[:, 0] * sigma_xy,
            pose[1] + noise[:, 1] * sigma_xy,
            normalize_angle(pose[2] + noise[:, 2] * sigma_theta),
        ],
        axis=1,
    )
    log_weights = jnp.zeros((num_particles,), dtype=dtype)
    return particles, log_weights
