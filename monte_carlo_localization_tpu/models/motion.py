"""Stochastic unicycle/arc motion model.

Rebuilds the reference's motion_model (reference src/particle_filter.cpp:
449-503) as a fully vectorized jax update over the whole particle matrix:

* dt / velocity reconstruction heuristic from the displacement action
  (reference :452-471): dt = |dx|/1.0 if |dx| < 0.1 else |dx|/5.0, clamped
  to [0.001, 0.1]; v = dx/dt; omega = dtheta/dt. Behavior-defining quirk,
  reproduced exactly (flag-gated via `exact_dt_heuristic`).
* exact arc integration per particle: straight-line branch for
  |omega| < 1e-6, else radius = v/omega (reference :474-493). Branches
  become a jnp.where select — branch-free, VPU-friendly.
* iid Gaussian noise per particle (sigma_x, sigma_y, sigma_theta)
  and angle renormalization (reference :496-501), using counter-based
  jax.random instead of the reference's shared mt19937.

Despite the reference's "bicycle kinematics" comment, wheelbase is never
used in propagation — same here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from monte_carlo_localization_tpu.utils.geometry import normalize_angle


def reconstruct_velocity(action: jnp.ndarray):
    """(dt, v, omega) from action [d_forward, 0, d_theta] (reference :452-471)."""
    fwd = action[0]
    dth = action[2]
    afwd = jnp.abs(fwd)

    dt_moving = jnp.where(afwd < 0.1, afwd / 1.0, afwd / 5.0)
    dt_moving = jnp.clip(dt_moving, 0.001, 0.1)
    has_fwd = afwd > 0.001
    dt = jnp.where(has_fwd, dt_moving, 0.01)
    v = jnp.where(has_fwd, fwd / dt, 0.0)
    omega = jnp.where(jnp.abs(dth) > 0.001, dth / dt, 0.0)
    return dt, v, omega


def motion_model(
    key: jax.Array,
    particles: jnp.ndarray,
    action: jnp.ndarray,
    dispersion_x: float = 0.05,
    dispersion_y: float = 0.025,
    dispersion_theta: float = 0.25,
    exact_dt_heuristic: bool = True,
) -> jnp.ndarray:
    """Propagate particles (N, 3) by one action, adding Gaussian noise.

    With ``exact_dt_heuristic=False`` the (v*dt, omega*dt) displacements are
    taken directly from the action (dt cancels in the exact-arc update), a
    cleaner formulation that is equivalent whenever the heuristic's clamp
    does not saturate.
    """
    x = particles[:, 0]
    y = particles[:, 1]
    theta = particles[:, 2]

    if exact_dt_heuristic:
        dt, v, omega = reconstruct_velocity(action)
        ds = v * dt
        dtheta = omega * dt
        omega_for_branch = omega
    else:
        ds = action[0]
        dtheta = action[2]
        omega_for_branch = dtheta

    # Straight-line branch (reference :477-481)
    x_straight = x + ds * jnp.cos(theta)
    y_straight = y + ds * jnp.sin(theta)

    # Arc branch (reference :483-490): radius = v/omega = ds/dtheta.
    # Written via the identity sin(t+d)-sin(t) = 2 sin(d/2) cos(t+d/2)
    # (and the cosine twin): algebraically identical to the reference's
    # radius*(sin(t+d)-sin(t)), but f32-stable — the naive difference
    # cancels catastrophically for tiny d and the error is then amplified
    # by radius = ds/d. The chord length ds*2sin(d/2)/d also tends to the
    # straight-line update as d -> 0.
    safe_dtheta = jnp.where(jnp.abs(dtheta) < 1e-12, 1.0, dtheta)
    chord = ds * (2.0 * jnp.sin(dtheta / 2.0) / safe_dtheta)
    mid = theta + dtheta / 2.0
    x_arc = x + chord * jnp.cos(mid)
    y_arc = y + chord * jnp.sin(mid)

    straight = jnp.abs(omega_for_branch) < 1e-6
    new_x = jnp.where(straight, x_straight, x_arc)
    new_y = jnp.where(straight, y_straight, y_arc)
    new_theta = jnp.where(straight, theta, theta + dtheta)

    noise = jax.random.normal(key, (particles.shape[0], 3), dtype=particles.dtype)
    new_x = new_x + noise[:, 0] * dispersion_x
    new_y = new_y + noise[:, 1] * dispersion_y
    new_theta = normalize_angle(new_theta + noise[:, 2] * dispersion_theta)

    return jnp.stack([new_x, new_y, new_theta], axis=1)
