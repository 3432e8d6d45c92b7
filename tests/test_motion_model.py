import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monte_carlo_localization_tpu.models.motion import (
    motion_model,
    reconstruct_velocity,
)


def reference_dt_heuristic(fwd, dth):
    """Literal transcription of reference src/particle_filter.cpp:452-471."""
    dt = 0.01
    velocity = 0.0
    angular_velocity = 0.0
    if abs(fwd) > 0.001:
        if abs(fwd) < 0.1:
            dt = abs(fwd) / 1.0
        else:
            dt = abs(fwd) / 5.0
        dt = max(0.001, min(dt, 0.1))
        velocity = fwd / dt
    if abs(dth) > 0.001:
        angular_velocity = dth / dt
    return dt, velocity, angular_velocity


@pytest.mark.parametrize(
    "fwd,dth",
    [
        (0.0, 0.0),
        (0.05, 0.0),
        (0.05, 0.02),
        (0.5, 0.1),
        (-0.2, -0.05),
        (0.0005, 0.01),
        (2.0, 0.0),
        (0.0, 0.3),
    ],
)
def test_dt_reconstruction_matches_reference(fwd, dth):
    action = jnp.asarray([fwd, 0.0, dth], dtype=jnp.float32)
    dt, v, om = reconstruct_velocity(action)
    rdt, rv, rom = reference_dt_heuristic(fwd, dth)
    assert float(dt) == pytest.approx(rdt, rel=1e-5)
    assert float(v) == pytest.approx(rv, rel=1e-4)
    assert float(om) == pytest.approx(rom, rel=1e-4)


def _propagate_no_noise(particles, action, exact=True):
    key = jax.random.key(0)
    return np.asarray(
        motion_model(
            key,
            jnp.asarray(particles, dtype=jnp.float32),
            jnp.asarray(action, dtype=jnp.float32),
            dispersion_x=0.0,
            dispersion_y=0.0,
            dispersion_theta=0.0,
            exact_dt_heuristic=exact,
        )
    )


def test_straight_line():
    p = np.array([[1.0, 2.0, 0.0], [0.0, 0.0, np.pi / 2]])
    out = _propagate_no_noise(p, [0.05, 0.0, 0.0])
    np.testing.assert_allclose(out[0], [1.05, 2.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.0, 0.05, np.pi / 2], atol=1e-6)


def test_arc_motion():
    # quarter circle: ds = r*dth with r=1, dth=pi/2 -> end at (1,1), facing +y
    p = np.array([[0.0, 0.0, 0.0]])
    ds, dth = np.pi / 2, np.pi / 2
    out = _propagate_no_noise(p, [ds, 0.0, dth], exact=False)
    np.testing.assert_allclose(out[0], [1.0, 1.0, np.pi / 2], atol=1e-5)


def test_pure_rotation():
    p = np.array([[3.0, 4.0, 0.2]])
    out = _propagate_no_noise(p, [0.0, 0.0, 0.3])
    np.testing.assert_allclose(out[0], [3.0, 4.0, 0.5], atol=1e-5)


def test_angle_normalized():
    p = np.array([[0.0, 0.0, 3.0]])
    out = _propagate_no_noise(p, [0.0, 0.0, 0.5])
    assert -np.pi <= out[0, 2] <= np.pi


def test_noise_statistics():
    n = 200_000
    p = np.zeros((n, 3), np.float32)
    key = jax.random.key(42)
    out = np.asarray(
        motion_model(
            key,
            jnp.asarray(p),
            jnp.zeros(3),
            dispersion_x=0.05,
            dispersion_y=0.025,
            dispersion_theta=0.25,
        )
    )
    assert out[:, 0].std() == pytest.approx(0.05, rel=0.02)
    assert out[:, 1].std() == pytest.approx(0.025, rel=0.02)
    assert out[:, 2].std() == pytest.approx(0.25, rel=0.02)
    assert abs(out[:, 0].mean()) < 5e-4


def test_deterministic_given_key():
    p = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    key = jax.random.key(7)
    a = motion_model(key, jnp.asarray(p), jnp.asarray([0.1, 0.0, 0.05]))
    b = motion_model(key, jnp.asarray(p), jnp.asarray([0.1, 0.0, 0.05]))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
