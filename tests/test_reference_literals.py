"""Frozen-literal parity pins against the reference's formulas.

Every expected value below is a hard-coded f64 constant computed ONCE from
a literal transcription of the reference C++ (naive formulations — e.g.
the arc update as radius*(sin(t+d)-sin(t)), reference
src/particle_filter.cpp:487-493 — NOT this repo's f32-stable chord
identity), then frozen into this file. Unlike the formula-transcription
tests (test_sensor_model.py / test_motion_model.py), these cannot drift
with the implementation: if either the engine or the in-test transcription
changes behavior, the literals catch it.
"""

import numpy as np

import jax
import jax.numpy as jnp

from monte_carlo_localization_tpu.models.motion import motion_model
from monte_carlo_localization_tpu.models.sensor import build_sensor_table


def _propagate(pose, action):
    """motion_model with zero dispersion: the deterministic kinematics."""
    out = motion_model(
        jax.random.key(0),
        jnp.asarray([pose], jnp.float32),
        jnp.asarray(action, jnp.float32),
        dispersion_x=0.0,
        dispersion_y=0.0,
        dispersion_theta=0.0,
    )
    return np.asarray(out)[0]


def test_motion_arc_literal():
    # pose (1, -2, 0.3), action (0.2, 0, 0.15): dt=|0.2|/5=0.04,
    # v=5, omega=3.75, radius=4/3, delta=0.15 (reference :460-471, :487-493)
    got = _propagate([1.0, -2.0, 0.3], [0.2, 0.0, 0.15])
    np.testing.assert_allclose(
        got,
        [1.1859271032665208, -1.9268141509694279, 0.45],
        rtol=0.0,
        atol=3e-6,
    )


def test_motion_small_rotation_gated_to_straight_literal():
    # |d_theta| = 0.0005 <= 0.001 keeps angular_velocity = 0 (reference
    # :469-471), so the pose goes STRAIGHT and theta is unchanged — the
    # dt-reconstruction heuristic is behavior-defining here, not cosmetic:
    # without the gate the arc branch would add 0.0005 rad.
    got = _propagate([-0.5, 2.25, -1.2], [0.8, 0.0, 0.0005])
    np.testing.assert_allclose(
        got,
        [-0.21011379641866107, 1.504368731226219, -1.2],
        rtol=0.0,
        atol=3e-6,
    )


def test_motion_small_displacement_heuristic_literal():
    # |dx| = 0.05 < 0.1 takes the dt = |dx|/1.0 branch (reference :461):
    # dt=0.05, v=1, omega=6, radius=1/6, delta=0.3
    got = _propagate([0.0, 0.0, 0.0], [0.05, 0.0, 0.3])
    np.testing.assert_allclose(
        got,
        [0.04925336777688993, 0.007443918479065671, 0.3],
        rtol=0.0,
        atol=3e-6,
    )


def test_sensor_table_literals():
    # max_range_px=10, z_hit=.75, z_short=.08, z_max=.07, z_rand=.1,
    # sigma_hit=2 — four entries of the column-normalized mixture
    # (reference :248-287) frozen in f64
    t = np.asarray(
        build_sensor_table(
            10, z_hit=0.75, z_short=0.08, z_max=0.07, z_rand=0.1, sigma_hit=2.0
        )
    )
    for (r, d), want in [
        ((3, 5), 0.11801566929995734),   # short+hit region below expected
        ((10, 5), 0.054855413434834285),  # z_max spike row
        ((7, 7), 0.10424250478688601),   # on-diagonal hit peak
        ((0, 0), 0.25750715420481735),   # d=0 column (short term undefined,
                                          # guarded by the r<d condition)
    ]:
        np.testing.assert_allclose(t[r, d], want, rtol=1e-6)
