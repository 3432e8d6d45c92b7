import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monte_carlo_localization_tpu.config import MCLConfig
from monte_carlo_localization_tpu.filter import (
    ParticleFilter,
    expected_pose,
    initialize_global,
    initialize_pose,
)


def test_expected_pose_weighted_circular_mean():
    # two particles at theta = +3 and -3: circular mean is pi-ish, not 0
    particles = jnp.asarray([[0.0, 0.0, 3.0], [2.0, 2.0, -3.0]])
    logw = jnp.asarray([0.0, 0.0])
    pose = np.asarray(expected_pose(particles, logw))
    assert pose[0] == pytest.approx(1.0)
    assert pose[1] == pytest.approx(1.0)
    assert abs(pose[2]) > 3.0  # wrapped around pi, NOT the arithmetic mean 0


def test_initialize_global_in_free_space(clutter_map):
    particles, logw = initialize_global(jax.random.key(0), clutter_map, 5000)
    p = np.asarray(particles)
    assert p.shape == (5000, 3)
    assert np.allclose(np.asarray(logw), 0.0)
    # every particle's cell is free
    gx = ((p[:, 0] - clutter_map.origin_x) / clutter_map.resolution).astype(int)
    gy = ((p[:, 1] - clutter_map.origin_y) / clutter_map.resolution).astype(int)
    permissible = np.asarray(clutter_map.permissible)
    assert permissible[gy, gx].all()
    assert (p[:, 2] >= 0).all() and (p[:, 2] <= 2 * np.pi).all()


def test_initialize_pose_statistics():
    pose = jnp.asarray([3.0, -2.0, 0.5])
    particles, _ = initialize_pose(jax.random.key(1), pose, 100_000)
    p = np.asarray(particles)
    assert p[:, 0].mean() == pytest.approx(3.0, abs=0.01)
    assert p[:, 0].std() == pytest.approx(0.5, rel=0.02)  # reference :391
    assert p[:, 1].std() == pytest.approx(0.5, rel=0.02)
    # theta sigma 0.4 (reference :393)
    dth = np.arctan2(np.sin(p[:, 2] - 0.5), np.cos(p[:, 2] - 0.5))
    assert dth.std() == pytest.approx(0.4, rel=0.03)


def test_tracking_converges(clutter_map, beams60, make_scan):
    pf = ParticleFilter(clutter_map, MCLConfig(max_particles=1000))
    pf.set_beam_angles(beams60)
    true_pose = np.array([10.0, 10.0, 0.5], np.float32)
    scan = make_scan(clutter_map, true_pose, beams60)
    state = pf.init_pose(true_pose, seed=0)
    for _ in range(15):
        state, pose = pf.step(state, np.zeros(3), scan)
    pose = np.asarray(pose)
    assert np.linalg.norm(pose[:2] - true_pose[:2]) < 0.1
    assert abs(pose[2] - true_pose[2]) < 0.05


def test_global_localization_converges(clutter_map, beams60, make_scan):
    pf = ParticleFilter(
        clutter_map, MCLConfig(max_particles=20000, seed=1)
    )
    pf.set_beam_angles(beams60)
    true_pose = np.array([10.0, 10.0, 0.5], np.float32)
    scan = make_scan(clutter_map, true_pose, beams60)
    state = pf.init_global()
    for _ in range(30):
        state, pose = pf.step(state, np.zeros(3), scan)
    pose = np.asarray(pose)
    assert np.linalg.norm(pose[:2] - true_pose[:2]) < 0.15


def test_moving_robot_tracking(clutter_map, beams60, make_scan):
    pf = ParticleFilter(clutter_map, MCLConfig(max_particles=1500))
    pf.set_beam_angles(beams60)
    cur = np.array([10.0, 10.0, 0.5], np.float32)
    state = pf.init_pose(cur, seed=3)
    for _ in range(25):
        ds, dth = 0.06, 0.02
        r = ds / dth
        cur = np.array(
            [
                cur[0] + r * (np.sin(cur[2] + dth) - np.sin(cur[2])),
                cur[1] - r * (np.cos(cur[2] + dth) - np.cos(cur[2])),
                cur[2] + dth,
            ],
            np.float32,
        )
        scan = make_scan(clutter_map, cur, beams60)
        state, pose = pf.step(state, np.array([ds, 0.0, dth]), scan)
    pose = np.asarray(pose)
    assert np.linalg.norm(pose[:2] - cur[:2]) < 0.15
    assert abs(np.arctan2(np.sin(pose[2] - cur[2]), np.cos(pose[2] - cur[2]))) < 0.1


def test_multinomial_compat_mode(clutter_map, beams60, make_scan):
    """Reference-compatible multinomial resampling also localizes."""
    pf = ParticleFilter(
        clutter_map,
        MCLConfig(max_particles=1000, resample_method="multinomial"),
    )
    pf.set_beam_angles(beams60)
    true_pose = np.array([10.0, 10.0, 0.5], np.float32)
    scan = make_scan(clutter_map, true_pose, beams60)
    state = pf.init_pose(true_pose, seed=0)
    for _ in range(10):
        state, pose = pf.step(state, np.zeros(3), scan)
    assert np.linalg.norm(np.asarray(pose)[:2] - true_pose[:2]) < 0.12


def test_dda_backend_mode(clutter_map, beams60, make_scan):
    """Reference-exact DDA backend is selectable end to end."""
    pf = ParticleFilter(
        clutter_map, MCLConfig(max_particles=500, raycast_method="dda")
    )
    pf.set_beam_angles(beams60)
    true_pose = np.array([10.0, 10.0, 0.5], np.float32)
    scan = make_scan(clutter_map, true_pose, beams60)
    state = pf.init_pose(true_pose, seed=0)
    for _ in range(8):
        state, pose = pf.step(state, np.zeros(3), scan)
    assert np.linalg.norm(np.asarray(pose)[:2] - true_pose[:2]) < 0.12


def test_state_is_pytree():
    import jax.tree_util as jtu

    from monte_carlo_localization_tpu.filter.core import MCLState

    s = MCLState(
        particles=jnp.zeros((4, 3)),
        log_weights=jnp.zeros(4),
        key=jax.random.key(0),
    )
    leaves = jtu.tree_leaves(s)
    assert len(leaves) == 4  # particles, log_weights, key, log_quality


def test_profile_phases_reports_all_phases(clutter_map, beams60, make_scan):
    """profile_phases populates every reference TimingStats accumulator;
    with lut_pallas active the sensor phase times the ACTUAL kernel."""
    from monte_carlo_localization_tpu.config import MCLConfig
    from monte_carlo_localization_tpu.filter import ParticleFilter

    pose = np.array([10.0, 10.0, 0.5], np.float32)
    scan = make_scan(clutter_map, pose, beams60)
    pf = ParticleFilter(
        clutter_map,
        MCLConfig(max_particles=256, raycast_method="lut_pallas"),
    )
    pf.set_beam_angles(beams60)
    state = pf.init_pose(pose, seed=0)
    stats = pf.profile_phases(state, np.zeros(3, np.float32), scan, iters=3)
    assert stats.measurement_count == 3
    for attr in ("resampling_time", "motion_model_time",
                 "sensor_model_time", "total_mcl_time"):
        assert getattr(stats, attr) > 0.0, attr
