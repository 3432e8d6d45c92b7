"""Mega-fused single-program MCL step (VERDICT round-4 item 1).

Runs in interpret mode on CPU (the kernel uses no TPU-only primitives —
RNG is hoisted outside, so the whole program is testable here). The
hardware A/B lives in tools/perf_ablate.py / bench.py.
"""

import numpy as np
import pytest

import monte_carlo_localization_tpu as mcl
from monte_carlo_localization_tpu.filter.core import sensor_update
from tests.conftest import synth_scan

BEAMS = np.linspace(-2.35, 2.35, 60).astype(np.float32)


def _pf(gm, mega, n=512, **over):
    cfg = mcl.MCLConfig(
        max_particles=n, raycast_method="lut_pallas", angle_step=1,
        pallas_mega=mega, **over,
    )
    return mcl.ParticleFilter(gm, cfg, beam_angles=BEAMS)


@pytest.fixture(scope="module")
def mega_pair(clutter_map):
    return _pf(clutter_map, True), _pf(clutter_map, False)


class TestMegaStep:
    def test_single_step_matches_classic(self, clutter_map, mega_pair):
        """One correction from a pose-seeded cloud with ZERO motion noise:
        resample is the identity (uniform weights), motion is exact, so
        the mega proposal must equal the classic one EXACTLY and the log
        weights / pose to f32 tolerance (the kernel computes the same
        beam model; only the pose reduction order differs)."""
        gm = clutter_map
        pf_m = _pf(gm, True, motion_dispersion_x=0.0,
                   motion_dispersion_y=0.0, motion_dispersion_theta=0.0)
        pf_c = _pf(gm, False, motion_dispersion_x=0.0,
                   motion_dispersion_y=0.0, motion_dispersion_theta=0.0)
        pose = np.array([10.3, 9.7, 0.4], np.float32)
        scan = synth_scan(gm, pose, BEAMS)
        s_m = pf_m.init_pose(pose, seed=3)
        s_c = pf_c.init_pose(pose, seed=3)
        np.testing.assert_array_equal(
            np.asarray(s_m.particles), np.asarray(s_c.particles)
        )
        a = np.zeros((1, 3), np.float32)
        o = scan[None]
        s_m, p_m = pf_m.step_many(s_m, a, o)
        s_c, p_c = pf_c.step_many(s_c, a, o)
        pm, pc = np.asarray(s_m.particles), np.asarray(s_c.particles)
        # x/y exact; theta to 1 ulp — classic normalize_angle wraps via an
        # arctan2(sin, cos) round trip, the kernel via exact mod
        np.testing.assert_array_equal(pm[:, :2], pc[:, :2])
        np.testing.assert_allclose(pm[:, 2], pc[:, 2], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s_m.log_weights), np.asarray(s_c.log_weights),
            atol=1e-3, rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(p_m), np.asarray(p_c), atol=1e-4
        )
        assert abs(
            float(s_m.log_quality) - float(s_c.log_quality)
        ) < 1e-2

    def test_likelihood_matches_query(self, clutter_map, mega_pair):
        """The mega kernel's logp must match the classic Pallas query on
        the SAME proposal (zero noise + identity resample pins the
        proposal; the likelihood sub-path is structurally the classic
        kernel)."""
        gm = clutter_map
        pf_m = _pf(gm, True, motion_dispersion_x=0.0,
                   motion_dispersion_y=0.0, motion_dispersion_theta=0.0)
        pose = np.array([12.1, 11.3, -0.7], np.float32)
        scan = synth_scan(gm, pose, BEAMS)
        s_m = pf_m.init_pose(pose, seed=5)
        parts0 = np.asarray(s_m.particles)
        s_m, _ = pf_m.step_many(
            s_m, np.zeros((1, 3), np.float32), scan[None]
        )
        # classic fused likelihood on the identical proposal
        import jax.numpy as jnp

        obs_px = pf_m.sensor.to_pixel_index(jnp.asarray(scan)).astype(
            jnp.float32
        )
        want = np.asarray(pf_m._pallas_query(
            pf_m.grid_map.range_lut, jnp.asarray(parts0), obs_px,
            row_map=pf_m.grid_map.lut_row_map,
        ))
        got = np.asarray(s_m.log_weights)
        np.testing.assert_allclose(
            got, want - want.max(), atol=2e-3, rtol=1e-5
        )

    def test_resample_matches_classic_indices(self, clutter_map):
        """Sharply non-uniform weights (well off any knife edge): the
        in-kernel matmul inversion must pick the SAME ancestors as
        ops.resample.systematic_resample_indices with the same u0."""
        import jax
        import jax.numpy as jnp

        from monte_carlo_localization_tpu.ops.resample import (
            systematic_resample_indices,
        )

        gm = clutter_map
        pf_m = _pf(gm, True, n=256, motion_dispersion_x=0.0,
                   motion_dispersion_y=0.0, motion_dispersion_theta=0.0)
        pose = np.array([10.3, 9.7, 0.4], np.float32)
        scan = synth_scan(gm, pose, BEAMS)
        state = pf_m.init_pose(pose, seed=7)
        rng = np.random.default_rng(1)
        logw = rng.normal(0.0, 3.0, 256).astype(np.float32)
        state = mcl.MCLState(
            particles=state.particles,
            log_weights=jnp.asarray(logw),
            key=state.key,
        )
        parts0 = np.asarray(state.particles)
        # reproduce the step's own u0 draw (key chain: split(key, 3))
        _, k_res, _ = jax.random.split(state.key, 3)
        u0 = jax.random.uniform(k_res, ())
        want_idx = np.asarray(
            systematic_resample_indices(k_res, jnp.asarray(logw))
        )
        s2, _ = pf_m.step_many(
            state, np.zeros((1, 3), np.float32), scan[None]
        )
        got = np.asarray(s2.particles)
        mismatch = (np.abs(got - parts0[want_idx]) > 0).any(axis=1).mean()
        assert mismatch < 0.02, (
            f"{mismatch:.3f} of ancestors differ (> ulp knife edges)"
        )
        del u0

    def test_tracking_parity_with_noise(self, clutter_map, mega_pair):
        """Full-noise chained tracking: mega and classic consume the SAME
        RNG stream, so both must hold the truth to the same accuracy."""
        gm = clutter_map
        pf_m, pf_c = mega_pair
        pose = np.array([10.3, 9.7, 0.4], np.float32)
        scan = synth_scan(gm, pose, BEAMS)
        K = 10
        a = np.zeros((K, 3), np.float32)
        o = np.tile(scan, (K, 1))
        s_m = pf_m.init_pose(pose, seed=0)
        s_c = pf_c.init_pose(pose, seed=0)
        s_m, p_m = pf_m.step_many(s_m, a, o)
        s_c, p_c = pf_c.step_many(s_c, a, o)
        e_m = np.linalg.norm(np.asarray(p_m)[:, :2] - pose[:2], axis=1)
        e_c = np.linalg.norm(np.asarray(p_c)[:, :2] - pose[:2], axis=1)
        assert e_m.max() < 0.1, e_m
        assert e_c.max() < 0.1, e_c

    def test_moving_robot_arc_branch(self, clutter_map):
        """Arc-motion actions (omega != 0) through the mega chain."""
        gm = clutter_map
        pf_m = _pf(gm, True)
        pose = np.array([10.3, 9.7, 0.4], np.float64)
        K, dt = 12, 0.05
        v, om = 1.0, 0.6
        actions, scans, truth = [], [], []
        p = pose.copy()
        for _ in range(K):
            p[0] += v * dt * np.cos(p[2])
            p[1] += v * dt * np.sin(p[2])
            p[2] += om * dt
            truth.append(p.copy())
            actions.append([v * dt, 0.0, om * dt])
            scans.append(synth_scan(gm, p.astype(np.float32), BEAMS))
        s = pf_m.init_pose(pose, seed=2)
        s, poses = pf_m.step_many(
            s, np.asarray(actions, np.float32), np.stack(scans)
        )
        err = np.linalg.norm(
            np.asarray(poses)[:, :2] - np.asarray(truth)[:, :2], axis=1
        )
        assert err[-1] < 0.15, err

    def test_global_convergence(self, clutter_map):
        """Global localization through the mega chain alone."""
        gm = clutter_map
        pf_m = _pf(gm, True, n=2048)
        pose = np.array([10.0, 10.0, 0.5], np.float32)
        scan = synth_scan(gm, pose, BEAMS)
        s = pf_m.init_global(seed=0)
        for _ in range(5):
            s, poses = pf_m.step_many(
                s, np.zeros((5, 3), np.float32), np.tile(scan, (5, 1))
            )
        err = np.linalg.norm(np.asarray(poses)[-1, :2] - pose[:2])
        assert err < 0.15, err

    def test_full_window_branch(self, clutter_map):
        """>128 beams takes the full-window reduce (the 1080-beam
        headline's branch; compact-beam MXU only serves r <= 128):
        single zero-noise step must match the classic query."""
        import jax.numpy as jnp

        gm = clutter_map
        beams = np.linspace(-2.35, 2.35, 200).astype(np.float32)
        cfg = mcl.MCLConfig(
            max_particles=128, raycast_method="lut_pallas", angle_step=1,
            pallas_mega=True, motion_dispersion_x=0.0,
            motion_dispersion_y=0.0, motion_dispersion_theta=0.0,
        )
        pf_m = mcl.ParticleFilter(gm, cfg, beam_angles=beams)
        assert not pf_m._mega_stepper.info["compact_beams"]
        pose = np.array([10.3, 9.7, 0.4], np.float32)
        scan = synth_scan(gm, pose, beams)
        s = pf_m.init_pose(pose, seed=4)
        parts0 = np.asarray(s.particles)
        s, p = pf_m.step_many(
            s, np.zeros((1, 3), np.float32), scan[None]
        )
        obs_px = pf_m.sensor.to_pixel_index(jnp.asarray(scan)).astype(
            jnp.float32
        )
        want = np.asarray(pf_m._pallas_query(
            pf_m.grid_map.range_lut, jnp.asarray(parts0), obs_px,
            row_map=pf_m.grid_map.lut_row_map,
        ))
        got = np.asarray(s.log_weights)
        np.testing.assert_allclose(
            got, want - want.max(), atol=2e-3, rtol=1e-5
        )
        # loose sanity only: 128 particles / one correction put the
        # posterior mean within the seed cloud's spread (the REAL check
        # is the bitwise logp parity above)
        assert np.linalg.norm(np.asarray(p)[0, :2] - pose[:2]) < 0.6

    def test_compact_map_rejected(self, clutter_map, monkeypatch):
        """Row-compacted maps cannot serve the mega path (the row_map
        gather cannot live in-kernel) — explicit error, not wrong math."""
        monkeypatch.setenv("MCL_LUT_DENSE_MAX", "1")
        with pytest.raises(ValueError, match="dense"):
            _pf(clutter_map, True)

    def test_oob_particles_penalized(self, clutter_map):
        """Particles straying off-map score -1e4, as in the classic
        query (pose stays driven by the in-map cloud)."""
        import jax.numpy as jnp

        gm = clutter_map
        pf_m = _pf(gm, True, n=256, motion_dispersion_x=0.0,
                   motion_dispersion_y=0.0, motion_dispersion_theta=0.0)
        pose = np.array([10.3, 9.7, 0.4], np.float32)
        scan = synth_scan(gm, pose, BEAMS)
        s = pf_m.init_pose(pose, seed=1)
        parts = np.array(s.particles)
        parts[:8, 0] = -50.0  # far off-map
        s = mcl.MCLState(
            particles=jnp.asarray(parts),
            log_weights=s.log_weights, key=s.key,
        )
        s, p = pf_m.step_many(
            s, np.zeros((1, 3), np.float32), scan[None]
        )
        lw = np.asarray(s.log_weights)
        prop = np.asarray(s.particles)
        off = prop[:, 0] < -10.0
        if off.any():  # identity resample keeps the planted outliers
            assert (lw[off] < lw[~off].max() - 100.0).all()
        err = np.linalg.norm(np.asarray(p)[0, :2] - pose[:2])
        assert err < 0.5
