"""Checkpoint/resume round-trips: single filter, fleet, sharded.

The reference has NO checkpointing (SURVEY §5 "Checkpoint / resume:
None"); the engine's value-add must hold across all three state
families (VERDICT round-2 item 6): a resumed filter continues BITWISE
identically to one that never stopped, and mesh-sharded states restore
with their shardings intact.
"""

import dataclasses

import numpy as np
import pytest

import jax

from monte_carlo_localization_tpu.config import MCLConfig
from monte_carlo_localization_tpu.filter import ParticleFilter
from monte_carlo_localization_tpu.parallel import (
    FleetFilter,
    ShardedParticleFilter,
)
from monte_carlo_localization_tpu.runtime import (
    load_fleet_state,
    load_state,
    save_fleet_state,
    save_state,
)

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def pose():
    return np.array([10.0, 10.0, 0.5], np.float32)


@pytest.fixture(scope="module")
def scan(clutter_map, beams60, pose):
    from tests.conftest import synth_scan

    return synth_scan(clutter_map, pose, beams60)


class TestSingleFilterCheckpoint:
    def test_resume_continues_bitwise(self, tmp_path, clutter_map, beams60,
                                      scan, pose):
        cfg = MCLConfig(max_particles=128, raycast_method="sphere")
        pf = ParticleFilter(clutter_map, cfg, beam_angles=beams60)
        action = np.array([0.05, 0.0, 0.01], np.float32)

        s = pf.init_pose(pose, seed=3)
        s, _ = pf.step(s, action, scan)
        save_state(tmp_path / "ck.npz", s, iters=1)

        # uninterrupted continuation
        s_cont, p_cont = pf.step(s, action, scan)

        # resumed continuation
        s_res, meta = load_state(tmp_path / "ck.npz")
        assert meta["iters"] == 1
        s_res, p_res = pf.step(s_res, action, scan)
        np.testing.assert_array_equal(np.asarray(p_res), np.asarray(p_cont))
        np.testing.assert_array_equal(
            np.asarray(s_res.particles), np.asarray(s_cont.particles)
        )


class TestFleetCheckpoint:
    def _fleet(self, clutter_map, beams60, f=3):
        return FleetFilter(
            clutter_map,
            fleet_size=f,
            config=MCLConfig(max_particles=64, raycast_method="sphere"),
            beam_angles=beams60,
        )

    def test_roundtrip_continues_bitwise(self, tmp_path, clutter_map,
                                         beams60, scan, pose):
        f = 3
        ff = self._fleet(clutter_map, beams60, f)
        actions = np.tile([0.05, 0.0, 0.01], (f, 1)).astype(np.float32)
        scans = np.tile(scan, (f, 1))
        s = ff.init_pose(np.tile(pose, (f, 1)), seed=4)
        s, poses = ff.step(s, actions, scans)
        save_fleet_state(tmp_path / "fleet.npz", s, iters=1, poses=poses)

        s_cont, p_cont = ff.step(s, actions, scans)

        s_res, meta = load_fleet_state(tmp_path / "fleet.npz", fleet=ff)
        assert meta["iters"] == 1
        assert meta["poses"].shape == (f, 3)
        s_res, p_res = ff.step(s_res, actions, scans)
        np.testing.assert_array_equal(np.asarray(p_res), np.asarray(p_cont))
        np.testing.assert_array_equal(
            np.asarray(s_res.particles), np.asarray(s_cont.particles)
        )
        np.testing.assert_array_equal(
            np.asarray(s_res.log_weights), np.asarray(s_cont.log_weights)
        )

    def test_wrong_fleet_size_rejected(self, tmp_path, clutter_map, beams60,
                                       pose):
        ff = self._fleet(clutter_map, beams60, 3)
        s = ff.init_pose(np.tile(pose, (3, 1)), seed=0)
        save_fleet_state(tmp_path / "fleet.npz", s)
        ff2 = self._fleet(clutter_map, beams60, 2)
        with pytest.raises(ValueError, match="members"):
            load_fleet_state(tmp_path / "fleet.npz", fleet=ff2)

    def test_single_checkpoint_rejected(self, tmp_path, clutter_map, beams60,
                                        pose):
        pf = ParticleFilter(
            clutter_map,
            MCLConfig(max_particles=64, raycast_method="sphere"),
            beam_angles=beams60,
        )
        s = pf.init_pose(pose, seed=0)
        save_state(tmp_path / "single.npz", s)
        with pytest.raises(ValueError, match="not a fleet checkpoint"):
            load_fleet_state(tmp_path / "single.npz")

    @needs_8
    def test_mesh_fleet_restores_sharded(self, tmp_path, clutter_map,
                                         beams60, scan, pose):
        """A checkpoint written WITHOUT a mesh restores onto a mesh-sharded
        fleet with the fleet-axis sharding applied."""
        from jax.sharding import Mesh

        f = 8
        ff_plain = FleetFilter(
            clutter_map, fleet_size=f,
            config=MCLConfig(max_particles=64, raycast_method="sphere"),
            beam_angles=beams60,
        )
        s = ff_plain.init_pose(np.tile(pose, (f, 1)), seed=5)
        save_fleet_state(tmp_path / "fleet.npz", s)

        mesh = Mesh(np.array(jax.devices()[:8]), ("fleet",))
        ff_mesh = FleetFilter(
            clutter_map, fleet_size=f,
            config=MCLConfig(max_particles=64, raycast_method="sphere"),
            beam_angles=beams60, mesh=mesh,
        )
        s_res, _ = load_fleet_state(tmp_path / "fleet.npz", fleet=ff_mesh)
        assert "fleet" in str(s_res.particles.sharding)
        np.testing.assert_array_equal(
            np.asarray(s_res.particles), np.asarray(s.particles)
        )
        actions = np.zeros((f, 3), np.float32)
        s_res, poses = ff_mesh.step(s_res, actions, np.tile(scan, (f, 1)))
        assert np.isfinite(np.asarray(poses)).all()


class TestShardedCheckpoint:
    @needs_8
    def test_roundtrip_bitwise_with_placement(self, tmp_path, clutter_map,
                                              beams60, scan):
        spf = ShardedParticleFilter(
            clutter_map,
            MCLConfig(max_particles=800, raycast_method="sphere"),
            beam_angles=beams60,
        )
        s = spf.init_global(seed=6)
        s, _ = spf.step(s, np.zeros(3), scan)
        save_state(tmp_path / "sharded.npz", s, iters=1)

        s_cont, p_cont = spf.step(s, np.zeros(3), scan)

        s_res, meta = load_state(
            tmp_path / "sharded.npz", place=spf.place_state
        )
        assert meta["iters"] == 1
        assert "p" in str(s_res.particles.sharding)  # particle-axis sharded
        s_res, p_res = spf.step(s_res, np.zeros(3), scan)
        np.testing.assert_array_equal(np.asarray(p_res), np.asarray(p_cont))
        np.testing.assert_array_equal(
            np.asarray(s_res.particles), np.asarray(s_cont.particles)
        )

    @needs_8
    def test_place_state_size_mismatch(self, clutter_map, beams60):
        spf = ShardedParticleFilter(
            clutter_map,
            MCLConfig(max_particles=800, raycast_method="sphere"),
            beam_angles=beams60,
        )
        s = spf.init_global(seed=0)
        bad = dataclasses.replace(
            s, particles=np.zeros((16, 3), np.float32),
            log_weights=np.zeros(16, np.float32),
        )
        with pytest.raises(ValueError, match="particles"):
            spf.place_state(bad)
