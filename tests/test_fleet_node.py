"""Fleet robot loop (runtime/fleet_node.py) — VERDICT round-3 item 7.

The fleet previously stopped at the step API; FleetNode gives it the
MCLNode surface: per-member OdometryTrackers, per-member scan ingest,
one fused fleet correction per tick, async pipelining, per-member pose
priority chains, and batched sink topics. LiveRunner drives it
unchanged (duck-typed update/publish surface).
"""

import threading
import time

import numpy as np
import pytest

from monte_carlo_localization_tpu.config import MCLConfig
from monte_carlo_localization_tpu.runtime import (
    CallbackSink,
    FleetNode,
    LiveRunner,
)

F = 3  # small fleet


@pytest.fixture()
def fleet_node(clutter_map):
    return FleetNode(
        clutter_map,
        fleet_size=F,
        config=MCLConfig(
            max_particles=512, raycast_method="lut", angle_step=1
        ),
        rng_seed=0,
    )


def _poses(clutter_map):
    return np.array(
        [[10.3, 9.7, 0.2], [14.2, 5.3, 1.1], [6.1, 12.4, -0.7]],
        np.float64,
    )


def _feed(node, poses, beams, make_scan, gm, t):
    for m in range(F):
        node.on_scan(m, make_scan(gm, poses[m], beams), beam_angles=beams)
        node.on_odometry(m, *poses[m], 0.0, 0.0, stamp=t)


class TestFleetNode:
    def test_tracked_correction_loop(self, fleet_node, clutter_map, beams60,
                                     make_scan):
        node = fleet_node
        poses = _poses(clutter_map)
        node.initialize_pose(poses)
        _feed(node, poses, beams60, make_scan, clutter_map, 0.0)
        t = 0.0
        node.update(now=t)
        got = None
        for _ in range(5):
            t += 0.05
            got = node.update(now=t)
        assert got is not None and got.shape == (F, 3)
        err = np.linalg.norm(got[:, :2] - poses[:, :2], axis=1)
        assert (err < 0.5).all(), err
        # per-member priority chain: trackers anchored => tracked poses
        cur = node.current_poses()
        assert cur.shape == (F, 3)
        assert np.linalg.norm(cur[:, :2] - poses[:, :2], axis=1).max() < 0.5
        for tr in node.trackers:
            assert tr.active

    def test_update_gates(self, fleet_node, clutter_map, beams60, make_scan):
        node = fleet_node
        # no scans yet -> no correction
        assert node.update(now=0.0) is None
        assert node.update(now=0.05) is None
        poses = _poses(clutter_map)
        # a PARTIAL fleet (one member missing its scan) must not step
        node.on_scan(0, make_scan(clutter_map, poses[0], beams60),
                     beam_angles=beams60)
        assert node.update(now=0.10) is None
        _feed(node, poses, beams60, make_scan, clutter_map, 0.1)
        # dt > 1 s gap skip (reference :750-752)
        assert node.update(now=5.0) is None
        assert node.update(now=5.05) is not None

    def test_mismatched_beam_count_rejected(self, fleet_node, clutter_map,
                                            beams60, make_scan):
        node = fleet_node
        poses = _poses(clutter_map)
        node.on_scan(0, make_scan(clutter_map, poses[0], beams60),
                     beam_angles=beams60)
        with pytest.raises(ValueError, match="beams"):
            node.on_scan(1, np.ones(24, np.float32))

    def test_heterogeneous_beam_geometry_rejected(
        self, fleet_node, clutter_map, beams60, make_scan
    ):
        """VERDICT round-4 weak #6: a member with a different lidar model
        (same beam count, different angle_min/increment) must fail at
        ingest, not silently score against the compiled beam set."""
        node = fleet_node
        poses = _poses(clutter_map)
        node.on_scan(0, make_scan(clutter_map, poses[0], beams60),
                     beam_angles=beams60)
        # same count, shifted angle_min
        with pytest.raises(ValueError, match="geometry"):
            node.on_scan(1, np.ones(len(beams60), np.float32),
                         beam_angles=beams60 + 0.1)
        # same count, different increment (via angle_min/increment form)
        inc = float(beams60[1] - beams60[0])
        with pytest.raises(ValueError, match="geometry"):
            node.on_scan(
                1, np.ones(len(beams60), np.float32),
                angle_min=float(beams60[0]), angle_increment=inc * 1.5,
            )
        # matching geometry in either form passes
        node.on_scan(1, np.ones(len(beams60), np.float32),
                     beam_angles=beams60.copy())
        node.on_scan(
            2, np.ones(len(beams60), np.float32),
            angle_min=float(beams60[0]), angle_increment=inc,
        )

    def test_scan_rows_swapped_not_mutated(self, fleet_node, clutter_map,
                                           beams60, make_scan):
        """ADVICE round-4: ingest must never write into a row update() may
        be stacking — rows are swapped by reference."""
        node = fleet_node
        poses = _poses(clutter_map)
        _feed(node, poses, beams60, make_scan, clutter_map, 0.0)
        row_before = node._scan_rows[0]
        node.on_scan(0, make_scan(clutter_map, poses[0] + 0.1, beams60),
                     beam_angles=beams60)
        assert node._scan_rows[0] is not row_before  # new object, old intact

    def test_async_pipeline_and_sinks(self, clutter_map, beams60, make_scan):
        node = FleetNode(
            clutter_map,
            fleet_size=F,
            config=MCLConfig(
                max_particles=512, raycast_method="lut", angle_step=1,
                async_correction=True, async_depth=2,
            ),
            rng_seed=0,
        )
        seen = []
        node.add_sink(CallbackSink(
            lambda top, t, p: seen.append((top, p["poses"].shape)),
            topics=("fleet_pose",),
        ))
        poses = _poses(clutter_map)
        node.initialize_pose(poses)
        _feed(node, poses, beams60, make_scan, clutter_map, 0.0)
        t = 0.0
        node.update(now=t)
        harvested = 0
        for _ in range(8):
            t += 0.05
            got = node.update(now=t)
            if got is not None:
                harvested += 1
                node.publish_correction(t, got)
        assert harvested > 0
        assert all(shape == (F, 3) for _, shape in seen)
        err = np.linalg.norm(got[:, :2] - poses[:, :2], axis=1)
        assert (err < 0.5).all(), err

    def test_live_runner_drives_a_fleet(self, clutter_map, beams60,
                                        make_scan):
        """LiveRunner needs no fleet-specific changes (duck typing)."""
        node = FleetNode(
            clutter_map,
            fleet_size=F,
            config=MCLConfig(
                max_particles=256, raycast_method="lut", angle_step=1,
                timer_frequency=50.0,
            ),
            rng_seed=0,
        )
        poses = _poses(clutter_map)
        node.initialize_pose(poses)
        _feed(node, poses, beams60, make_scan, clutter_map, 0.0)

        stop = threading.Event()

        def odom_pump():  # high-rate odometry from another thread
            while not stop.is_set():
                for m in range(F):
                    node.on_odometry(m, *poses[m], 0.0, 0.0)
                time.sleep(0.002)

        pump = threading.Thread(target=odom_pump, daemon=True)
        pump.start()
        with LiveRunner(node) as runner:
            time.sleep(1.0)
        stop.set()
        pump.join(timeout=2.0)
        assert runner.corrections > 0
        cur = node.current_poses()
        assert np.linalg.norm(cur[:, :2] - poses[:, :2], axis=1).max() < 0.5
