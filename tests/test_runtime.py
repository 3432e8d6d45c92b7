import numpy as np
import pytest

from monte_carlo_localization_tpu.config import MCLConfig
from monte_carlo_localization_tpu.runtime import (
    MCLNode,
    OdometryTracker,
    Trace,
    synthesize_trace,
)


class TestOdometryTracker:
    def test_inactive_before_anchor(self):
        tr = OdometryTracker()
        tr.on_odometry(1, 2, 0.1, 0.5, 0.0)
        assert tr.snapshot().pose is None
        assert not tr.active

    def test_anchor_and_delta(self):
        """odom_pose = ref_pose + (current_odom - ref_odom), raw component
        delta (reference :1004-1013)."""
        tr = OdometryTracker()
        tr.on_odometry(10.0, 5.0, 0.2, 1.0, 0.0)
        tr.anchor(np.array([100.0, 50.0, 1.0]))
        tr.on_odometry(10.5, 5.1, 0.25, 1.0, 0.0)
        pose = tr.snapshot().pose
        np.testing.assert_allclose(pose, [100.5, 50.1, 1.05], atol=1e-12)

    def test_delay_compensation(self):
        """Anchor advanced along inferred heading by v*delay*factor
        (reference :790-806)."""
        tr = OdometryTracker()
        tr.on_odometry(0, 0, 0, 2.0, 0.5)  # v=2 m/s, omega=0.5
        anchored = tr.anchor(
            np.array([1.0, 1.0, 0.0]),
            avg_mcl_ms=100.0,
            delay_compensation_factor=1.5,
        )
        # ds = 2.0 * 0.1 * 1.5 = 0.3 along theta=0; dth = 0.5*0.1*1.5
        np.testing.assert_allclose(anchored, [1.3, 1.0, 0.075], atol=1e-12)

    def test_priority_chain(self):
        tr = OdometryTracker(max_pose_range=100.0)
        # nothing -> origin
        np.testing.assert_array_equal(tr.current_pose(None), np.zeros(3))
        # last odom pose only
        tr.on_odometry(3, 4, 0.5, 0, 0)
        np.testing.assert_allclose(tr.current_pose(None), [3, 4, 0.5])
        # particle mean beats last odom
        np.testing.assert_allclose(
            tr.current_pose(None, particle_mean=np.array([1, 1, 0.0])), [1, 1, 0]
        )
        # inferred beats particle mean
        np.testing.assert_allclose(
            tr.current_pose(np.array([7, 8, 0.1]), np.array([1, 1, 0.0])),
            [7, 8, 0.1],
        )
        # tracked beats inferred
        tr.anchor(np.array([50, 50, 0.0]))
        np.testing.assert_allclose(
            tr.current_pose(np.array([7, 8, 0.1])), [50, 50, 0]
        )
        # invalid tracked (out of range) falls through to inferred
        tr.anchor(np.array([5000.0, 0.0, 0.0]))
        np.testing.assert_allclose(
            tr.current_pose(np.array([7, 8, 0.1])), [7, 8, 0.1]
        )

    def test_thread_safety_smoke(self):
        import threading

        tr = OdometryTracker()
        tr.anchor(np.zeros(3))
        stop = []

        def pump():
            i = 0
            while not stop:
                tr.on_odometry(i * 0.01, 0, 0, 1.0, 0.0)
                i += 1

        t = threading.Thread(target=pump)
        t.start()
        for _ in range(200):
            tr.anchor(np.array([1.0, 2.0, 3.0]))
            tr.current_pose(None)
        stop.append(1)
        t.join()


class TestTrace:
    def test_roundtrip(self, tmp_path, clutter_map):
        tr = synthesize_trace(clutter_map, duration_s=1.0, num_beams=180, seed=0)
        p = tmp_path / "t.npz"
        tr.save(p)
        tr2 = Trace.load(p)
        np.testing.assert_array_equal(tr.scan_ranges, tr2.scan_ranges)
        np.testing.assert_array_equal(tr.odom_pose, tr2.odom_pose)
        np.testing.assert_array_equal(tr.beam_angles, tr2.beam_angles)
        assert tr2.map_name == clutter_map.name
        assert tr2.truth_pose is not None

    def test_synth_stays_in_free_space(self, clutter_map):
        tr = synthesize_trace(clutter_map, duration_s=3.0, num_beams=90, seed=2)
        gm = clutter_map
        gx = ((tr.truth_pose[:, 0] - gm.origin_x) / gm.resolution).astype(int)
        gy = ((tr.truth_pose[:, 1] - gm.origin_y) / gm.resolution).astype(int)
        occupied = np.asarray(gm.occupied)
        assert not occupied[gy, gx].any(), "simulated car drove through a wall"

    def test_odom_drifts_from_truth(self, clutter_map):
        tr = synthesize_trace(clutter_map, duration_s=3.0, num_beams=90, seed=2)
        # odometry is in its own frame, starting at identity
        np.testing.assert_allclose(tr.odom_pose[0], [0, 0, 0], atol=0.05)


class TestMCLNode:
    @pytest.fixture(scope="class")
    def trace(self, clutter_map):
        return synthesize_trace(
            clutter_map, duration_s=4.0, num_beams=1080, seed=1
        )

    def test_replay_tracks_truth(self, clutter_map, trace):
        node = MCLNode(clutter_map, MCLConfig(max_particles=1500))
        node.initialize_pose(trace.truth_pose[0])
        res = node.replay(trace)
        assert len(res.times) > 50
        assert res.rmse_xy is not None and res.rmse_xy < 0.12
        assert res.rmse_theta < 0.08

    def test_replay_chained_matches_live_replay(self, clutter_map, trace):
        """The on-device chained replay (step_many, throughput path) tracks
        truth as well as the per-dispatch live replay: same odometry-derived
        actions, same filter — only the dispatch granularity differs."""
        node = MCLNode(clutter_map, MCLConfig(max_particles=1500))
        node.initialize_pose(trace.truth_pose[0])
        res = node.replay_chained(trace, chunk=32)
        assert len(res.times) == len(trace.scan_t)
        assert res.rmse_xy is not None and res.rmse_xy < 0.12
        assert res.rmse_theta < 0.08
        # node state advanced: a follow-up live update keeps working
        node.on_scan(trace.scan_ranges[-1], beam_angles=trace.beam_angles)
        node.update(now=0.0)
        pose = node.update(now=0.04)
        assert pose is not None and np.isfinite(pose).all()

    def test_dual_rate_tracked_pose(self, clutter_map, trace):
        node = MCLNode(clutter_map, MCLConfig(max_particles=1000))
        node.initialize_pose(trace.truth_pose[0])
        res = node.replay(trace)
        # tracked (dead-reckoned) poses should also hug the truth
        tp = np.stack(
            [
                np.interp(res.times, trace.truth_t, trace.truth_pose[:, i])
                for i in range(2)
            ],
            axis=1,
        )
        rmse = np.sqrt(((res.tracked[:, :2] - tp) ** 2).sum(1).mean())
        assert rmse < 0.15

    def test_scan_downsampling(self, clutter_map):
        node = MCLNode(clutter_map, MCLConfig(angle_step=18))
        ranges = np.linspace(1, 2, 1080).astype(np.float32)
        node.on_scan(ranges, angle_min=-2.35, angle_increment=4.7 / 1079)
        assert node.downsampled_ranges.shape == (60,)
        assert node.filter.beam_angles.shape == (60,)

    def test_update_without_scan_is_noop(self, clutter_map):
        node = MCLNode(clutter_map, MCLConfig(max_particles=100))
        assert node.update(now=0.0) is None  # timer init tick
        assert node.update(now=0.01) is None  # no scan yet
        assert node.iters == 0

    def test_huge_dt_skipped(self, clutter_map, beams60):
        node = MCLNode(clutter_map, MCLConfig(max_particles=100))
        node.on_scan(np.ones(1080, np.float32), beam_angles=np.linspace(-2.35, 2.35, 1080))
        assert node.update(now=0.0) is None
        assert node.update(now=5.0) is None  # dt > 1s skip (reference :750)
        assert node.update(now=5.01) is not None

    def test_particle_cloud_size(self, clutter_map):
        node = MCLNode(clutter_map, MCLConfig(max_particles=500, max_viz_particles=60))
        cloud = node.particle_cloud()
        assert cloud.shape == (60, 3)

    def test_base_link_offset(self, clutter_map):
        cfg = MCLConfig(max_particles=100, lidar_offset_x=0.288)
        node = MCLNode(clutter_map, cfg)
        node.initialize_pose(np.array([5.0, 5.0, 0.0]))
        bl = node.base_link_pose()
        np.testing.assert_allclose(bl, [5.0 - 0.288, 5.0, 0.0], atol=1e-9)
