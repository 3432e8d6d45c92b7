"""Golden-trace parity: CPU reference harness vs the JAX engine.

Replays the committed config-#1 trace (real recorded SLAM map,
traces/config1_map_1753950572.npz) through both the reference-faithful CPU
harness (baseline/cpu_reference.py) and the jitted engine, asserting both
track ground truth. This is the cross-implementation evidence SURVEY §4
prescribes (the reference itself is validated by trace replay).
"""

from pathlib import Path

import numpy as np
import pytest

from monte_carlo_localization_tpu.baseline import (
    replay_cpu_reference,
    trajectory_rmse,
)
from monte_carlo_localization_tpu.config import MCLConfig
from monte_carlo_localization_tpu.mapping import load_map
from monte_carlo_localization_tpu.runtime.node import MCLNode
from monte_carlo_localization_tpu.runtime.trace import Trace

REPO = Path(__file__).resolve().parents[1]
TRACE = REPO / "traces" / "config1_map_1753950572.npz"
MAP = REPO / "maps" / "map_1753950572.yaml"


@pytest.fixture(scope="module")
def golden():
    if not TRACE.exists() or not MAP.exists():
        pytest.skip("golden trace / map assets not present")
    return load_map(MAP), Trace.load(TRACE)


def test_cpu_reference_tracks_truth(golden):
    gm, tr = golden
    cfg = MCLConfig(max_particles=800, angle_step=18)
    times, poses, stats, ups = replay_cpu_reference(
        gm, tr, cfg, seed=0, max_corrections=80
    )
    rx, rt = trajectory_rmse(times, poses, tr.truth_t, tr.truth_pose)
    assert rx < 0.10, f"CPU reference rmse_xy={rx}"
    assert rt < 0.10, f"CPU reference rmse_theta={rt}"
    assert stats.ray_casting_time > 0  # phases instrumented


def test_engine_matches_cpu_reference_on_trace(golden):
    gm, tr = golden
    cfg = MCLConfig(max_particles=800, angle_step=18, raycast_method="lut")
    node = MCLNode(gm, cfg, rng_seed=0)
    node.initialize_pose(tr.truth_pose[0])

    # replay the first 80 scans (plus interleaved odometry)
    short = Trace(
        odom_t=tr.odom_t,
        odom_pose=tr.odom_pose,
        odom_twist=tr.odom_twist,
        scan_t=tr.scan_t[:80],
        scan_ranges=tr.scan_ranges[:80],
        beam_angles=tr.beam_angles,
        truth_t=tr.truth_t,
        truth_pose=tr.truth_pose,
    )
    res = node.replay(short)
    assert res.rmse_xy is not None and res.rmse_xy < 0.12, res.rmse_xy
    assert res.rmse_theta < 0.10, res.rmse_theta

    # cross-implementation agreement: both trajectories near truth means
    # they are near each other; make that explicit too
    times_c, poses_c, _, _ = replay_cpu_reference(
        gm, tr, MCLConfig(max_particles=800, angle_step=18), seed=1,
        max_corrections=80,
    )
    k = min(len(times_c), len(res.times))
    cross = np.sqrt(
        ((poses_c[:k, :2] - res.poses[-k:, :2]) ** 2).sum(axis=1).mean()
    )
    assert cross < 0.2, f"cross-implementation trajectory RMSE {cross}"


class TestCompactLutReplay:
    """End-to-end replay quality THROUGH the row-compacted LUT path
    (VERDICT round-2 items 5/7-weak): the golden-trace acceptance above
    never exercises ``with_compact_range_lut`` (its map is tiny). Here a
    map with genuine far cells is forced onto the compact path
    (MCL_LUT_DENSE_MAX=1) and a synthesized trace must replay with the
    same quality as the dense path. The committed
    ``traces/config4_basement_fixed.npz`` trace runs the same acceptance
    at full scale on real hardware (recorded in BENCHES.md)."""

    def test_compact_lut_pallas_replay_tracks_truth(self, monkeypatch):
        from monte_carlo_localization_tpu.mapping import (
            random_obstacle_world,
        )
        from monte_carlo_localization_tpu.runtime.trace import (
            synthesize_trace,
        )

        gm = random_obstacle_world(
            height=400, width=400, num_obstacles=10, seed=5,
            max_range_meters=4.0,
        )
        trace = synthesize_trace(
            gm, duration_s=6.0, num_beams=60, seed=3, speed=1.0
        )
        short = Trace(
            odom_t=trace.odom_t,
            odom_pose=trace.odom_pose,
            odom_twist=trace.odom_twist,
            scan_t=trace.scan_t[:40],
            scan_ranges=trace.scan_ranges[:40],
            beam_angles=trace.beam_angles,
            truth_t=trace.truth_t,
            truth_pose=trace.truth_pose,
        )

        def run(method):
            cfg = MCLConfig(
                max_particles=512, angle_step=1, raycast_method=method
            )
            node = MCLNode(gm, cfg, rng_seed=0)
            node.initialize_pose(trace.truth_pose[0])
            return node, node.replay(short)

        # reference quality on this scenario: the (LUT-free) EDT backend
        _, res_sphere = run("sphere")

        monkeypatch.setenv("MCL_LUT_DENSE_MAX", "1")
        node, res = run("lut_pallas")
        gmap = node.filter.grid_map
        assert gmap.lut_row_map is not None, "compact path not engaged"
        # real compaction: strictly fewer rows than cells
        n_rows = int(np.asarray(gmap.lut_row_map).max()) + 1
        assert n_rows < gm.height * gm.width
        # compact-LUT quality matches the backend-independent floor of
        # this scenario (odometry drift dominates a 40-correction window)
        assert res.rmse_xy is not None and res.rmse_xy < 0.25, res.rmse_xy
        assert res.rmse_xy < 1.5 * res_sphere.rmse_xy + 0.02, (
            res.rmse_xy, res_sphere.rmse_xy,
        )
        assert res.rmse_theta < 0.10, res.rmse_theta

    def test_compact_u16_lut_pallas_replay_tracks_truth(self, monkeypatch):
        """The u16 (long-range) twin: max_range_px > 254 forces u16
        entries, and MCL_LUT_DENSE_MAX=1 forces the compact path — i.e.
        the NATIVE C++ compact builder + the (X, 2, 128) tile-shaped
        upload (a flat upload makes XLA clone the multi-GB LUT in-program
        on real maps; basement@25.6 m OOM'd HBM before the reshape). The
        committed ``traces/u16_basement.npz`` runs this acceptance at
        full scale on hardware (BENCHES.md)."""
        from monte_carlo_localization_tpu.mapping import (
            random_obstacle_world,
        )
        from monte_carlo_localization_tpu.native import (
            native_build_compact_range_lut,
        )
        from monte_carlo_localization_tpu.runtime.trace import (
            synthesize_trace,
        )

        if native_build_compact_range_lut(
            np.zeros((4, 4), bool), 4, 300,
            np.zeros(16, np.int32), 256, dtype=np.uint16,
        ) is None:
            pytest.skip("native builder unavailable (no g++)")

        gm = random_obstacle_world(
            height=300, width=300, num_obstacles=8, seed=6,
            max_range_meters=15.0,  # 300 px at 0.05 m/px -> u16
        )
        assert gm.max_range_px > 254
        trace = synthesize_trace(
            gm, duration_s=6.0, num_beams=60, seed=4, speed=1.0
        )
        short = Trace(
            odom_t=trace.odom_t,
            odom_pose=trace.odom_pose,
            odom_twist=trace.odom_twist,
            scan_t=trace.scan_t[:40],
            scan_ranges=trace.scan_ranges[:40],
            beam_angles=trace.beam_angles,
            truth_t=trace.truth_t,
            truth_pose=trace.truth_pose,
        )
        monkeypatch.setenv("MCL_LUT_DENSE_MAX", "1")
        cfg = MCLConfig(
            max_particles=512, angle_step=1, raycast_method="lut_pallas"
        )
        node = MCLNode(gm, cfg, rng_seed=0)
        node.initialize_pose(trace.truth_pose[0])
        res = node.replay(short)
        gmap = node.filter.grid_map
        assert gmap.lut_row_map is not None, "compact path not engaged"
        assert np.asarray(gmap.range_lut).dtype == np.uint16
        # the tile-shaped upload (not a flat (rows, stride) buffer)
        assert gmap.range_lut.shape[-2:] == (2, 128)
        assert res.rmse_xy is not None and res.rmse_xy < 0.25, res.rmse_xy
        assert res.rmse_theta < 0.10, res.rmse_theta
