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
