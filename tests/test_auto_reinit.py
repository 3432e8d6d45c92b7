"""Automatic kidnapped-robot recovery (Augmented-MCL monitor).

The reference has NO such detector — its README describes convergence-based
auto-init aspirationally and recovery is human-triggered via /clicked_point
(reference src/particle_filter.cpp:376-379). This engine adds the
Probabilistic Robotics §8.3 w_fast/w_slow quality monitor behind
``MCLConfig.auto_reinit``.
"""

import numpy as np

from monte_carlo_localization_tpu.config import MCLConfig
from monte_carlo_localization_tpu.runtime import MCLNode
from tests.conftest import synth_scan


def _free_pose(gm, frac_row, frac_col, theta):
    """A pose at a fractional position snapped to the nearest free cell."""
    free = np.asarray(gm.free_cells[: int(gm.num_free)])
    h, w = np.asarray(gm.occupancy).shape
    target = np.array([frac_row * h, frac_col * w])
    i = int(np.argmin(((free - target) ** 2).sum(axis=1)))
    x = free[i, 1] * gm.resolution + float(gm.origin_x)
    y = free[i, 0] * gm.resolution + float(gm.origin_y)
    return np.array([x, y, theta])


def _make_node(gm, **over):
    cfg = MCLConfig(
        max_particles=400,
        angle_step=1,
        raycast_method="lut",
        lut_theta_bins=180,
        auto_reinit=True,
        reinit_min_iters=8,
        reinit_patience=3,
        reinit_cooldown=30,
        seed=1,
        **over,
    )
    return MCLNode(gm, cfg)


def _run(node, beams, scan, t0, n, dt=0.05):
    t = t0
    for _ in range(n):
        t += dt
        node.on_scan(scan, beam_angles=beams)
        node.update(now=t)
    return t


def test_no_false_positive_on_consistent_scans(clutter_map, beams60):
    node = _make_node(clutter_map)
    pose = _free_pose(clutter_map, 0.3, 0.3, 0.2)
    scan = synth_scan(clutter_map, pose, beams60)
    node.on_scan(scan, beam_angles=beams60)
    node.initialize_pose(pose)
    _run(node, beams60, scan, 0.0, 40)
    assert node.auto_reinits == 0
    # still localized near the truth
    err = np.linalg.norm(np.asarray(node.inferred_pose)[:2] - pose[:2])
    assert err < 0.5


def test_auto_reinit_triggers_on_kidnap(clutter_map, beams60):
    node = _make_node(clutter_map)
    pose_a = _free_pose(clutter_map, 0.3, 0.3, 0.2)
    pose_b = _free_pose(clutter_map, 0.75, 0.75, 2.5)
    scan_a = synth_scan(clutter_map, pose_a, beams60)
    scan_b = synth_scan(clutter_map, pose_b, beams60)
    node.on_scan(scan_a, beam_angles=beams60)
    node.initialize_pose(pose_a)
    t = _run(node, beams60, scan_a, 0.0, 20)
    assert node.auto_reinits == 0

    # "kidnap": scans teleport to pose B while the cloud sits at pose A.
    # The monitor needs patience(3) bad corrections after the w_fast EMA
    # collapses; probe right after so the re-inited cloud is still spread.
    t = _run(node, beams60, scan_b, t, 5)
    assert node.auto_reinits >= 1
    # re-init spread the cloud back out over free space (vs the ~0.1 m
    # converged cloud before the kidnap)
    spread = np.asarray(node.state.particles)[:, :2].std(axis=0)
    assert (spread > 0.5).all()


def test_monitor_off_by_default():
    assert MCLConfig().auto_reinit is False
