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
    over.setdefault("max_particles", 400)
    cfg = MCLConfig(
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
    assert MCLConfig().reinit_mode == "reinit"


class TestInjection:
    """reinit_mode="inject": true Augmented MCL (VERDICT round-4 item 2) —
    partial random-particle injection instead of all-or-nothing re-init."""

    def test_no_injection_on_consistent_scans(self, clutter_map, beams60):
        node = _make_node(clutter_map, reinit_mode="inject")
        pose = _free_pose(clutter_map, 0.3, 0.3, 0.2)
        scan = synth_scan(clutter_map, pose, beams60)
        node.on_scan(scan, beam_angles=beams60)
        node.initialize_pose(pose)
        _run(node, beams60, scan, 0.0, 40)
        # healthy tracking: w_fast >= w_slow, fraction pinned at ~0
        assert node._inject_fraction < 0.02
        assert node.auto_reinits == 0
        err = np.linalg.norm(np.asarray(node.inferred_pose)[:2] - pose[:2])
        assert err < 0.5

    def test_injection_recovers_kidnap_without_full_reinit(
        self, clutter_map, beams60
    ):
        # 2000 particles: a winning injected hypothesis needs ~0.5 m /
        # ~0.2 rad of pose B (measured basin on this map) — at a 0.3
        # injection fraction that is ~8%/correction to land one; 400
        # particles under-sample the map (the hardware bench runs 100k)
        node = _make_node(
            clutter_map, reinit_mode="inject", max_particles=2000
        )
        pose_a = _free_pose(clutter_map, 0.3, 0.3, 0.2)
        pose_b = _free_pose(clutter_map, 0.75, 0.75, 2.5)
        scan_a = synth_scan(clutter_map, pose_a, beams60)
        scan_b = synth_scan(clutter_map, pose_b, beams60)
        node.on_scan(scan_a, beam_angles=beams60)
        node.initialize_pose(pose_a)
        t = _run(node, beams60, scan_a, 0.0, 20)
        assert node.inject_steps == 0

        recovered = False
        for _ in range(120):
            t += 0.05
            node.on_scan(scan_b, beam_angles=beams60)
            est = node.update(now=t)
            if est is not None and np.linalg.norm(
                np.asarray(est)[:2] - pose_b[:2]
            ) < 0.5:
                recovered = True
                break
        assert node.auto_reinits == 0  # never a full re-init in this mode
        assert node.inject_steps > 0  # the quality collapse drove injection
        assert recovered, np.linalg.norm(
            np.asarray(node.inferred_pose)[:2] - pose_b[:2]
        )

    def test_fraction_capped(self, clutter_map, beams60):
        node = _make_node(
            clutter_map, reinit_mode="inject", reinit_inject_max=0.15
        )
        pose_a = _free_pose(clutter_map, 0.3, 0.3, 0.2)
        pose_b = _free_pose(clutter_map, 0.75, 0.75, 2.5)
        scan_a = synth_scan(clutter_map, pose_a, beams60)
        scan_b = synth_scan(clutter_map, pose_b, beams60)
        node.on_scan(scan_a, beam_angles=beams60)
        node.initialize_pose(pose_a)
        t = _run(node, beams60, scan_a, 0.0, 12)
        _run(node, beams60, scan_b, t, 20)
        assert 0.0 <= node._inject_fraction <= 0.15

    def test_step_inject_fraction_semantics(self, clutter_map, beams60):
        """inject_fraction=1.0 re-spreads the cloud over free space in one
        correction-sized draw; 0.0 keeps the converged cloud tight."""
        import monte_carlo_localization_tpu as mcl

        pf = mcl.ParticleFilter(
            clutter_map,
            mcl.MCLConfig(
                max_particles=512, raycast_method="lut",
                lut_theta_bins=180, angle_step=1,
            ),
            beam_angles=beams60,
        )
        pose = _free_pose(clutter_map, 0.3, 0.3, 0.2)
        scan = synth_scan(clutter_map, pose, beams60)
        state = pf.init_pose(pose, seed=0)
        state, _ = pf.step(state, np.zeros(3), scan, inject_fraction=0.0)
        tight = np.asarray(state.particles)[:, :2].std(axis=0)
        assert (tight < 1.0).all()
        state, _ = pf.step(state, np.zeros(3), scan, inject_fraction=1.0)
        spread = np.asarray(state.particles)[:, :2].std(axis=0)
        assert (spread > 1.0).all()  # uniform over the whole free space

    def test_bad_mode_rejected(self, clutter_map):
        import pytest

        import monte_carlo_localization_tpu as mcl

        with pytest.raises(ValueError, match="reinit mode"):
            mcl.ParticleFilter(
                clutter_map, mcl.MCLConfig(reinit_mode="nope")
            )
