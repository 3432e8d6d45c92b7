"""Live dual-rate loop + output-sink tests (CPU backend, real wall clock).

The reference runs a wall timer at timer_frequency Hz for MCL while
odometry callbacks arrive at 100-200 Hz on other threads (reference
src/particle_filter.cpp:154-165, :325-352). These tests drive the
LiveRunner the same way and assert the dual-rate contract: corrections
happen, the dead-reckoned pose advances BETWEEN corrections, and sinks
receive gated topic streams.
"""

import json
import threading
import time

import numpy as np
import pytest

from monte_carlo_localization_tpu.config import MCLConfig
from monte_carlo_localization_tpu.runtime import (
    CallbackSink,
    JsonlSink,
    LiveRunner,
    MCLNode,
    NpzSink,
)


def _make_node(clutter_map, beams60, make_scan, timer_hz=50.0, **cfg_kw):
    cfg = MCLConfig(
        max_particles=256,
        raycast_method="lut",
        lut_theta_bins=360,
        timer_frequency=timer_hz,
        angle_step=1,  # the test scan is already 60 beams
        **cfg_kw,
    )
    node = MCLNode(clutter_map, cfg, rng_seed=0)
    pose = np.array([10.0, 10.0, 0.5], np.float32)
    scan = make_scan(clutter_map, pose, beams60)
    node.initialize_pose(pose)
    node.on_scan(scan, beam_angles=beams60)
    # warm the jitted step so wall-clock tests don't measure XLA compiles
    node.update(now=0.0)
    node.update(now=0.01)
    node._last_update_time = None
    node.iters = 0
    return node, pose, scan


def test_live_runner_dual_rate(clutter_map, beams60, make_scan):
    node, pose, scan = _make_node(clutter_map, beams60, make_scan)

    events = []
    node.add_sink(CallbackSink(lambda top, t, p: events.append((top, t, p))))

    stop = threading.Event()

    def odom_feed():
        # constant forward motion at ~150 Hz, like a real odom stream
        t0 = time.monotonic()
        x = 10.0
        while not stop.is_set():
            t = time.monotonic() - t0
            node.on_odometry(10.0 + 0.5 * t, 10.0, 0.5, 0.5, 0.0, stamp=t)
            time.sleep(1 / 150)

    feeder = threading.Thread(target=odom_feed, daemon=True)
    with LiveRunner(node) as runner:
        feeder.start()
        time.sleep(1.2)
        stop.set()
        feeder.join(1.0)
    ticks, corrections = runner.ticks, runner.corrections

    assert corrections >= 3, f"only {corrections} corrections in 1.2 s"
    assert ticks >= corrections
    # the runner must respect the wall clock: no more ticks than the timer
    # frequency allows (plus scheduling slack)
    assert ticks <= 50 * 1.2 * 1.5 + 5

    # dual-rate contract: TF (tick-rate) events strictly outnumber pose
    # (correction-rate) events, and the dead-reckoned TF pose ADVANCES
    # between corrections (the tracker integrates odometry)
    tf = [(t, p["pose"]) for top, t, p in events if top == "tf"]
    poses = [(t, p["pose"]) for top, t, p in events if top == "pose"]
    assert len(tf) >= len(poses)
    assert len(tf) > 5
    # the scan is static (the robot truly sits at x=10), so each correction
    # legitimately snaps the pose back — the dual-rate signature is the
    # dead-reckoner ADVANCING between corrections: multiple increasing
    # tf-x steps, and a peak displaced from the anchor
    xs = np.array([p[0] for _, p in tf])
    assert (np.diff(xs) > 1e-4).sum() >= 3, "dead-reckoner never advanced"
    assert xs.max() > 10.0 + 0.01, "tracked pose never left the anchor"


def test_live_runner_skip_on_overrun(clutter_map, beams60, make_scan):
    # 1000 Hz timer on a CPU backend step forces overruns -> skips counted,
    # loop keeps up without backlog
    node, pose, scan = _make_node(clutter_map, beams60, make_scan,
                                  timer_hz=1000.0)
    with LiveRunner(node) as runner:
        time.sleep(0.6)
    assert runner.ticks > 0
    assert runner.skipped > 0, "1 kHz timer should overrun on CPU"


def test_jsonl_sink_roundtrip(tmp_path, clutter_map, beams60, make_scan):
    node, pose, scan = _make_node(clutter_map, beams60, make_scan)
    out = tmp_path / "stream.jsonl"
    node.add_sink(JsonlSink(out))
    now = 0.0
    for i in range(4):
        now += 0.1
        node.on_odometry(pose[0], pose[1], pose[2], 0.1, 0.0, stamp=now)
        p = node.update(now=now)
        node.publish_tick(now)
        if p is not None:
            node.publish_correction(now, p)
    node.close_sinks()
    lines = [json.loads(ln) for ln in out.read_text().splitlines()]
    topics = {ln["topic"] for ln in lines}
    assert {"tf", "odom", "pose", "particles"} <= topics
    tf = [ln for ln in lines if ln["topic"] == "tf"]
    assert len(tf[0]["pose"]) == 3
    cloud = [ln for ln in lines if ln["topic"] == "particles"][0]["cloud"]
    assert len(cloud) <= node.config.max_viz_particles


def test_npz_sink_and_gating(tmp_path, clutter_map, beams60, make_scan):
    node, pose, scan = _make_node(clutter_map, beams60, make_scan)
    out = tmp_path / "stream.npz"
    node.add_sink(NpzSink(out, topics=("pose",)))  # only poses wanted

    seen = []
    node.add_sink(CallbackSink(lambda top, t, p: seen.append(top),
                               topics=("tf",)))
    now = 0.0
    for i in range(3):
        now += 0.1
        p = node.update(now=now)
        node.publish_tick(now)
        if p is not None:
            node.publish_correction(now, p)
    node.close_sinks()
    data = NpzSink.load(out)
    assert "pose_pose" in data and data["pose_pose"].shape[1] == 3
    assert not any(k.startswith("tf_") for k in data), "gating leaked tf"
    assert set(seen) == {"tf"}


def test_viz_config_gates_corrections(clutter_map, beams60, make_scan):
    node, pose, scan = _make_node(clutter_map, beams60, make_scan, viz=False)
    seen = []
    node.add_sink(CallbackSink(lambda top, t, p: seen.append(top)))
    p = node.update(now=0.1)
    p = node.update(now=0.2)
    assert p is not None
    node.publish_correction(0.2, p)
    node.publish_tick(0.2)
    assert "pose" not in seen and "particles" not in seen
    assert "tf" in seen


def test_publish_odom_config_gates_odom(clutter_map, beams60, make_scan):
    node, pose, scan = _make_node(clutter_map, beams60, make_scan,
                                  publish_odom=False)
    seen = []
    node.add_sink(CallbackSink(lambda top, t, p: seen.append(top)))
    node.publish_tick(0.1)
    assert "odom" not in seen and "tf" in seen


def test_async_correction_pipeline(clutter_map, beams60, make_scan):
    """async_correction dispatches without blocking and harvests the pose
    on a later tick: corrections keep landing, at most one in flight, and
    the harvested poses are sane (SURVEY §7 hard-part 5)."""
    node, true_pose, scan = _make_node(
        clutter_map, beams60, make_scan, async_correction=True
    )
    poses = []
    t = 0.1
    for _ in range(40):
        node.on_scan(scan, beam_angles=beams60)
        p = node.update(now=t)
        if p is not None:
            poses.append(p)
        t += 0.02
        time.sleep(0.001)
    # drain the last in-flight correction
    for _ in range(20):
        p = node.update(now=t)
        t += 0.02
        if p is not None:
            poses.append(p)
            break
        time.sleep(0.005)
    assert len(poses) >= 5, "async pipeline produced too few corrections"
    assert node.stats.measurement_count >= len(poses)
    poses = np.asarray(poses)
    assert np.isfinite(poses).all()
    # the filter still localizes through the pipelined path
    err = np.linalg.norm(poses[-1][:2] - true_pose[:2])
    assert err < 0.3, poses[-1]


def test_async_chunked_live_localizes(clutter_map, beams60, make_scan):
    """live_chunk=4 micro-chunking through the REAL filter: every 4 ticks
    dispatch one step_many(4); the filter still localizes, every
    correction is counted, and poses stay finite."""
    node, true_pose, scan = _make_node(
        clutter_map, beams60, make_scan,
        async_correction=True, live_chunk=4,
    )
    poses = []
    t = 0.1
    for _ in range(60):
        node.on_scan(scan, beam_angles=beams60)
        p = node.update(now=t)
        if p is not None:
            poses.append(p)
        t += 0.02
        time.sleep(0.001)
    # drain whatever is still buffered/in flight
    for _ in range(20):
        p = node.update(now=t)
        t += 0.02
        if p is not None:
            poses.append(p)
        time.sleep(0.002)
    assert len(poses) >= 3, "chunked pipeline produced too few harvests"
    # corrections are counted per chunk member, not per harvest
    assert node.stats.measurement_count >= 4 * len(poses) - 4
    poses = np.asarray(poses)
    assert np.isfinite(poses).all()
    err = np.linalg.norm(poses[-1][:2] - true_pose[:2])
    assert err < 0.3, poses[-1]


def test_async_ignored_during_replay(clutter_map, beams60, make_scan):
    """replay() must stay synchronous even with async_correction on —
    sim-time replay has no wall clock for the pipeline to poll against."""
    from monte_carlo_localization_tpu.runtime import synthesize_trace

    tr = synthesize_trace(clutter_map, duration_s=1.0, num_beams=60, seed=3)
    cfg = MCLConfig(max_particles=256, raycast_method="lut",
                    lut_theta_bins=360, angle_step=1, async_correction=True)
    node = MCLNode(clutter_map, cfg, rng_seed=0)
    node.initialize_pose(tr.truth_pose[0])
    res = node.replay(tr)
    assert not node._inflight_q
    assert len(res.times) > 10
    assert res.rmse_xy is not None and res.rmse_xy < 0.3


def test_async_reinit_flushes_inflight(clutter_map, beams60, make_scan):
    """A re-initialization must drop queued async corrections: their poses
    describe the abandoned belief and would re-anchor the tracker at it."""
    node, true_pose, scan = _make_node(
        clutter_map, beams60, make_scan, async_correction=True
    )
    node.on_scan(scan, beam_angles=beams60)
    node.update(now=0.1)   # init tick
    node.update(now=0.12)  # dispatches (possibly harvests)
    node.update(now=0.14)
    new_pose = np.array([5.0, 5.0, 1.0], np.float32)
    node.initialize_pose(new_pose)
    assert not node._inflight_q, "re-init left stale corrections queued"
    # the next harvested pose comes from the NEW belief, not the old one
    for i in range(30):
        node.on_scan(scan, beam_angles=beams60)
        p = node.update(now=0.2 + i * 0.02)
        if p is not None:
            break
        time.sleep(0.002)
    assert p is not None
    # seeded at new_pose with a static scan from true_pose: the first
    # correction's cloud is still near the seed, far from the old belief
    assert np.linalg.norm(p[:2] - new_pose[:2]) < 1.5
    assert np.linalg.norm(p[:2] - true_pose[:2]) > 2.0


def test_live_chunk_requires_async(clutter_map):
    """live_chunk > 1 without async_correction must fail loudly at node
    construction — chunking only exists on the async dispatch path, and
    accepting the combination silently would leave every tick paying the
    full blocking dispatch the user asked to amortize."""
    with pytest.raises(ValueError, match="async_correction"):
        MCLNode(
            clutter_map,
            MCLConfig(max_particles=64, raycast_method="lut",
                      lut_theta_bins=360, live_chunk=4),
        )
