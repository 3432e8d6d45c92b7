"""Async-pipeline timing accounting (VERDICT round 1, item 6).

With ``async_correction`` at depth 4, every harvested correction used to
add its FULL queue residency (dispatch -> harvest, ~depth x the device
step time) to ``TimingStats.total_mcl_time``, and that inflated
``avg_total_ms`` then drove the anchor's delay compensation ~4x too far
(reference src/particle_filter.cpp:790-806 compensates by the per-step
compute time only).

The fixed accounting keeps the two times distinct:

* ``avg_total_ms`` (throughput stats) accumulates the MARGINAL time per
  correction — in a full pipeline it converges to the true device step
  time, independent of queue depth;
* the anchor's delay compensation receives each correction's exact
  STALENESS (now - its own dispatch time) with factor 1.0, because the
  scan behind a depth-4 pose really is ~4 steps old.

These tests emulate the device with a fake serial executor and a fake
monotonic clock, so the timing is exact and the assertions are tight.
"""

from types import SimpleNamespace

import numpy as np
import pytest

from monte_carlo_localization_tpu.config import MCLConfig
from monte_carlo_localization_tpu.runtime import node as node_mod
from monte_carlo_localization_tpu.runtime.node import MCLNode

STEP_S = 0.100  # fake device time per correction (serial executor)
TICK_S = 0.025  # update-tick period << STEP_S so the pipeline stays full


class FakeClock:
    def __init__(self):
        self.now = 100.0

    def monotonic(self) -> float:
        return self.now

    def advance(self, dt: float) -> float:
        self.now += dt
        return self.now


class FakePose(np.ndarray):
    """Pose array that behaves like an async device buffer: ``is_ready``
    consults the fake clock, ``block_until_ready`` advances it to the
    completion time (modeling a blocking readback)."""

    clock: FakeClock
    done_time: float

    def is_ready(self) -> bool:
        return self.clock.now >= self.done_time

    def block_until_ready(self) -> "FakePose":
        self.clock.now = max(self.clock.now, self.done_time)
        return self


class FakeSerialDevice:
    """filter.step stand-in: corrections execute serially, each taking
    ``STEP_S`` of fake-clock time after the previous one finishes."""

    def __init__(self, clock: FakeClock):
        self.clock = clock
        self.last_done = clock.now
        self.dispatches = 0

    def step(self, state, action, ranges):
        self.dispatches += 1
        done = max(self.clock.now, self.last_done) + STEP_S
        self.last_done = done
        pose = np.array([1.25, 2.25, 0.3], np.float64).view(FakePose)
        pose.clock = self.clock
        pose.done_time = done
        return SimpleNamespace(log_quality=np.float64(-1.0)), pose


@pytest.fixture
def async_node(box_map, monkeypatch):
    cfg = MCLConfig(
        max_particles=64, async_correction=True, async_depth=4,
        raycast_method="lut",
    )
    node = MCLNode(box_map, cfg, rng_seed=0)
    clock = FakeClock()
    monkeypatch.setattr(
        node_mod, "time", SimpleNamespace(monotonic=clock.monotonic)
    )
    node.filter = FakeSerialDevice(clock)
    node.lidar_initialized = True
    node.downsampled_ranges = np.full(16, 2.0, np.float32)
    node.on_odometry(0.0, 0.0, 0.0, 1.0, 0.0, stamp=clock.now)
    return node, clock


def _run_ticks(node, clock, n):
    for _ in range(n):
        node.update(now=clock.advance(TICK_S))


def test_avg_total_ms_is_step_time_not_depthx(async_node):
    """At depth 4 with the pipeline full, avg_total_ms ~= the device step
    time (100 ms here) — the pre-fix accounting recorded the queue
    residency, ~depth x step = ~400 ms."""
    node, clock = async_node
    _run_ticks(node, clock, 40)  # fill the pipeline, reach steady state
    node.stats.reset()
    _run_ticks(node, clock, 60)
    assert node.stats.measurement_count >= 10
    avg = node.stats.avg_total_ms
    assert avg == pytest.approx(STEP_S * 1e3, rel=0.15), avg
    # the old-bug signature: queue residency ~ depth x step time
    assert avg < 2 * STEP_S * 1e3


def test_anchor_gets_exact_staleness_with_unit_factor(async_node):
    """Delay compensation receives each pose's true staleness (~depth x
    step in a full pipeline — the scan really is that old) with NO 1.5x
    heuristic factor on top."""
    node, clock = async_node
    calls = []
    real_anchor = node.tracker.anchor

    def spy(pose, **kw):
        calls.append(kw)
        return real_anchor(pose, **kw)

    node.tracker.anchor = spy
    _run_ticks(node, clock, 100)
    steady = calls[len(calls) // 2:]
    assert steady
    for kw in steady:
        assert kw["delay_compensation_factor"] == 1.0
        # full pipeline: staleness ~= depth x step (between 2x and 6x)
        assert 2 * STEP_S * 1e3 < kw["avg_mcl_ms"] < 6 * STEP_S * 1e3


class FakeChunkDevice:
    """filter stand-in for ``live_chunk``: ``step_many`` executes chunks
    serially, each taking ``chunk_s`` of fake-clock time — modeling the
    amortization (one dispatch overhead per K corrections)."""

    def __init__(self, clock: FakeClock, chunk_s: float = STEP_S):
        self.clock = clock
        self.chunk_s = chunk_s
        self.last_done = clock.now
        self.dispatches = 0
        self.seen_actions: list[np.ndarray] = []

    def step_many(self, state, actions, scans):
        assert actions.shape[0] == scans.shape[0]
        self.dispatches += 1
        self.seen_actions.append(np.asarray(actions, np.float64).copy())
        done = max(self.clock.now, self.last_done) + self.chunk_s
        self.last_done = done
        poses = np.tile(
            np.array([1.25, 2.25, 0.3], np.float64), (actions.shape[0], 1)
        ).view(FakePose)
        poses.clock = self.clock
        poses.done_time = done
        return SimpleNamespace(log_quality=np.float64(-1.0)), poses


class CountingSink:
    def __init__(self):
        self.n_poses = 0

    def wants(self, topic: str) -> bool:
        return topic == "pose"

    def publish(self, topic, t, payload):
        self.n_poses += 1

    def close(self):
        pass


@pytest.fixture
def chunked_node(box_map, monkeypatch):
    cfg = MCLConfig(
        max_particles=64, async_correction=True, async_depth=2,
        live_chunk=4, raycast_method="lut",
    )
    node = MCLNode(box_map, cfg, rng_seed=0)
    clock = FakeClock()
    monkeypatch.setattr(
        node_mod, "time", SimpleNamespace(monotonic=clock.monotonic)
    )
    node.filter = FakeChunkDevice(clock)
    node.lidar_initialized = True
    node.downsampled_ranges = np.full(16, 2.0, np.float32)
    node.on_odometry(0.0, 0.0, 0.0, 1.0, 0.0, stamp=clock.now)
    return node, clock


def test_chunked_dispatch_every_k_ticks(chunked_node):
    """K=4 ticks buffer into one step_many dispatch; every correction of
    every harvested chunk reaches the outputs exactly once (sinks for the
    superseded ones, the returned pose for the freshest)."""
    node, clock = chunked_node
    sink = CountingSink()
    node.add_sink(sink)
    returned = 0
    for _ in range(40):
        if node.update(now=clock.advance(TICK_S)) is not None:
            returned += 1
    dev = node.filter
    # 40 ticks / K=4 -> ~10 chunks (modulo pipeline fill)
    assert 8 <= dev.dispatches <= 10, dev.dispatches
    # every harvested correction surfaced exactly once
    harvested = node.stats.measurement_count
    assert harvested % 4 == 0 and harvested >= 4 * (dev.dispatches - 2)
    assert sink.n_poses + returned == harvested
    # per-tick actions: v=1.0 x TICK_S each, never doubled or dropped
    for a in dev.seen_actions:
        np.testing.assert_allclose(a[:, 0], TICK_S, rtol=1e-6)


def test_chunked_avg_total_ms_amortizes(chunked_node):
    """Marginal-time accounting: a full pipeline records ~chunk_s per K
    corrections -> avg_total_ms ~= chunk_s / K, the amortized rate."""
    node, clock = chunked_node
    for _ in range(24):
        node.update(now=clock.advance(TICK_S))
    node.stats.reset()
    for _ in range(80):
        node.update(now=clock.advance(TICK_S))
    assert node.stats.measurement_count >= 16
    avg = node.stats.avg_total_ms
    assert avg == pytest.approx(STEP_S * 1e3 / 4, rel=0.25), avg


def test_chunked_merge_preserves_displacement(chunked_node):
    """The 2K buffer cap (a safety net — backpressure via the blocking
    harvest normally keeps the buffer ~K) merges the two OLDEST ticks by
    summing their actions, so odometry displacement is never dropped."""
    node, clock = chunked_node
    K = node.config.live_chunk
    node._last_update_time = clock.now  # first update() tick only primes dt
    # pre-fill the buffer to the cap, each tick carrying 0.025 m forward
    scan = np.full(16, 2.0, np.float32)
    node._chunk_buf = [
        (np.array([TICK_S, 0.0, 0.0], np.float32), scan.copy())
        for _ in range(2 * K)
    ]
    pre = sum(float(a[0]) for a, _ in node._chunk_buf)
    node.update(now=clock.advance(TICK_S))  # one more tick: triggers merge
    dispatched = sum(a[:, 0].sum() for a in node.filter.seen_actions)
    buffered = sum(float(a[0]) for a, _ in node._chunk_buf)
    assert len(node._chunk_buf) <= 2 * K
    # merged entry carries BOTH ticks' displacement: nothing lost
    assert dispatched + buffered == pytest.approx(
        pre + TICK_S, rel=1e-5
    ), (dispatched, buffered)
    # the merged (doubled) action sits at the front of what was dispatched
    assert node.filter.seen_actions, "cap should not block dispatch"
    assert node.filter.seen_actions[0][0, 0] == pytest.approx(2 * TICK_S)


def test_sync_path_accounting_unchanged(box_map, monkeypatch):
    """The blocking path still records the full per-correction wall time
    and compensates with avg_total_ms x the configured factor."""
    cfg = MCLConfig(max_particles=64, raycast_method="lut")
    node = MCLNode(box_map, cfg, rng_seed=0)
    calls = []
    real_anchor = node.tracker.anchor

    def spy(pose, **kw):
        calls.append(kw)
        return real_anchor(pose, **kw)

    node.tracker.anchor = spy
    node.on_scan(
        np.full(16, 2.0, np.float32),
        beam_angles=np.linspace(-1.5, 1.5, 16).astype(np.float32),
    )
    node.on_odometry(0.0, 0.0, 0.0, 0.5, 0.0, stamp=0.0)
    t = 1000.0
    for _ in range(4):
        t += 0.05
        node.update(now=t)
    assert node.stats.measurement_count >= 3
    assert node.stats.avg_total_ms > 0
    assert calls
    assert calls[-1]["delay_compensation_factor"] == pytest.approx(
        node.config.delay_compensation_factor
    )
