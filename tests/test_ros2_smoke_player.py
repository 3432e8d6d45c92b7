"""docker/ros2_smoke.py under the suite (VERDICT round-4 item 7).

The real-ROS2 validation container has never executed on this Docker-less
box; until it does, the smoke player must at least run end-to-end against
a stubbed rclpy so it cannot rot. The stub implements an in-memory topic
bus with a fake MCL bridge on the far side: it latches /map, echoes every
/scan as a noisy inferred pose at the trace's CURRENT truth, and the
player's /map wait, playback pacing, receipt-relative timestamping
(ADVICE round 4) and RMSE gate all execute for real.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


class _NS:
    """Auto-vivifying attribute namespace (duck-typed ROS message)."""

    def __getattr__(self, name):
        v = _NS()
        object.__setattr__(self, name, v)
        return v


class _Bus:
    """In-memory pub/sub bus shared by the stub node handles."""

    def __init__(self):
        self.subs = {}  # topic -> [callback]
        self.latched = {}  # topic -> last message (TRANSIENT_LOCAL analogue)
        self.pending = []  # deferred callbacks drained by spin_once

    def publish(self, topic, msg):
        self.latched[topic] = msg
        for cb in self.subs.get(topic, []):
            self.pending.append((cb, msg))

    def subscribe(self, topic, cb, latched=False):
        self.subs.setdefault(topic, []).append(cb)
        if latched and topic in self.latched:
            self.pending.append((cb, self.latched[topic]))

    def drain_one(self):
        if self.pending:
            cb, msg = self.pending.pop(0)
            cb(msg)
            return True
        return False


def _install_rclpy_stub(bus):
    """Install just enough of rclpy + the three msg packages for
    docker/ros2_smoke.py to import and run."""

    class _Pub:
        def __init__(self, topic):
            self.topic = topic

        def publish(self, msg):
            bus.publish(self.topic, msg)

    class Node:
        def __init__(self, name):
            self._name = name

        def create_publisher(self, _type, topic, _qos):
            return _Pub(topic)

        def create_subscription(self, _type, topic, cb, qos):
            latched = getattr(qos, "durability", None) == "transient_local"
            bus.subscribe(topic, cb, latched=latched)

        def get_logger(self):
            log = types.SimpleNamespace()
            log.info = lambda *_a, **_k: None
            return log

    rclpy = types.ModuleType("rclpy")
    rclpy.init = lambda *a, **k: None
    rclpy.shutdown = lambda *a, **k: None
    rclpy.spin_once = lambda node, timeout_sec=0.0: bus.drain_one()

    node_mod = types.ModuleType("rclpy.node")
    node_mod.Node = Node
    qos_mod = types.ModuleType("rclpy.qos")

    class QoSProfile:
        def __init__(self, depth=1, durability=None):
            self.depth = depth
            self.durability = durability

    class DurabilityPolicy:
        TRANSIENT_LOCAL = "transient_local"

    qos_mod.QoSProfile = QoSProfile
    qos_mod.DurabilityPolicy = DurabilityPolicy
    rclpy.node = node_mod
    rclpy.qos = qos_mod

    def msg_pkg(name, classes):
        pkg = types.ModuleType(name)
        msg = types.ModuleType(name + ".msg")
        for c in classes:
            setattr(msg, c, type(c, (_NS,), {}))
        pkg.msg = msg
        return pkg, msg

    geo, geo_msg = msg_pkg(
        "geometry_msgs", ["PoseStamped", "PoseWithCovarianceStamped"]
    )
    nav, nav_msg = msg_pkg("nav_msgs", ["OccupancyGrid", "Odometry"])
    sen, sen_msg = msg_pkg("sensor_msgs", ["LaserScan"])

    mods = {
        "rclpy": rclpy,
        "rclpy.node": node_mod,
        "rclpy.qos": qos_mod,
        "geometry_msgs": geo,
        "geometry_msgs.msg": geo_msg,
        "nav_msgs": nav,
        "nav_msgs.msg": nav_msg,
        "sensor_msgs": sen,
        "sensor_msgs.msg": sen_msg,
    }
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    return saved


def _restore(saved):
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v
    sys.modules.pop("ros2_smoke", None)


@pytest.fixture()
def smoke_env(tmp_path):
    """Stubbed rclpy + a tiny trace file + a fake bridge on the bus."""
    bus = _Bus()
    saved = _install_rclpy_stub(bus)
    sys.path.insert(0, str(REPO / "docker"))
    try:
        import importlib

        smoke = importlib.import_module("ros2_smoke")
        smoke = importlib.reload(smoke)  # bind to THIS bus's stubs

        # a tiny figure-eight trace: 2 s, truth = odom (no drift)
        n_o, n_s, n_b = 100, 20, 12
        odom_t = np.arange(n_o) * 0.02
        th = 0.5 * np.sin(odom_t)
        pose = np.stack([odom_t * 0.5, np.cos(odom_t) - 1.0, th], 1)
        trace_path = tmp_path / "tiny.npz"
        np.savez(
            trace_path,
            odom_t=odom_t,
            odom_pose=pose,
            odom_twist=np.stack(
                [np.full(n_o, 0.5), 0.5 * np.cos(odom_t)], 1
            ),
            scan_t=np.arange(n_s) * 0.1,
            scan_ranges=np.ones((n_s, n_b), np.float32),
            beam_angles=np.linspace(-1.0, 1.0, n_b).astype(np.float32),
            truth_t=odom_t,
            truth_pose=pose,
        )

        # fake bridge: latch /map now; echo each /scan as an inferred pose
        # at the CURRENT truth + 2 cm noise
        grid = sys.modules["nav_msgs.msg"].OccupancyGrid()
        grid.info.width, grid.info.height = 40, 30
        bus.publish("/map", grid)
        rng = np.random.default_rng(0)
        state = dict(k=0)

        def on_scan(_msg):
            t_now = state["player"]._trace_time_now()
            j = int(np.argmin(np.abs(odom_t - t_now)))
            m = sys.modules["geometry_msgs.msg"].PoseStamped()
            m.pose.position.x = float(pose[j, 0] + rng.normal(0, 0.02))
            m.pose.position.y = float(pose[j, 1] + rng.normal(0, 0.02))
            m.pose.orientation.x = 0.0
            m.pose.orientation.y = 0.0
            m.pose.orientation.z = float(np.sin(pose[j, 2] / 2))
            m.pose.orientation.w = float(np.cos(pose[j, 2] / 2))
            bus.publish("/pf/viz/inferred_pose", m)

        bus.subscribe("/scan", on_scan)
        yield types.SimpleNamespace(
            smoke=smoke, bus=bus, trace=trace_path, state=state,
            truth=pose, odom_t=odom_t,
        )
    finally:
        sys.path.remove(str(REPO / "docker"))
        _restore(saved)


def test_smoke_player_passes_end_to_end(smoke_env, capsys):
    """main() must run the whole protocol against the stub bridge and PASS
    (rc 0): /map wait, seed, paced playback, >= min corrections, RMSE."""
    smoke_env.state["player"] = None

    # main() constructs its own player; capture it via the class
    orig_init = smoke_env.smoke.TracePlayer.__init__

    def patched(self, trace_path):
        orig_init(self, trace_path)
        smoke_env.state["player"] = self

    smoke_env.smoke.TracePlayer.__init__ = patched
    try:
        rc = smoke_env.smoke.main([
            "--trace", str(smoke_env.trace),
            "--rate", "50.0",  # 2 s trace in ~0.04 s wall
            "--min-corrections", "10",
            "--rmse-max", "0.25",
            "--map-timeout", "5.0",
        ])
    finally:
        smoke_env.smoke.TracePlayer.__init__ = orig_init
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "PASS" in out


def test_receipt_relative_timestamps(smoke_env):
    """ADVICE round 4: poses are stamped with RECEIPT-relative trace time
    (wall-clock interpolated), not the last published event's time."""
    smoke = smoke_env.smoke
    player = smoke.TracePlayer(smoke_env.trace)
    smoke_env.state["player"] = player
    assert player._trace_time_now() == 0.0  # before playback
    player.play(rate=100.0)
    assert len(player.poses) >= 10
    ts = np.array([t for t, _ in player.poses])
    # receipt times are monotone and inside (or just past) the trace span
    assert (np.diff(ts) >= 0).all()
    assert ts[0] >= 0.0 and ts[-1] <= smoke_env.odom_t[-1] + 1.5 * 100.0
    # each recorded pose matches the truth at ITS OWN timestamp (the old
    # publish-time stamping skewed this by the pipeline depth)
    for t, p in player.poses:
        j = int(np.argmin(np.abs(smoke_env.odom_t - t)))
        err = np.hypot(
            p[0] - smoke_env.truth[j, 0], p[1] - smoke_env.truth[j, 1]
        )
        assert err < 0.3, (t, err)


def test_fail_without_bridge(tmp_path, smoke_env):
    """No /map -> rc 2 (the container's bridge-missing diagnosis)."""
    smoke_env.bus.latched.pop("/map", None)
    smoke_env.bus.subs.pop("/map", None)
    rc = smoke_env.smoke.main([
        "--trace", str(smoke_env.trace),
        "--rate", "100.0",
        "--map-timeout", "0.2",
    ])
    assert rc == 2
