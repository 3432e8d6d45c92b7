"""Exercise the ROS2Bridge MAIN LOOP against a stubbed rclpy.

Round-1 VERDICT item 7: the bridge's pure message fillers were unit
tested, but the rclpy wiring (subscriptions, timers, latched map QoS,
publication fan-out) had never executed. These tests inject a fake
rclpy/message stack into sys.modules and drive the bridge exactly the
way an executor would: scan + odom callbacks, the MCL timer, the 5 Hz
map republish, and the interactive /initialpose & /clicked_point
recovery callbacks (reference src/particle_filter.cpp:115-165 wiring,
:355-379 interactive init, :857-983 outputs).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from monte_carlo_localization_tpu.config import MCLConfig


# ----- duck-typed ROS message stand-ins -----

class AutoMsg:
    """Attribute-materializing message stub: ``msg.pose.position.x = 1``
    works without declaring the nesting (mirrors rosidl message field
    access closely enough for the bridge's fillers)."""

    def __getattr__(self, name):
        child = AutoMsg()
        object.__setattr__(self, name, child)
        return child


def _msg_class(name):
    return type(name, (AutoMsg,), {})


class FakeTime:
    def __init__(self, t):
        self._t = t

    def seconds_nanoseconds(self):
        s = int(self._t)
        return s, int((self._t - s) * 1e9)

    def to_msg(self):
        m = AutoMsg()
        m.sec, m.nanosec = self.seconds_nanoseconds()
        return m


class FakeClock:
    def __init__(self, holder):
        self._holder = holder

    def now(self):
        return FakeTime(self._holder["t"])


class FakePublisher:
    def __init__(self, topic, qos):
        self.topic = topic
        self.qos = qos
        self.msgs = []

    def publish(self, msg):
        self.msgs.append(msg)


class FakeBroadcaster:
    def __init__(self, node):
        self.sent = []

    def sendTransform(self, t):
        self.sent.append(t)


class FakeRosNode:
    def __init__(self, name):
        self.name = name
        self.pubs = {}
        self.subs = {}
        self.timers = []  # (period, callback)
        self.clock_holder = {"t": 100.0}

    def create_publisher(self, typ, topic, qos):
        p = FakePublisher(topic, qos)
        self.pubs[topic] = p
        return p

    def create_subscription(self, typ, topic, cb, qos):
        self.subs[topic] = cb

    def create_timer(self, period, cb):
        self.timers.append((period, cb))

    def get_clock(self):
        return FakeClock(self.clock_holder)

    # test helpers
    def tick(self, dt):
        """Advance sim time and fire every timer once (executor turn)."""
        self.clock_holder["t"] += dt
        for _, cb in list(self.timers):
            cb()

    def timer_with_period(self, period):
        for p, cb in self.timers:
            if abs(p - period) < 1e-9:
                return cb
        raise AssertionError(f"no timer with period {period}: {self.timers}")


@pytest.fixture
def stub_ros(monkeypatch):
    """Install a fake rclpy + message stack into sys.modules."""
    rclpy = types.ModuleType("rclpy")
    rclpy_node = types.ModuleType("rclpy.node")
    rclpy_node.Node = FakeRosNode
    rclpy.node = rclpy_node
    rclpy_qos = types.ModuleType("rclpy.qos")

    class QoSProfile:
        def __init__(self, depth, durability=None):
            self.depth = depth
            self.durability = durability

    class DurabilityPolicy:
        TRANSIENT_LOCAL = "transient_local"
        VOLATILE = "volatile"

    rclpy_qos.QoSProfile = QoSProfile
    rclpy_qos.DurabilityPolicy = DurabilityPolicy
    rclpy.qos = rclpy_qos

    geo = types.ModuleType("geometry_msgs")
    geo_msg = types.ModuleType("geometry_msgs.msg")
    for n in ("PointStamped", "PoseArray", "PoseStamped",
              "PoseWithCovarianceStamped", "TransformStamped", "Pose"):
        setattr(geo_msg, n, _msg_class(n))
    geo.msg = geo_msg

    nav = types.ModuleType("nav_msgs")
    nav_msg = types.ModuleType("nav_msgs.msg")
    for n in ("OccupancyGrid", "Odometry"):
        setattr(nav_msg, n, _msg_class(n))
    nav.msg = nav_msg

    sensor = types.ModuleType("sensor_msgs")
    sensor_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msg.LaserScan = _msg_class("LaserScan")
    sensor.msg = sensor_msg

    tf2 = types.ModuleType("tf2_ros")
    tf2.TransformBroadcaster = FakeBroadcaster

    mods = {
        "rclpy": rclpy, "rclpy.node": rclpy_node, "rclpy.qos": rclpy_qos,
        "geometry_msgs": geo, "geometry_msgs.msg": geo_msg,
        "nav_msgs": nav, "nav_msgs.msg": nav_msg,
        "sensor_msgs": sensor, "sensor_msgs.msg": sensor_msg,
        "tf2_ros": tf2,
    }
    for k, v in mods.items():
        monkeypatch.setitem(sys.modules, k, v)
    return mods


def _make_bridge(box_map, sim_mode=False, **cfg_kw):
    from monte_carlo_localization_tpu.runtime.ros2_bridge import ROS2Bridge

    cfg = MCLConfig(
        max_particles=128, angle_step=1, timer_frequency=50.0,
        max_viz_particles=32, raycast_method="lut", **cfg_kw,
    )
    return ROS2Bridge(box_map, cfg, sim_mode=sim_mode)


def _scan_msg(stub_ros, ranges, beams):
    msg = stub_ros["sensor_msgs.msg"].LaserScan()
    msg.ranges = ranges.tolist()
    msg.angle_min = float(beams[0])
    msg.angle_increment = float(beams[1] - beams[0])
    return msg


def _odom_msg(stub_ros, x, y, theta, v, w):
    from monte_carlo_localization_tpu.runtime.ros2_bridge import fill_pose

    msg = stub_ros["nav_msgs.msg"].Odometry()
    fill_pose(msg.pose.pose, np.array([x, y, theta]))
    msg.twist.twist.linear.x = v
    msg.twist.twist.angular.z = w
    return msg


def test_wiring_matches_reference_topics(stub_ros, box_map):
    b = _make_bridge(box_map)
    n = b.ros_node
    assert set(n.pubs) == {
        "/pf/viz/inferred_pose", "/pf/viz/particles", "/pf/pose/odom", "/map",
    }
    # latched (transient_local) map QoS, like the reference's map server
    assert n.pubs["/map"].qos.durability == "transient_local"
    assert set(n.subs) == {
        b.config.scan_topic, b.config.odom_topic, "/initialpose",
        "/clicked_point",
    }
    # two timers: the MCL tick at timer_frequency and the 5 Hz map republish
    n.timer_with_period(1.0 / b.config.timer_frequency)
    n.timer_with_period(0.2)
    # the map is latched once at construction with the full grid
    (m,) = n.pubs["/map"].msgs
    assert m.info.width == box_map.width and m.info.height == box_map.height
    assert len(m.data) == box_map.width * box_map.height


def test_sim_mode_switches_odom_topic(stub_ros, box_map):
    b = _make_bridge(box_map, sim_mode=True)
    assert "/ego_racecar/odom" in b.ros_node.subs
    assert b.config.odom_topic not in b.ros_node.subs


def test_timer_driven_correction_publishes(stub_ros, box_map, beams60,
                                           make_scan):
    """scan + odom callbacks then timer ticks: corrections run and the
    inferred pose / particle cloud / TF / odom all fan out."""
    b = _make_bridge(box_map)
    n = b.ros_node
    pose = np.array([2.31, 2.72, 0.4], np.float32)
    scan = make_scan(box_map, pose, beams60)

    n.subs[b.config.scan_topic](_scan_msg(stub_ros, scan, beams60))
    assert b.node.lidar_initialized
    n.subs[b.config.odom_topic](
        _odom_msg(stub_ros, pose[0], pose[1], pose[2], 0.3, 0.0)
    )
    # seed near the truth so the correction is meaningful and fast
    ip = stub_ros["geometry_msgs.msg"].PoseWithCovarianceStamped()
    from monte_carlo_localization_tpu.runtime.ros2_bridge import fill_pose

    fill_pose(ip.pose.pose, pose)
    n.subs["/initialpose"](ip)

    for _ in range(4):
        n.tick(0.02)

    assert len(n.pubs["/pf/viz/inferred_pose"].msgs) >= 3
    assert len(n.pubs["/pf/viz/particles"].msgs) >= 3
    assert len(n.pubs["/pf/pose/odom"].msgs) >= 4  # every tick (tf path)
    assert len(b.tf_broadcaster.sent) >= 4
    est = n.pubs["/pf/viz/inferred_pose"].msgs[-1].pose.position
    assert abs(est.x - pose[0]) < 0.5 and abs(est.y - pose[1]) < 0.5
    # particle cloud downsampled to max_viz_particles
    assert len(n.pubs["/pf/viz/particles"].msgs[-1].poses) == 32
    # headers are stamped from the node clock in the map frame
    last = n.pubs["/pf/viz/inferred_pose"].msgs[-1]
    assert last.header.frame_id == "map"
    assert last.header.stamp.sec >= 100


def test_clicked_point_triggers_global_reinit(stub_ros, box_map, beams60,
                                              make_scan):
    b = _make_bridge(box_map)
    n = b.ros_node
    pose = np.array([2.31, 2.72, 0.4], np.float32)
    n.subs[b.config.scan_topic](
        _scan_msg(stub_ros, make_scan(box_map, pose, beams60), beams60)
    )
    ip = stub_ros["geometry_msgs.msg"].PoseWithCovarianceStamped()
    from monte_carlo_localization_tpu.runtime.ros2_bridge import fill_pose

    fill_pose(ip.pose.pose, pose)
    n.subs["/initialpose"](ip)
    assert b.node.inferred_pose is not None

    n.subs["/clicked_point"](stub_ros["geometry_msgs.msg"].PointStamped())
    assert b.node.inferred_pose is None  # belief reset, like the reference
    # the loop keeps running after the reset
    for _ in range(3):
        n.tick(0.02)
    assert np.isfinite(
        np.asarray(b.node.current_pose(), dtype=float)
    ).all()


def test_map_republish_reuses_cached_grid(stub_ros, box_map):
    b = _make_bridge(box_map)
    n = b.ros_node
    republish = n.timer_with_period(0.2)
    first = n.pubs["/map"].msgs[0]
    n.clock_holder["t"] += 0.2
    republish()
    second = n.pubs["/map"].msgs[1]
    assert second is first  # payload built once, only the stamp refreshed
    assert second.header.stamp.sec >= 100
