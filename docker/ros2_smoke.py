"""Real-DDS smoke driver: play a golden trace at the ROS2 bridge.

Publishes the committed trace's /scan (sensor_msgs/LaserScan) and /odom
(nav_msgs/Odometry) streams in real time, seeds the filter over
/initialpose at the trace's first truth pose (the reference's RViz "2D
Pose Estimate" path, src/particle_filter.cpp:355-374), subscribes to
/pf/viz/inferred_pose, and asserts:

* the bridge's latched /map arrives (proves the OccupancyGrid surface),
* at least ``--min-corrections`` inferred poses come back over DDS,
* their RMSE against the trace's ground truth is under ``--rmse-max``.

This is the first REAL rclpy/DDS traffic across runtime/ros2_bridge.py —
everything in tests/test_ros2_bridge*.py runs against a stubbed rclpy.
Run via docker/ros2_validate.sh; needs a sourced ROS2 environment.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

import rclpy
from geometry_msgs.msg import PoseStamped, PoseWithCovarianceStamped
from nav_msgs.msg import OccupancyGrid, Odometry
from rclpy.node import Node
from rclpy.qos import DurabilityPolicy, QoSProfile
from sensor_msgs.msg import LaserScan


class TracePlayer(Node):
    def __init__(self, trace_path: Path):
        super().__init__("trace_player")
        d = np.load(trace_path, allow_pickle=True)
        self.odom_t = d["odom_t"]
        self.odom_pose = d["odom_pose"]
        self.odom_twist = d["odom_twist"]
        self.scan_t = d["scan_t"]
        self.scan_ranges = d["scan_ranges"]
        self.beams = d["beam_angles"]
        self.truth_t = d["truth_t"]
        self.truth_pose = d["truth_pose"]

        self.pub_scan = self.create_publisher(LaserScan, "/scan", 10)
        self.pub_odom = self.create_publisher(Odometry, "/odom", 10)
        self.pub_init = self.create_publisher(
            PoseWithCovarianceStamped, "/initialpose", 1
        )
        self.map_seen = False
        latched = QoSProfile(
            depth=1, durability=DurabilityPolicy.TRANSIENT_LOCAL
        )
        self.create_subscription(OccupancyGrid, "/map", self._on_map, latched)
        self.poses: list[tuple[float, np.ndarray]] = []
        self.create_subscription(
            PoseStamped, "/pf/viz/inferred_pose", self._on_pose, 50
        )

    def _on_map(self, msg) -> None:
        if not self.map_seen:
            self.get_logger().info(
                f"/map received: {msg.info.width}x{msg.info.height}"
            )
        self.map_seen = True

    def _on_pose(self, msg) -> None:
        o = msg.pose.orientation
        th = float(
            np.arctan2(2 * (o.w * o.z + o.x * o.y),
                       1 - 2 * (o.y * o.y + o.z * o.z))
        )
        self.poses.append((
            self._trace_time_now(),
            np.array([msg.pose.position.x, msg.pose.position.y, th]),
        ))

    def _trace_time_now(self) -> float:
        """RECEIPT-relative trace time, interpolated from the wall clock.

        Timestamping a received pose with the last PUBLISHED event's time
        compared pipelined corrections against slightly-future ground
        truth, biasing the RMSE gate (ADVICE round 4); the wall clock maps
        receipt time onto the trace timeline exactly."""
        if self._t0_wall is None:
            return 0.0
        return self._t0_trace + (
            time.monotonic() - self._t0_wall
        ) * self._rate

    # -- publishing helpers --
    def seed_pose(self) -> None:
        p = self.truth_pose[0]
        m = PoseWithCovarianceStamped()
        m.header.frame_id = "map"
        m.pose.pose.position.x = float(p[0])
        m.pose.pose.position.y = float(p[1])
        m.pose.pose.orientation.z = float(np.sin(p[2] / 2))
        m.pose.pose.orientation.w = float(np.cos(p[2] / 2))
        self.pub_init.publish(m)

    def make_scan(self, i: int) -> LaserScan:
        m = LaserScan()
        m.header.frame_id = "laser"
        m.angle_min = float(self.beams[0])
        m.angle_increment = float(self.beams[1] - self.beams[0])
        m.angle_max = float(self.beams[-1])
        m.range_min, m.range_max = 0.0, 30.0
        m.ranges = [float(v) for v in self.scan_ranges[i]]
        return m

    def make_odom(self, i: int) -> Odometry:
        m = Odometry()
        m.header.frame_id = "odom"
        p = self.odom_pose[i]
        m.pose.pose.position.x = float(p[0])
        m.pose.pose.position.y = float(p[1])
        m.pose.pose.orientation.z = float(np.sin(p[2] / 2))
        m.pose.pose.orientation.w = float(np.cos(p[2] / 2))
        m.twist.twist.linear.x = float(self.odom_twist[i, 0])
        m.twist.twist.angular.z = float(self.odom_twist[i, 1])
        return m

    def play(self, rate: float = 1.0) -> None:
        """Stream the merged odom+scan event timeline in real time."""
        events = sorted(
            [(t, "odom", i) for i, t in enumerate(self.odom_t)]
            + [(t, "scan", i) for i, t in enumerate(self.scan_t)]
        )
        t0_wall = time.monotonic()
        t0 = events[0][0]
        self._t0_wall, self._t0_trace, self._rate = t0_wall, t0, rate
        for t, kind, i in events:
            target = t0_wall + (t - t0) / rate
            while time.monotonic() < target:
                rclpy.spin_once(self, timeout_sec=0.001)
            if kind == "odom":
                self.pub_odom.publish(self.make_odom(i))
            else:
                self.pub_scan.publish(self.make_scan(i))
        # drain late corrections
        t_end = time.monotonic() + 1.0
        while time.monotonic() < t_end:
            rclpy.spin_once(self, timeout_sec=0.05)

    _t0_wall: float | None = None
    _t0_trace = 0.0
    _rate = 1.0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", required=True)
    ap.add_argument("--rate", type=float, default=1.0)
    ap.add_argument("--rmse-max", type=float, default=0.5)
    ap.add_argument("--min-corrections", type=int, default=20)
    ap.add_argument("--map-timeout", type=float, default=120.0,
                    help="seconds to wait for the bridge's latched /map "
                         "(covers the engine's first jit compile)")
    args = ap.parse_args(argv)

    rclpy.init()
    player = TracePlayer(Path(args.trace))

    # wait for the bridge (latched /map proves it is up and serving)
    t_end = time.monotonic() + args.map_timeout
    while not player.map_seen:
        rclpy.spin_once(player, timeout_sec=0.2)
        if time.monotonic() > t_end:
            print("FAIL: bridge /map never arrived", file=sys.stderr)
            return 2
    player.seed_pose()
    time.sleep(0.5)
    player.play(rate=args.rate)

    n = len(player.poses)
    print(f"corrections received over DDS: {n}")
    if n < args.min_corrections:
        print(f"FAIL: expected >= {args.min_corrections}", file=sys.stderr)
        return 3
    tt, tp = player.truth_t, player.truth_pose
    errs = []
    for t, pose in player.poses:
        j = int(np.argmin(np.abs(tt - t)))
        errs.append(np.hypot(pose[0] - tp[j, 0], pose[1] - tp[j, 1]))
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    print(f"pose RMSE vs trace truth: {rmse:.3f} m over {n} corrections")
    if rmse > args.rmse_max:
        print(f"FAIL: RMSE {rmse:.3f} > {args.rmse_max}", file=sys.stderr)
        return 4
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
