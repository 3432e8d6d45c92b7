"""ROS2 bridge: pure message-filler parity (no rclpy in this image).

The fillers are duck-typed so the reference's topic payloads (reference
src/particle_filter.cpp:857-983 publish_tf/visualize/publish_particles)
can be validated without a ROS installation; the rclpy-dependent
``ROS2Bridge`` class itself must raise a clear ImportError here.
"""

import numpy as np
import pytest

from monte_carlo_localization_tpu.runtime import ros2_bridge as rb
from monte_carlo_localization_tpu.utils.geometry import quaternion_to_yaw


class NS:
    """Auto-vivifying attribute namespace (duck-typed ROS message)."""

    def __getattr__(self, name):
        v = NS()
        object.__setattr__(self, name, v)
        return v


def test_fill_pose_roundtrip():
    m = NS()
    pose = np.array([1.5, -2.0, 0.7])
    rb.fill_pose(m, pose)
    assert m.position.x == 1.5 and m.position.y == -2.0 and m.position.z == 0.0
    yaw = quaternion_to_yaw(
        m.orientation.x, m.orientation.y, m.orientation.z, m.orientation.w
    )
    assert abs(yaw - 0.7) < 1e-9
    back = rb.pose_from_msg(m)
    np.testing.assert_allclose(back, pose, atol=1e-9)


def test_fill_pose_array():
    cloud = np.array([[0.0, 1.0, 0.1], [2.0, 3.0, -0.5]])
    msg = NS()
    msg.poses = [NS(), NS()]
    rb.fill_pose_array(msg, cloud)
    assert msg.poses[1].position.x == 2.0
    yaw = quaternion_to_yaw(
        msg.poses[1].orientation.x,
        msg.poses[1].orientation.y,
        msg.poses[1].orientation.z,
        msg.poses[1].orientation.w,
    )
    assert abs(yaw + 0.5) < 1e-9


def test_fill_odometry_and_transform():
    om = NS()
    rb.fill_odometry(om, [1.0, 2.0, 0.3], velocity=1.5, angular_velocity=-0.2)
    assert om.pose.pose.position.x == 1.0
    assert om.twist.twist.linear.x == 1.5
    assert om.twist.twist.angular.z == -0.2

    tf = NS()
    rb.fill_transform(tf, [4.0, 5.0, 1.0])
    assert tf.translation.x == 4.0 and tf.translation.z == 0.0
    yaw = quaternion_to_yaw(
        tf.rotation.x, tf.rotation.y, tf.rotation.z, tf.rotation.w
    )
    assert abs(yaw - 1.0) < 1e-9


def test_fill_occupancy_grid(box_map):
    msg = NS()
    rb.fill_occupancy_grid(msg, box_map)
    occ = np.asarray(box_map.occupancy)
    h, w = occ.shape
    assert msg.info.width == w and msg.info.height == h
    assert msg.info.resolution == box_map.resolution
    assert msg.info.origin.position.x == float(box_map.origin_x)
    assert len(msg.data) == h * w
    # row-major flattening matches nav_msgs/OccupancyGrid layout
    assert msg.data[: w] == [int(v) for v in occ[0]]


def test_scan_and_odom_ingest_converters():
    scan = NS()
    scan.ranges = [1.0, 2.0, 3.0]
    scan.angle_min = -1.5
    scan.angle_increment = 0.1
    r, amin, ainc = rb.scan_to_arrays(scan)
    assert r.dtype == np.float32 and len(r) == 3
    assert amin == -1.5 and ainc == 0.1

    om = NS()
    rb.fill_odometry(om, [1.0, 2.0, 0.3], velocity=0.9, angular_velocity=0.1)
    x, y, th, v, w = rb.odom_to_args(om)
    assert (x, y) == (1.0, 2.0)
    assert abs(th - 0.3) < 1e-9
    assert (v, w) == (0.9, 0.1)


def test_bridge_raises_clear_import_error_without_rclpy(box_map):
    with pytest.raises(ImportError, match="rclpy"):
        rb.ROS2Bridge(box_map)
