import numpy as np
import pytest

from monte_carlo_localization_tpu.utils import geometry, validation


def test_normalize_angle_scalar():
    assert geometry.normalize_angle(0.0) == pytest.approx(0.0)
    assert geometry.normalize_angle(np.pi + 0.1) == pytest.approx(-np.pi + 0.1)
    assert geometry.normalize_angle(-np.pi - 0.1) == pytest.approx(np.pi - 0.1)
    assert geometry.normalize_angle(7 * np.pi) == pytest.approx(np.pi, abs=1e-6)


def test_normalize_angle_array():
    a = np.linspace(-20, 20, 1001)
    n = geometry.normalize_angle(a)
    assert np.all(np.abs(n) <= np.pi + 1e-9)
    np.testing.assert_allclose(np.cos(n), np.cos(a), atol=1e-9)
    np.testing.assert_allclose(np.sin(n), np.sin(a), atol=1e-9)


def test_quaternion_yaw_roundtrip():
    for yaw in np.linspace(-np.pi + 1e-3, np.pi - 1e-3, 17):
        q = geometry.yaw_to_quaternion(yaw)
        assert geometry.quaternion_to_yaw(*q) == pytest.approx(yaw, abs=1e-9)


def test_rotation_matrix():
    R = geometry.rotation_matrix(np.pi / 2)
    np.testing.assert_allclose(R @ np.array([1.0, 0.0]), [0.0, 1.0], atol=1e-12)


def test_apply_vehicle_offset():
    # facing +x with offset 0.288: base_link is BEHIND the laser
    pose = np.array([1.0, 2.0, 0.0])
    out = geometry.apply_vehicle_offset(pose, 0.288)
    np.testing.assert_allclose(out, [1.0 - 0.288, 2.0, 0.0])
    # batch + rotated
    poses = np.array([[0.0, 0.0, np.pi / 2], [1.0, 1.0, np.pi]])
    out = geometry.apply_vehicle_offset(poses, 1.0)
    np.testing.assert_allclose(out[0], [0.0, -1.0, np.pi / 2], atol=1e-12)
    np.testing.assert_allclose(out[1], [2.0, 1.0, np.pi], atol=1e-12)


def test_is_pose_valid():
    assert validation.is_pose_valid([1.0, 2.0, 0.3])
    assert not validation.is_pose_valid([np.nan, 0, 0])
    assert not validation.is_pose_valid([0, np.inf, 0])
    assert not validation.is_pose_valid([20000.0, 0, 0], max_range=10000.0)
    assert validation.is_pose_valid([20000.0, 0, 0], max_range=30000.0)
    # theta NaN also invalid (engine is stricter than reference here)
    assert not validation.is_pose_valid([0, 0, np.nan])
