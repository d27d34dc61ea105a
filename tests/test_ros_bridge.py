"""ROS bridge conversion layer: wire-field parity without rospy.

The bridge's runtime pieces need a live ROS master; the conversions are pure
and duck-typed, so they are verified here against fake message objects whose
field layout matches the reference's wire usage
(``NMPCNavControlROS.cpp:304-399``).
"""
import math
import os
import types

import numpy as np
import pytest

from nmpc_nav_control_tpu.runtime import ros_bridge as rb
from nmpc_nav_control_tpu.runtime.messages import (
    ControlStatus,
    ParametricPath,
    ParametricPathSet,
    Twist,
)


def _ns(**kw):
    return types.SimpleNamespace(**kw)


def test_quat_yaw_roundtrip():
    for yaw in np.linspace(-math.pi + 1e-6, math.pi - 1e-6, 17):
        x, y, z, w = rb.yaw_to_quat(yaw)
        assert rb.quat_to_yaw(x, y, z, w) == pytest.approx(yaw, abs=1e-12)


def test_pose_stamped_from_ros():
    qx, qy, qz, qw = rb.yaw_to_quat(0.7)
    msg = _ns(
        header=_ns(frame_id="map"),
        pose=_ns(position=_ns(x=1.5, y=-2.0, z=0.0),
                 orientation=_ns(x=qx, y=qy, z=qz, w=qw)),
    )
    ps = rb.pose_stamped_from_ros(msg)
    assert ps.frame_id == "map"
    assert ps.x == 1.5 and ps.y == -2.0
    assert ps.theta == pytest.approx(0.7)


def _fake_wire_path(frame="odom", vel=-0.5):
    return _ns(frame_id=frame, cx=[0.0, 1.0], cy=[0.0, 0.5],
               ch=[0.1], velocity=vel)


def test_path_set_from_ros_uses_reference_field_names():
    # PathSet + AuxNum0 are the reference's wire names (":322-323,396-397").
    msg = _ns(PathSet=[_fake_wire_path(), _fake_wire_path("map", 1.0)],
              AuxNum0=0.25)
    ps = rb.path_set_from_ros(msg)
    assert len(ps.paths) == 2
    assert ps.aux_num0 == 0.25
    assert ps.paths[0].frame_id == "odom"
    assert ps.paths[0].velocity == -0.5
    assert list(ps.paths[1].cx) == [0.0, 1.0]

    msg2 = _ns(PathSet=[_fake_wire_path()], AuxNum0=0.0, request_id=7)
    ps2 = rb.path_set2_from_ros(msg2)
    assert ps2.request_id == 7


class _FakeRosPathSet:
    def __init__(self):
        self.PathSet = []
        self.AuxNum0 = 0.0


class _FakeRosPath:
    def __init__(self):
        self.frame_id = ""
        self.cx = []
        self.cy = []
        self.ch = []
        self.velocity = 0.0


def test_path_set_to_ros_roundtrip():
    ps = ParametricPathSet(
        paths=[ParametricPath(frame_id="map", cx=[0, 1], cy=[0, 2],
                              ch=[0.0], velocity=0.8)],
        aux_num0=0.4,
    )
    msg = rb.path_set_to_ros(ps, _FakeRosPathSet, _FakeRosPath)
    assert msg.AuxNum0 == 0.4
    assert len(msg.PathSet) == 1
    assert msg.PathSet[0].frame_id == "map"
    back = rb.path_set_from_ros(msg)
    assert back.paths[0].cy == [0, 2]
    assert back.aux_num0 == 0.4


class _FakeStatus:
    def __init__(self):
        self.status = 0
        self.request_id = 0
        self.patch_remains = 0.0


def test_status_to_ros_keeps_patch_remains_typo():
    # The reference publishes "patch_remains" (sic, ":377") — wire contract.
    msg = rb.status_to_ros(ControlStatus(status=1, request_id=3,
                                         path_remains=2.5), _FakeStatus)
    assert msg.status == 1
    assert msg.request_id == 3
    assert msg.patch_remains == 2.5


class _FakeTwist:
    def __init__(self):
        self.linear = _ns(x=0.0, y=0.0, z=0.0)
        self.angular = _ns(x=0.0, y=0.0, z=0.0)


def test_twist_to_ros():
    msg = rb.twist_to_ros(Twist(linear_x=0.3, linear_y=-0.1, angular_z=0.9),
                          _FakeTwist)
    assert msg.linear.x == pytest.approx(0.3)
    assert msg.linear.y == pytest.approx(-0.1)
    assert msg.angular.z == pytest.approx(0.9)


class _FakePosePath:
    def __init__(self):
        self.header = _ns(frame_id="", stamp=None)
        self.poses = []


class _FakePoseStamped:
    def __init__(self):
        self.header = _ns(frame_id="", stamp=None)
        self.pose = _ns(position=_ns(x=0.0, y=0.0, z=0.0),
                        orientation=_ns(x=0.0, y=0.0, z=0.0, w=1.0))


def test_pose_path_to_ros():
    poses = np.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, math.pi / 2]])
    msg = rb.pose_path_to_ros("map", poses, _FakePosePath, _FakePoseStamped,
                              stamp=123)
    assert msg.header.frame_id == "map"
    assert len(msg.poses) == 2
    assert msg.poses[1].pose.position.y == 2.0
    q = msg.poses[1].pose.orientation
    assert rb.quat_to_yaw(q.x, q.y, q.z, q.w) == pytest.approx(math.pi / 2)


def test_available_is_false_without_ros():
    # This image has no rospy; the bridge must degrade cleanly.
    assert rb.available() is False


def test_resolve_namespace_robot_id_convention():
    """Per-robot namespacing follows the reference launch convention
    (``launch/run_nmpc_nav_control.launch:2-4``): explicit wins, then
    $ROBOT_ID, then the reference's ``unnamed_robot`` fallback
    (``$(optenv ROBOT_ID unnamed_robot)``)."""
    from nmpc_nav_control_tpu.runtime.ros_bridge import resolve_namespace

    assert resolve_namespace("", env={}) == "unnamed_robot"
    assert resolve_namespace("", env={"ROBOT_ID": "amr_07"}) == "amr_07"
    assert resolve_namespace("explicit", env={"ROBOT_ID": "amr_07"}) == "explicit"


def test_apply_namespace_explicit_overrides(monkeypatch):
    """An explicit --namespace must win over a pre-set ROS_NAMESPACE
    (ADVICE r4: _apply_namespace previously let the env var silently
    override the flag); without the flag, a pre-set value stays."""
    import warnings

    from nmpc_nav_control_tpu.runtime.ros_bridge import _apply_namespace

    monkeypatch.setenv("ROS_NAMESPACE", "pre_set")
    _apply_namespace("amr_07", explicit=False)
    assert os.environ["ROS_NAMESPACE"] == "pre_set"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _apply_namespace("amr_07", explicit=True)
    assert os.environ["ROS_NAMESPACE"] == "amr_07"
    assert any("overrides" in str(x.message) for x in w)
