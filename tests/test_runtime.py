"""Runtime layer tests: config validation, node message lifecycle, executor,
ingest helpers."""
import math

import numpy as np
import pytest

import jax.numpy as jnp

from nmpc_nav_control_tpu.models import diff
from nmpc_nav_control_tpu.runtime import (
    NmpcNavControlNode,
    ParametricPath,
    ParametricPathSet,
    ParametricPathSet2,
    PoseStamped,
    RealTimeExecutor,
    from_dict,
)
from nmpc_nav_control_tpu.runtime.ingest import (
    StampedPose,
    unwrap_pose_theta,
    velocity_from_poses,
)

DIFF_RAW = {
    "steering_geometry": "diff",
    "control_freq": 40,
    "tf_ini": 1.0,  # N = 40 to keep tests quick
    "rob_dist_between_wh": 0.27,
    "rob_wh_vel_time_const": 0.1,
    "rob_wh_max_vel": 1.0,
    "rob_wh_max_ace": 2.0,
    "cost_matrix_weights_state_diag": [10.0, 10.0, 5.0, 0, 0, 0, 0],
    "cost_matrix_weights_input_diag": [1.0, 1.0],
    "final_position_error": 0.03,
    "final_orientation_error": 3.0,
}


def test_config_validation_errors():
    with pytest.raises(ValueError, match="steering_geometry"):
        from_dict({})
    with pytest.raises(ValueError, match="Invalid steering_geometry"):
        from_dict({"steering_geometry": "ackermann"})
    bad = dict(DIFF_RAW)
    del bad["rob_dist_between_wh"]
    with pytest.raises(ValueError, match="rob_dist_between_wh"):
        from_dict(bad)
    bad = dict(DIFF_RAW)
    bad["cost_matrix_weights_state_diag"] = [1.0, 2.0]
    with pytest.raises(ValueError, match="7 numeric values"):
        from_dict(bad)


def test_config_parses_and_converts_degrees():
    cfg = from_dict(DIFF_RAW)
    assert cfg.horizon == 40
    assert abs(cfg.dt - 0.025) < 1e-12
    assert abs(cfg.nav.final_orientation_error - math.radians(3.0)) < 1e-12
    assert cfg.dist_b == 0.27


def test_node_goal_lifecycle():
    cfg = from_dict(DIFF_RAW)
    node = NmpcNavControlNode(cfg, dtype=jnp.float64)
    # Idle: no command published.
    twist, status = node.tick((0, 0, 0), (0, 0, 0))
    assert twist is None and status.status == 0

    node.on_pose_goal(PoseStamped(frame_id="map", x=0.8, y=0.0, theta=0.0))
    plant = np.zeros(5)
    published = 0
    for _ in range(500):
        vl, vr = plant[3], plant[4]
        vel = ((vl + vr) / 2, 0.0, (vr - vl) / 0.27)
        twist, status = node.tick(tuple(plant[:3]), vel)
        if twist is None:
            break
        published += 1
        # Euler-integrate a simple plant from the published Twist.
        vl_ref = twist.linear_x - 0.5 * 0.27 * twist.angular_z
        vr_ref = twist.linear_x + 0.5 * 0.27 * twist.angular_z
        for _ in range(5):
            v = (plant[3] + plant[4]) / 2
            w = (plant[4] - plant[3]) / 0.27
            plant[0] += v * math.cos(plant[2]) * 0.005
            plant[1] += v * math.sin(plant[2]) * 0.005
            plant[2] += w * 0.005
            plant[3] += (vl_ref - plant[3]) / 0.1 * 0.005
            plant[4] += (vr_ref - plant[4]) / 0.1 * 0.005
    assert published > 10
    assert status.status == 0  # back to Idle after reaching the goal
    assert abs(plant[0] - 0.8) < 0.06
    stats = node.timing_stats()
    assert stats["cycles"] > 10 and stats["p50_ms"] > 0


def test_node_path_lifecycle_and_status():
    cfg = from_dict(DIFF_RAW)
    node = NmpcNavControlNode(cfg, dtype=jnp.float64)
    msg = ParametricPathSet2(
        paths=[
            ParametricPath(frame_id="map", cx=[0.0, 1.0], cy=[0.0, 0.0],
                           velocity=0.5),
            ParametricPath(frame_id="map", cx=[1.0, 1.0], cy=[0.0, 0.0],
                           velocity=0.5),
        ],
        request_id=42,
    )
    node.on_path_no_stack_up_2(msg)
    twist, status = node.tick((0, 0, 0), (0, 0, 0))
    assert status.status == 1            # WORKING
    assert status.request_id == 42
    assert status.path_remains > 1.5     # ~2 curves left
    assert twist is not None and twist.linear_x >= 0


def test_node_rejects_bad_command():
    cfg = from_dict(DIFF_RAW)
    node = NmpcNavControlNode(cfg, dtype=jnp.float64)
    assert not node.on_control_command("go-faster")
    assert node.on_control_command("break")


def test_tric_twist_quirk():
    raw = {
        "steering_geometry": "tric",
        "control_freq": 40,
        "tf_ini": 0.5,
        "steering_wheel_frame_id": "direction_wheel",
        "rob_dist_between_steering_back_wh": 0.27,
        "rob_wh_vel_time_const": 0.1,
        "rob_steer_wh_angle_time_const": 0.5,
        "rob_wh_max_vel": 1.0,
        "rob_wh_max_ace": 1.0,
        "rob_steer_wh_min_angle": -30.0,
        "rob_steer_wh_max_angle": 30.0,
        "rob_steer_wh_max_angle_var": 120.0,
        "cost_matrix_weights_state_diag": [10.0, 10.0, 5.0, 0, 0, 0, 0],
        "cost_matrix_weights_input_diag": [1.0, 1.0],
    }
    cfg = from_dict(raw)
    assert abs(cfg.alpha_max - math.radians(30)) < 1e-12
    node = NmpcNavControlNode(cfg, dtype=jnp.float64)
    node.set_steering_wheel_angle(0.123)
    node.on_pose_goal(PoseStamped(frame_id="map", x=1.0, y=0.2, theta=0.0))
    twist, _ = node.tick((0, 0, 0), (0, 0, 0))
    # angular.z carries the MEASURED steering angle (pubCmdVel quirk,
    # NMPCNavControlROS.cpp:351-355), not alpha_ref.
    assert twist is not None
    assert twist.angular_z == pytest.approx(0.123)


def test_executor_runs_at_rate():
    cfg = from_dict({**DIFF_RAW, "control_freq": 100})
    node = NmpcNavControlNode(cfg, dtype=jnp.float64)
    node.on_pose_goal(PoseStamped(frame_id="map", x=0.5, y=0.0, theta=0.0))

    class Provider:
        def get_state(self):
            return (0.0, 0.0, 0.0), (0.0, 0.0, 0.0), True

    class Sink:
        def __init__(self):
            self.cmds = []
            self.statuses = []

        def publish_cmd_vel(self, t):
            self.cmds.append(t)

        def publish_status(self, s):
            self.statuses.append(s)

    sink = Sink()
    ex = RealTimeExecutor(node, Provider(), sink)
    ex.run(cycles=20)
    assert len(sink.statuses) == 20
    assert len(sink.cmds) == 20  # WORKING every tick from a fixed pose


def test_actual_path_republication():
    """``pubActualPath`` parity: every solving FollowPath tick republishes
    the front active curve as a one-element ParametricPathSet with
    AuxNum0 = the fractional path parameter u (``NMPCNavControlROS.cpp:390-399``)."""
    cfg = from_dict(DIFF_RAW)
    node = NmpcNavControlNode(cfg, dtype=jnp.float64)
    msg = ParametricPathSet2(
        paths=[
            ParametricPath(frame_id="map", cx=[0.0, 1.0, 0.25], cy=[0.0, 0.1],
                           velocity=0.5),
            ParametricPath(frame_id="map", cx=[1.25, 1.0], cy=[0.1, 0.0],
                           velocity=0.5),
        ],
        request_id=7,
    )
    node.on_path_no_stack_up_2(msg)
    twist, status = node.tick((0, 0, 0), (0, 0, 0))
    assert status.status == 1
    ap = node.last_actual_path
    assert ap is not None and len(ap.paths) == 1
    assert ap.paths[0].frame_id == "map"
    # Coefficients round-trip (front curve, zero-padded to DEG).
    np.testing.assert_allclose(ap.paths[0].cx[:3], [0.0, 1.0, 0.25])
    np.testing.assert_allclose(ap.paths[0].cx[3:], 0.0)
    assert ap.paths[0].velocity == pytest.approx(0.5)
    assert 0.0 <= ap.aux_num0 < 2.0
    # Idle tick (no path work) -> no re-publication.
    node.on_control_command("idle")
    node.tick((0, 0, 0), (0, 0, 0))
    assert node.last_actual_path is None


def test_frame_change_reexpresses_pose():
    """A path whose second curve lives in a different frame: the window
    barrier holds it upcoming; when the first curve completes and the window
    rotates, the node must acquire the pose in the NEW frame via the
    frame-transform hook (``mainCycle`` re-lookup, ``NMPCNavControlROS.cpp:523``
    + ``getRobotPose`` ``:401-436``)."""
    import math as m

    cfg = from_dict({**DIFF_RAW, "final_position_error": 0.05,
                     "final_orientation_error": 10.0})
    node = NmpcNavControlNode(cfg, dtype=jnp.float64)
    # odom = map shifted by +10 in x.
    offset = 10.0
    calls = []

    def transformer(pose, src, dst):
        calls.append((src, dst))
        if src == "map" and dst == "odom":
            return (pose[0] + offset, pose[1], pose[2])
        if src == "odom" and dst == "map":
            return (pose[0] - offset, pose[1], pose[2])
        return None

    node.frame_transformer = transformer
    # Curve 1 in map: x 0 -> 0.4; curve 2 in odom: x_odom 10.4 -> 10.8
    # (= map x 0.4 -> 0.8).
    msg = ParametricPathSet2(
        paths=[
            ParametricPath(frame_id="map", cx=[0.0, 0.4], cy=[0.0, 0.0],
                           velocity=0.4),
            ParametricPath(frame_id="odom", cx=[10.4, 0.4], cy=[0.0, 0.0],
                           velocity=0.4),
        ],
        request_id=1,
    )
    node.on_path_no_stack_up_2(msg)
    assert node.required_frame() == "map"

    # Simulated plant in the MAP frame; measurements always tagged "map".
    plant = np.zeros(5)
    saw_odom = False
    for _ in range(600):
        vl, vr = plant[3], plant[4]
        vel = ((vl + vr) / 2, 0.0, (vr - vl) / 0.27)
        twist, status = node.tick(
            tuple(plant[:3]), vel, pose_frame="map"
        )
        if node.required_frame() == "odom":
            saw_odom = True
        assert status.status != 2, "frame change must not trip Error"
        if twist is None:
            break
        vl_ref = twist.linear_x - 0.5 * 0.27 * twist.angular_z
        vr_ref = twist.linear_x + 0.5 * 0.27 * twist.angular_z
        for _ in range(5):
            v = (plant[3] + plant[4]) / 2
            w = (plant[4] - plant[3]) / 0.27
            plant[0] += v * m.cos(plant[2]) * 0.005
            plant[1] += v * m.sin(plant[2]) * 0.005
            plant[2] += w * 0.005
            plant[3] += (vl_ref - plant[3]) / 0.1 * 0.005
            plant[4] += (vr_ref - plant[4]) / 0.1 * 0.005
    assert saw_odom, "window never rotated into the odom frame"
    assert ("map", "odom") in calls, "transformer never invoked"
    # The robot tracked through the frame change to the second curve's end.
    assert plant[0] > 0.6, f"only reached x={plant[0]}"


def test_missing_transform_drives_error():
    """No transformer registered + a pose in the wrong frame = the tf2
    exception path: measurements invalid -> Error (``:431-434,552``)."""
    cfg = from_dict(DIFF_RAW)
    node = NmpcNavControlNode(cfg, dtype=jnp.float64)
    node.on_pose_goal(PoseStamped(frame_id="map", x=0.5, y=0.0, theta=0.0))
    twist, status = node.tick((0, 0, 0), (0, 0, 0), pose_frame="odom")
    assert twist is None
    assert status.status == 2  # ERROR


def test_tf_state_provider_pi_crossing_executor():
    """End-to-end: executor + TfStateProvider (unwrap/finite-diff/staleness)
    + SimulatedRobot with WRAPPED measured yaw, through a rotation crossing
    +-pi — the getRobotPose/getRobotVel parity layer exercised in the
    integrated loop (VERDICT r1 item 7)."""
    from nmpc_nav_control_tpu.runtime.ingest import TfStateProvider
    from nmpc_nav_control_tpu.runtime.simulation import SimulatedRobot

    cfg = from_dict({**DIFF_RAW, "final_orientation_error": 2.0})
    node = NmpcNavControlNode(cfg, dtype=jnp.float64)
    # Start heading 2.9 rad; drive to (-0.8, -0.1) with goal heading
    # -2.98 rad (the wrapped form of ~3.3): the continuous heading must grow
    # THROUGH pi, so the provider's unwrap hack is load-bearing.
    robot = SimulatedRobot(node, substeps=5, start_pose=(0.0, 0.0, 2.9))
    provider = TfStateProvider(
        robot.get_raw_pose, transform_timeout=0.2,
        clock=lambda: robot.sim_time,
    )
    ex = RealTimeExecutor(node, provider, robot, use_native_timer=False)
    # Prime during Idle (the reference's 2 s TF-buffer sleep analog): the
    # provider's first sample has no velocity yet.
    ex.run(cycles=2)
    goal_theta = 3.3 - 2.0 * math.pi
    node.on_pose_goal(PoseStamped(frame_id="map", x=-0.8, y=-0.1,
                                  theta=goal_theta))
    ex.run(cycles=600)
    assert robot.last_status is not None
    assert robot.last_status.status != 2, "pi crossing tripped Error"
    d = math.hypot(robot.pose[0] + 0.8, robot.pose[1] + 0.1)
    assert d < 0.1, f"position error {d}"
    th = robot.pose[2]
    err = abs(math.atan2(math.sin(th - goal_theta), math.cos(th - goal_theta)))
    assert err < math.radians(5.0), f"heading error {math.degrees(err)} deg"
    # The continuous plant heading crossed pi (didn't take the long way).
    assert robot.pose[2] > math.pi


def test_ingest_velocity_midyaw_rotation():
    # Robot translating +x in world while yawed 90deg -> body v = vy_world? No:
    # moving along world +y at yaw pi/2 means pure forward motion.
    p1 = StampedPose(t=0.0, x=0.0, y=0.0, theta=math.pi / 2)
    p2 = StampedPose(t=0.025, x=0.0, y=0.025, theta=math.pi / 2)
    (v, vn, w), ok = velocity_from_poses(p1, p2, transform_timeout=0.1)
    assert ok
    assert v == pytest.approx(1.0, abs=1e-9)
    assert vn == pytest.approx(0.0, abs=1e-9)
    assert w == pytest.approx(0.0, abs=1e-9)
    # Stale pair rejected.
    p3 = StampedPose(t=1.0, x=0, y=0, theta=0)
    _, ok = velocity_from_poses(p1, p3, transform_timeout=0.1)
    assert not ok


def test_ingest_unwrap():
    assert unwrap_pose_theta(3.1, -3.1) == pytest.approx(3.1 - 2 * math.pi)
    # Clamp into (-2pi, 2pi).
    assert abs(unwrap_pose_theta(7.0, 6.9)) < 2 * math.pi
