"""Host-side controller node: the ``NMPCNavControlROS`` equivalent.

Owns the static controller (spec/data/cfg), the jitted tick, and the device
state pytree; exposes message-level callbacks and a per-cycle ``tick`` that
consumes measurements and returns outgoing messages.  The device boundary is
exactly one host->device transfer (measurements) and one device->host
transfer (command + status) per cycle.

Reference behaviors carried over:
  - callbacks: pose_goal / path_no_stack_up(_2) / control_command
    (``NMPCNavControlROS.cpp:304-336``);
  - Twist encoding incl. the tric quirk: ``angular.z`` carries the *measured*
    steering-wheel angle, even for stop commands (``pubCmdVel``, ``:338-362``);
  - control_status publishing every tick (``:364-388``);
  - per-cycle wall-time + solver-time accounting (the ROS_DEBUG timing hooks,
    ``:508-514,715``) surfaced as p50/p99 stats.
"""
from __future__ import annotations

import collections
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nmpc_nav_control_tpu.control import make_controller
from nmpc_nav_control_tpu.control.state_machine import (
    Measurements,
    NodeState,
    node_init,
    node_tick,
    on_command,
    on_goal_pose,
    on_path_set,
)
from nmpc_nav_control_tpu.runtime.config import RobotConfig
from nmpc_nav_control_tpu.runtime.messages import (
    ControlStatus,
    FrameTable,
    ParametricPathSet,
    ParametricPathSet2,
    PoseStamped,
    Twist,
    decode_path_set,
    encode_path_set,
)
from nmpc_nav_control_tpu.utils.telemetry import channel, metrics

__all__ = ["NmpcNavControlNode"]

# Structured-log channels, named after the reference's ROS logger channels
# (``ROS_DEBUG_NAMED("main_cycle", ...)`` at ``NMPCNavControlROS.cpp:513``,
# ``ROS_DEBUG_NAMED("nmpc_solver", ...)`` at ``:715``; warnings/errors use
# the node channel like the un-named ROS_WARN/ERROR sites).
_log_cycle = channel("main_cycle")
_log_solver = channel("nmpc_solver")
_log_node = channel("node")
_STATUS_NAMES = {0: "idle", 1: "working", 2: "error"}


class NmpcNavControlNode:
    """Single-robot host controller (the batched/fleet path uses
    ``control.state_machine.node_tick`` under ``vmap`` directly)."""

    def __init__(self, config: RobotConfig, dtype=jnp.float32,
                 debug_outputs: bool = False):
        self.config = config
        self.dtype = dtype
        self.debug_outputs = debug_outputs
        self.last_debug_path = None      # [N+1, 3] poses (pubDebugDiscretizedPath)
        self.last_actual_path_u = 0.0    # AuxNum0 of the actual_path topic
        # actual_path re-publication: the front active curve + AuxNum0 = u,
        # refreshed on every solving FollowPath tick (``pubActualPath``,
        # ``NMPCNavControlROS.cpp:390-399,696``); None when not published.
        self.last_actual_path: Optional[ParametricPathSet] = None
        self.frames = FrameTable()
        # Frame-transform hook (the tf2 lookup boundary): callable
        # (pose (x,y,theta), from_frame, to_frame) -> pose or None on
        # failure.  The reference re-acquires the pose in the frame of the
        # goal / the front active curve every tick (``mainCycle``,
        # ``:520-524``); with this hook a window rotating into a new
        # frame_id re-expresses the measured pose the same way.
        self.frame_transformer = None
        self._required_frame = config.global_frame_id
        self.spec, self.data = make_controller(
            config.steering_geometry,
            config.dt,
            config.horizon,
            dtype=dtype,
            **config.controller_kwargs(),
        )
        self.cfg = config.nav
        self.state: NodeState = node_init(self.spec, self.cfg, dtype)
        self._tick = jax.jit(
            lambda s, m: node_tick(self.spec, self.data, self.cfg, s, m)
        )
        self._steer_angle = 0.0
        # Bounded history windows: at 40 Hz an unbounded list is a slow leak
        # in a long-running controller.  4096 samples ≈ 100 s of history —
        # plenty for p50/p99 while keeping memory constant.
        self._cycle_times: collections.deque = collections.deque(maxlen=4096)
        self._solver_kkt: collections.deque = collections.deque(maxlen=4096)
        self._total_cycles = 0
        # Raw controller command from the last tick, pre Twist-encoding:
        # (v, vn, w) — for tric, w is alpha_ref (the Twist carries the
        # *measured* angle per the reference quirk). None until a tick
        # publishes.
        self.last_cmd: Optional[tuple] = None
        self._last_status_code: Optional[int] = None
        self._metrics = metrics()

    # ------------------------------------------------------------------ #
    # Callbacks (subscriber equivalents)
    # ------------------------------------------------------------------ #

    def on_pose_goal(self, msg: PoseStamped) -> None:
        """``goalPoseReceivedCallback`` (``:304-310``).  GoToPose ticks
        acquire the pose in the GOAL's frame (``mainCycle``, ``:520``)."""
        goal = jnp.asarray([msg.x, msg.y, msg.theta], self.dtype)
        self.state = on_goal_pose(self.state, goal)
        self._required_frame = msg.frame_id or self.config.global_frame_id

    def on_path_no_stack_up(self, msg: ParametricPathSet) -> None:
        """v1 path topic: request_id forced to 0 (``:312-317``)."""
        self._ingest_paths(msg.paths, request_id=0)

    def on_path_no_stack_up_2(self, msg: ParametricPathSet2) -> None:
        """v2 path topic with request_id (``:319-327``)."""
        self._ingest_paths(msg.paths, request_id=msg.request_id)

    def _ingest_paths(self, paths, request_id: int) -> None:
        segs, n = decode_path_set(
            ParametricPathSet(paths=list(paths)),
            self.frames,
            self.cfg.path_capacity,
            self.dtype,
        )
        self.state = on_path_set(self.state, self.cfg, segs, n, request_id)
        # FollowPath ticks acquire the pose in the FRONT ACTIVE curve's frame
        # (``mainCycle``, ``:523``) — the first valid segment after ingest.
        for p in paths:
            if p.frame_id:
                self._required_frame = p.frame_id
                break

    def on_control_command(self, command: str) -> bool:
        """``controlCommandReceivedCallback`` (``:329-336``).  Returns False
        for an invalid command (the host logs the error)."""
        if command not in ("break", "idle"):
            # ROS_ERROR for an unknown command string (``:334``).
            _log_node.error("invalid_control_command", command=command)
            return False
        self.state = on_command(self.state, command)
        return True

    def set_steering_wheel_angle(self, angle: float) -> None:
        """tric steering-angle ingest (``getSteeringWheelAngle``, ``:486-506``)."""
        self._steer_angle = float(angle)

    # ------------------------------------------------------------------ #
    # Control cycle
    # ------------------------------------------------------------------ #

    def required_frame(self) -> str:
        """Frame the measured pose must be expressed in this tick (goal frame
        in GoToPose, front active curve's frame in FollowPath — ``mainCycle``,
        ``:520-524``)."""
        return self._required_frame

    def tick(self, pose, vel, pose_valid=True, vel_valid=True,
             steer_valid=True, pose_frame: Optional[str] = None):
        """One control cycle. Returns (Twist | None, ControlStatus).

        ``pose``: (x, y, theta); ``vel``: (v, vn, w) body velocity.  When
        ``pose_frame`` is given and differs from :meth:`required_frame`, the
        pose is re-expressed via ``frame_transformer`` (body velocity is
        frame-independent for static planar frames).  A failed/missing
        transform invalidates the measurements — the tf2-exception path that
        drives the reference to Error (``getRobotPose`` catch, ``:431-434``).
        A ``None`` Twist means no cmd_vel is published this tick (Idle/Error).
        """
        t0 = time.perf_counter()
        required = self.required_frame()
        if pose_frame is not None and pose_frame != required:
            new_pose = None
            if self.frame_transformer is not None:
                new_pose = self.frame_transformer(pose, pose_frame, required)
            if new_pose is None:
                # Both the pose and velocity lookups fail in the reference
                # when the transform is unavailable (the tf2-exception warn
                # path, ``getRobotPose``, ``:431-434``).
                _log_node.warning("pose_transform_failed",
                                  from_frame=pose_frame, to_frame=required)
                pose_valid = False
                vel_valid = False
            else:
                pose = new_pose
        meas = Measurements(
            pose=jnp.asarray(pose, self.dtype),
            vel=jnp.asarray(vel, self.dtype),
            steer_angle=jnp.asarray(self._steer_angle, self.dtype),
            pose_valid=jnp.asarray(bool(pose_valid)),
            vel_valid=jnp.asarray(bool(vel_valid)),
            steer_valid=jnp.asarray(bool(steer_valid)),
        )
        self.state, out = self._tick(self.state, meas)
        # Pull every host-needed output in ONE batched device->host transfer;
        # per-field float() would pay a tunnel round-trip each.
        out = jax.device_get(out)

        publish = bool(out.publish_cmd)
        twist: Optional[Twist] = None
        if publish:
            v = float(out.cmd.v)
            vn = float(out.cmd.vn)
            w = float(out.cmd.w)
            self.last_cmd = (v, vn, w)
            if self.spec.geometry == "tric":
                # Reference quirk: cmd_vel.angular.z carries the MEASURED
                # steering angle, not alpha_ref — even when stopping
                # (``pubCmdVel``, ``:351-355``).
                twist = Twist(linear_x=v, linear_y=0.0,
                              angular_z=self._steer_angle)
            elif self.spec.geometry == "diff":
                twist = Twist(linear_x=v, linear_y=0.0, angular_z=w)
            else:
                twist = Twist(linear_x=v, linear_y=vn, angular_z=w)

        status = ControlStatus(
            status=int(out.status_code),
            request_id=int(out.request_id),
            path_remains=float(out.path_remains),
        )
        # actual_path re-publication (``pubActualPath``, ``:390-399,696``):
        # front active curve + AuxNum0 = u on every solving FollowPath tick.
        if bool(out.publish_actual):
            self.last_actual_path = encode_path_set(
                out.actual_cx, out.actual_cy, out.actual_ch,
                out.actual_velocity, out.actual_frame, self.frames,
                out.active_path_u,
            )
        else:
            self.last_actual_path = None
        # Track the frame required by the NEXT FollowPath tick (the window
        # may have rotated into a new frame_id this tick).
        nf = int(out.next_frame)
        if nf > 0:
            self._required_frame = self.frames.name(nf)
        if self.debug_outputs:
            # debug_discretized_path payload (``pubDebugDiscretizedPath``,
            # ``:722-738``).
            self.last_debug_path = (
                np.asarray(out.debug_path) if bool(out.publish_debug) else None
            )
            self.last_actual_path_u = float(out.active_path_u)
        cycle_s = time.perf_counter() - t0
        kkt = float(out.kkt_res)
        self._cycle_times.append(cycle_s)
        self._solver_kkt.append(kkt)
        self._total_cycles += 1

        # --- Structured logs + metrics (per-tick hot path: guarded debug
        # logs, GIL-atomic metric updates only). ---
        m = self._metrics
        m.counter("node.ticks").inc()
        if publish:
            m.counter("node.cmds_published").inc()
        m.gauge("node.cycle_ms").set(cycle_s * 1e3)
        m.gauge("node.kkt_res").set(kkt)
        m.gauge("node.status").set(status.status)
        if status.status != self._last_status_code:
            name = _STATUS_NAMES.get(status.status, str(status.status))
            log = _log_node.warning if status.status == 2 else _log_node.info
            log("status_change", status=name, request_id=status.request_id,
                path_remains=round(status.path_remains, 3))
            if status.status == 2:
                m.counter("node.error_transitions").inc()
            self._last_status_code = status.status
        # The reference's per-tick DEBUG channels (``:513`` main_cycle wall
        # time, ``:715`` solver time/KKT).
        _log_cycle.debug("tick", cycle_ms=round(cycle_s * 1e3, 3),
                         budget_ms=round(self.config.dt * 1e3, 3))
        _log_solver.debug("solve", kkt_res=kkt, status=status.status)
        return twist, status

    # ------------------------------------------------------------------ #
    # Observability (the ROS_DEBUG timing hooks, ``:508-514,715``)
    # ------------------------------------------------------------------ #

    def timing_stats(self) -> dict:
        if not self._cycle_times:
            return {}
        t = np.asarray(self._cycle_times) * 1e3
        return {
            "cycles": self._total_cycles,
            "window": len(t),
            "p50_ms": float(np.percentile(t, 50)),
            "p99_ms": float(np.percentile(t, 99)),
            "max_ms": float(t.max()),
            "budget_ms": self.config.dt * 1e3,
            "last_kkt": self._solver_kkt[-1],
        }
