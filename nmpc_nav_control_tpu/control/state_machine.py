"""Navigation state machine — the ROS node's control cycle as pure JAX.

Functional re-implementation of ``NMPCNavControlROS``'s per-tick logic
(``NMPCNavControlROS.cpp:516-720``) so the *entire* tick — state dispatch,
nearest-point projection, path windowing, discretization, safety checks,
termination tests, and the NMPC solve — is one jitted function that batches
over scenarios (every branch becomes masked lanes under ``vmap``).

Statuses (``NMPCNavControlROS.h`` Status enum):
  IDLE, GO_TO_POSE, FOLLOW_PATH, BREAK, ERROR

Replicated behaviors (bug-for-bug where observable):
  - input-validity handling: the pose-validity flag is OVERWRITTEN by the
    velocity-validity flag (reference bug at ``NMPCNavControlROS.cpp:549-550``:
    ``valid_data = getRobotPose(...); valid_data = getRobotVel(...)``), and
    only tric ANDs the steering-angle validity (``:551``);
  - GoToPose safety: distance to goal >= max_goal_pose_dist -> stop + Idle
    (``:620-627``);
  - termination checks compare the *signed* normalized angle error without
    abs() (``:638-639`` and ``:683-684``) — termination fires for any
    negative angle error; replicated as-is;
  - FollowPath safety: position/orientation error to the path vs limits ->
    stop + ERROR (``:654-664``; the orientation check does use fabs);
  - omni4 uses the holonomic path heading; reverse driving adds pi to the
    path heading for the error check (``:654-655``);
  - end-of-trajectory: rotate buffers if upcoming segments remain, else Idle
    (``:682-694``);
  - BREAK: publish a stop command and fall to IDLE (``:612-616``);
  - ERROR is terminal until a new goal/path arrives (``:531-532``).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nmpc_nav_control_tpu.control.controllers import (
    CmdVel,
    ControllerSpec,
    controller_init,
    controller_step,
)
from nmpc_nav_control_tpu.ocp.spec import OCPData
from nmpc_nav_control_tpu.paths.discretizer import (
    get_next_n_poses,
    get_next_n_poses_fast,
)
from nmpc_nav_control_tpu.paths.projection import project_to_path
from nmpc_nav_control_tpu.paths.windowing import (
    PathWindow,
    active_path_list,
    path_remains,
    pop_completed,
    rotate_end_of_curve,
    top_up,
    window_init,
)
from nmpc_nav_control_tpu.rti.step import RTIState, rti_reset
from nmpc_nav_control_tpu.utils.angles import dist, norm_ang_rad

__all__ = [
    "IDLE", "GO_TO_POSE", "FOLLOW_PATH", "BREAK", "ERROR",
    "STATUS_IDLE", "STATUS_WORKING", "STATUS_ERROR",
    "NavConfig", "NodeState", "Measurements", "TickOutput",
    "node_init", "on_goal_pose", "on_path_set", "on_command", "node_tick",
]

# Status enum (NMPCNavControlROS.h).
IDLE, GO_TO_POSE, FOLLOW_PATH, BREAK, ERROR = range(5)
# Published control_status codes (itrci_nav parametric_trajectories_control_status).
STATUS_IDLE, STATUS_WORKING, STATUS_ERROR = 0, 1, 2


@dataclasses.dataclass(frozen=True)
class NavConfig:
    """Static runtime parameters (``readParam``, ``NMPCNavControlROS.cpp:44-77``;
    YAML ``config/nmpc_nav_control.yaml``). Angles in radians."""

    final_position_error: float = 0.01
    final_orientation_error: float = 0.017453292519943295  # 1 deg
    enable_safe_conditions: bool = True
    max_goal_pose_dist: float = 2.0
    max_pos_error_to_path: float = 0.5
    max_ori_error_to_path: float = 1.0471975511965976      # 60 deg
    max_active_path_length: float = 5.0
    path_capacity: int = 16
    # Arc-length resampler: "fast" = parallel chord-table inversion (the
    # TPU-native default; poses within ~1.5e-3 m of the march at 0.5 m/s),
    # "march" = the faithful scan form of the reference's adaptive loop
    # (``PathDiscretizer.cpp:14-63``) for bit-level parity runs.
    discretizer: str = "fast"


class NodeState(NamedTuple):
    status: jnp.ndarray          # [] int32
    goal_pose: jnp.ndarray       # [3]
    window: PathWindow
    active_path_u: jnp.ndarray   # [] fractional parameter into the window
    rti: RTIState
    request_id: jnp.ndarray      # [] int32 (ParametricPathSet2 request_id)


class Measurements(NamedTuple):
    """Host-side state ingest (the TF-acquisition boundary, ``:401-506``)."""

    pose: jnp.ndarray          # [3] (x, y, theta), theta pre-unwrapped by ingest
    vel: jnp.ndarray           # [3] (v, vn, w) body velocity
    steer_angle: jnp.ndarray   # [] measured steering-wheel angle (tric)
    pose_valid: jnp.ndarray    # [] bool
    vel_valid: jnp.ndarray     # [] bool
    steer_valid: jnp.ndarray   # [] bool


class TickOutput(NamedTuple):
    cmd: CmdVel                # command triple (already zeroed when stopping)
    publish_cmd: jnp.ndarray   # [] bool — whether cmd_vel is published this tick
    status_code: jnp.ndarray   # [] int32 STATUS_* for the control_status topic
    request_id: jnp.ndarray    # [] int32
    path_remains: jnp.ndarray  # [] float
    kkt_res: jnp.ndarray       # [] solver KKT residual
    solve_ok: jnp.ndarray      # [] bool
    debug_path: jnp.ndarray    # [N+1, 3] discretized reference poses
                               #   (``pubDebugDiscretizedPath``, ``:722-738``)
    publish_debug: jnp.ndarray # [] bool — FollowPath ticks only (``:670``)
    active_path_u: jnp.ndarray # [] fractional u for the actual_path topic
                               #   (``pubActualPath``, ``:390-399``)
    # ``actual_path`` re-publication payload: the front active curve on
    # solving FollowPath ticks (``pubActualPath``, ``:390-399,696``).  The
    # host re-encodes it via ``runtime.messages.encode_path_set``.
    publish_actual: jnp.ndarray   # [] bool
    actual_cx: jnp.ndarray        # [DEG]
    actual_cy: jnp.ndarray        # [DEG]
    actual_ch: jnp.ndarray        # [DEG]
    actual_velocity: jnp.ndarray  # []
    actual_frame: jnp.ndarray     # [] int32 frame code of that curve
    # Frame the measured pose must be expressed in NEXT tick: the front
    # active curve after any end-of-curve rotation (the reference re-acquires
    # the pose in ``active_path_.front().GetFrameId()`` each FollowPath tick,
    # ``mainCycle``, ``:520-524``).  0 = no active path.
    next_frame: jnp.ndarray       # [] int32


def node_init(spec: ControllerSpec, cfg: NavConfig, dtype=jnp.float32) -> NodeState:
    return NodeState(
        status=jnp.asarray(IDLE, jnp.int32),
        goal_pose=jnp.zeros(3, dtype),
        window=window_init(cfg.path_capacity, dtype),
        active_path_u=jnp.zeros((), dtype),
        rti=controller_init(spec, dtype),
        request_id=jnp.zeros((), jnp.int32),
    )


def on_goal_pose(state: NodeState, goal_pose) -> NodeState:
    """pose_goal received (``goalPoseReceivedCallback``, ``:304-310``)."""
    return state._replace(
        status=jnp.asarray(GO_TO_POSE, jnp.int32),
        goal_pose=jnp.asarray(goal_pose, state.goal_pose.dtype),
        rti=rti_reset(state.rti),
    )


def on_path_set(state: NodeState, cfg: NavConfig, new_segs, n_new,
                request_id=0) -> NodeState:
    """Path set received (``pathNoStackUp2ReceivedCallback`` +
    ``processPathReceived``, ``:319-327,555-574``).  Status becomes
    FOLLOW_PATH even for an empty set, and an empty set leaves the existing
    buffers untouched (reference quirk: the status is set and the early
    return happens *before* the buffers are cleared, ``:557-562``)."""
    from nmpc_nav_control_tpu.paths.windowing import ingest

    nonempty = jnp.asarray(n_new, jnp.int32) > 0
    window = ingest(state.window, new_segs, n_new, cfg.max_active_path_length)
    window = jax.tree_util.tree_map(
        lambda a, b: jnp.where(nonempty, a, b), window, state.window
    )
    return state._replace(
        status=jnp.asarray(FOLLOW_PATH, jnp.int32),
        window=window,
        active_path_u=jnp.where(
            nonempty, jnp.zeros_like(state.active_path_u), state.active_path_u
        ),
        rti=rti_reset(state.rti),
        request_id=jnp.asarray(request_id, jnp.int32),
    )


def on_command(state: NodeState, command: str) -> NodeState:
    """'break' / 'idle' operator command (``controlCommandReceivedCallback``,
    ``:329-336``). Unknown commands leave the state unchanged (error logged
    by the host layer)."""
    if command == "break":
        return state._replace(status=jnp.asarray(BREAK, jnp.int32))
    if command == "idle":
        return state._replace(status=jnp.asarray(IDLE, jnp.int32))
    return state


def node_tick(
    spec: ControllerSpec,
    data: OCPData,
    cfg: NavConfig,
    state: NodeState,
    meas: Measurements,
):
    """One 40 Hz control cycle (``mainCycle``, ``:516-538``).

    Returns (new_state, TickOutput).  Fully traced: jit once, vmap over a
    scenario batch for fleet-scale evaluation.
    """
    dims = spec.dims
    dtype = state.goal_pose.dtype
    N = dims.N
    is_omni = spec.geometry == "omni4"
    is_tric = spec.geometry == "tric"

    pose, vel = meas.pose, meas.vel
    zero = jnp.zeros((), dtype)
    false = jnp.zeros((), bool)
    true = jnp.ones((), bool)

    # --- Input validity (replicates the overwrite bug: pose validity is
    # ignored; only vel [& steer for tric] gates, ``:545-553``). ---
    valid_input = meas.vel_valid & (meas.steer_valid if is_tric else true)
    active = (state.status == GO_TO_POSE) | (state.status == FOLLOW_PATH) | (
        state.status == BREAK
    )
    status = jnp.where(active & ~valid_input, ERROR, state.status)

    # =================== GoToPose plan (``processGoToPose``) ===================
    goal = state.goal_pose
    d_goal = dist(goal[0], goal[1], pose[0], pose[1])
    too_far = cfg.enable_safe_conditions & (d_goal >= cfg.max_goal_pose_dist)
    ang_goal = norm_ang_rad(pose[2] - goal[2])          # signed, no abs (ref)
    at_goal = (d_goal <= cfg.final_position_error) & (
        ang_goal <= cfg.final_orientation_error
    )
    gtp_stop = too_far | at_goal
    gtp_solve = ~gtp_stop
    traj_gtp = jnp.zeros((N + 1, 3), dtype).at[0].set(goal)

    # =================== FollowPath plan (``processFollowPath``) ==============
    plist_full = active_path_list(state.window, cfg.path_capacity)
    proj = project_to_path(plist_full, pose[0], pose[1])
    win_popped, u_popped = pop_completed(state.window, proj.u)
    win_fp = top_up(win_popped, u_popped, cfg.max_active_path_length)
    plist = active_path_list(win_fp, cfg.path_capacity)

    front_vel = plist.segs.velocity[0]
    theta_path = jnp.where(
        jnp.asarray(is_omni),
        proj.theta_holonomic,
        jnp.where(front_vel < 0.0, proj.theta + jnp.pi, proj.theta),
    )
    pos_err = dist(proj.x, proj.y, pose[0], pose[1])
    ori_err = jnp.abs(norm_ang_rad(theta_path - pose[2]))
    fp_unsafe = cfg.enable_safe_conditions & (
        (pos_err >= cfg.max_pos_error_to_path) | (ori_err >= cfg.max_ori_error_to_path)
    )

    discretize = (
        get_next_n_poses_fast if cfg.discretizer == "fast" else get_next_n_poses
    )
    traj_fp = discretize(
        plist, u_popped, dims.dt, N + 1, is_holonomic=is_omni
    ).astype(dtype)
    last_pose = traj_fp[-1]
    d_end = dist(pose[0], pose[1], last_pose[0], last_pose[1])
    ang_end = norm_ang_rad(pose[2] - last_pose[2])       # signed, no abs (ref)
    fp_at_end = (d_end <= cfg.final_position_error) & (
        ang_end <= cfg.final_orientation_error
    )
    has_upcoming = win_fp.total_count > win_fp.active_count
    win_rotated = rotate_end_of_curve(win_fp)

    fp_stop = fp_unsafe | fp_at_end
    fp_solve = ~fp_stop

    # =================== Status-dependent selection ===========================
    in_gtp = status == GO_TO_POSE
    in_fp = status == FOLLOW_PATH
    in_break = status == BREAK

    solve = (in_gtp & gtp_solve) | (in_fp & fp_solve)
    traj = jnp.where(in_fp, traj_fp, traj_gtp)
    n_valid = jnp.where(in_fp, N + 1, 1)

    # Window/parameter updates only apply in FollowPath.
    def sel_window(w_new: PathWindow, w_old: PathWindow, take):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(take, a, b), w_new, w_old
        )

    win_after = sel_window(
        sel_window(win_rotated, win_fp, fp_at_end & has_upcoming),
        state.window,
        in_fp,
    )
    u_after = jnp.where(in_fp, u_popped, state.active_path_u)

    # =================== Solve (masked) =======================================
    new_rti, cmd, stats = controller_step(
        spec, data, state.rti, pose, vel, traj, n_valid,
        steer_angle=meas.steer_angle,
    )
    solve_ok = stats.ok | ~solve
    rti_after = jax.tree_util.tree_map(
        lambda a, b: jnp.where(solve, a, b), new_rti, state.rti
    )

    # =================== Command output =======================================
    # Stop command: zeroed cmd (the tric quirk — angular.z carries the
    # measured steering angle even when stopping — is applied by the runtime
    # Twist encoder, ``pubCmdVel``, ``:338-362``).
    stop_cmd = (in_gtp & gtp_stop) | (in_fp & fp_stop) | in_break
    publish = stop_cmd | (solve & stats.ok)
    cmd_out = CmdVel(
        v=jnp.where(stop_cmd, zero, cmd.v),
        vn=jnp.where(stop_cmd, zero, cmd.vn),
        w=jnp.where(stop_cmd, zero, cmd.w),
    )

    # =================== Status transitions ===================================
    # GoToPose: too-far or at-goal -> Idle.  FollowPath: unsafe -> Error;
    # at-end with no upcoming -> Idle.  Break -> Idle.  Solver failure -> Error
    # (``executeNMPC`` catch, ``:716-719``).
    status = jnp.where(in_gtp & gtp_stop, IDLE, status)
    status = jnp.where(in_fp & fp_unsafe, ERROR, status)
    status = jnp.where(in_fp & ~fp_unsafe & fp_at_end & ~has_upcoming, IDLE, status)
    status = jnp.where(in_break, IDLE, status)
    status = jnp.where(solve & ~stats.ok, ERROR, status)
    status = status.astype(jnp.int32)

    # =================== control_status output (``pubControlStatus``) =========
    status_code = jnp.where(
        (status == IDLE) | (status == BREAK),
        STATUS_IDLE,
        jnp.where(status == ERROR, STATUS_ERROR, STATUS_WORKING),
    ).astype(jnp.int32)
    remains = jnp.where(in_fp, path_remains(win_after, u_after), zero)

    new_state = NodeState(
        status=status,
        goal_pose=state.goal_pose,
        window=win_after,
        active_path_u=u_after,
        rti=rti_after,
        request_id=state.request_id,
    )
    # actual_path payload: front active curve of the post-pop/top-up window
    # (pubActualPath runs before any end-of-curve rotation, ``:696``).
    cap = cfg.path_capacity
    from nmpc_nav_control_tpu.paths.windowing import select_rows

    front_fp = select_rows(win_fp.segs, jnp.clip(win_fp.head, 0, cap - 1))
    publish_actual = in_fp & fp_solve & (win_fp.active_count > 0)
    next_front = jnp.clip(win_after.head, 0, cap - 1)
    next_frame = jnp.where(
        in_fp & (win_after.active_count > 0),
        win_after.segs.frame_id[next_front],
        jnp.zeros((), jnp.int32),
    ).astype(jnp.int32)

    out = TickOutput(
        cmd=cmd_out,
        publish_cmd=publish,
        status_code=status_code,
        request_id=state.request_id,
        path_remains=remains,
        kkt_res=stats.kkt_res,
        solve_ok=solve_ok,
        debug_path=traj_fp,
        publish_debug=in_fp & ~fp_unsafe,
        active_path_u=u_after,
        publish_actual=publish_actual,
        actual_cx=front_fp.cx,
        actual_cy=front_fp.cy,
        actual_ch=front_fp.ch,
        actual_velocity=front_fp.velocity,
        actual_frame=front_fp.frame_id.astype(jnp.int32),
        next_frame=next_frame,
    )
    return new_state, out
