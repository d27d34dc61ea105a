"""Host-side state ingest: the TF-acquisition boundary.

The reference pulls robot state from tf2 (``NMPCNavControlROS.cpp:401-506``);
in the TPU build this is the host-side boundary where measurements enter the
jitted control step.  This module reproduces the reference's estimation
logic so any pose source (mocap, localization, sim) plugs in:

  - ``unwrap_pose_theta``: the +-2pi unwrap-vs-last-theta hack applied to the
    measured yaw ("Bug fix for the angle wrap in acados solver", ``:413-423``)
    including the +-2pi range clamp;
  - ``velocity_from_poses``: finite-difference body velocity from two stamped
    poses using the mid-yaw rotation into the robot frame (``:438-484``);
  - staleness gates matching ``transform_timeout`` (``:425-430, :449-453``).
"""
from __future__ import annotations

import dataclasses
import math

from nmpc_nav_control_tpu.utils import norm_ang_rad as _norm_ang_rad_jnp

__all__ = ["StampedPose", "unwrap_pose_theta", "velocity_from_poses", "pose_is_fresh"]


@dataclasses.dataclass
class StampedPose:
    t: float        # seconds
    x: float
    y: float
    theta: float    # yaw


def _norm_ang_rad(a: float) -> float:
    return math.fmod(a + math.pi, 2 * math.pi) + (
        2 * math.pi if math.fmod(a + math.pi, 2 * math.pi) < 0 else 0.0
    ) - math.pi


def unwrap_pose_theta(curr_theta: float, last_theta: float) -> float:
    """The getRobotPose unwrap hack (``:413-423``): one +-2pi correction
    against the previous tick's theta, then clamp into (-2pi, 2pi)."""
    delta = curr_theta - last_theta
    if delta > math.pi:
        curr_theta -= 2.0 * math.pi
    elif delta < -math.pi:
        curr_theta += 2.0 * math.pi
    while curr_theta >= 2.0 * math.pi:
        curr_theta -= 2.0 * math.pi
    while curr_theta <= -2.0 * math.pi:
        curr_theta += 2.0 * math.pi
    return curr_theta


def pose_is_fresh(pose_t: float, now: float, transform_timeout: float) -> bool:
    """Staleness gate (``:425-430``)."""
    return (now - pose_t) <= transform_timeout


def velocity_from_poses(p1: StampedPose, p2: StampedPose,
                        transform_timeout: float):
    """Finite-difference body velocity (``getRobotVel``, ``:438-484``).

    Returns ((v, vn, w), valid).  Invalid when dt <= 0 or dt > timeout
    (``:449-453``).
    """
    dt = p2.t - p1.t
    if dt <= 0.0 or dt > transform_timeout:
        return (0.0, 0.0, 0.0), False
    dx = p2.x - p1.x
    dy = p2.y - p1.y
    dyaw = _norm_ang_rad(p2.theta - p1.theta)
    mid_yaw = p1.theta + dyaw / 2.0
    vx_g = dx / dt
    vy_g = dy / dt
    cos_y = math.cos(-mid_yaw)
    sin_y = math.sin(-mid_yaw)
    v = vx_g * cos_y - vy_g * sin_y
    vn = vx_g * sin_y + vy_g * cos_y
    w = dyaw / dt
    return (v, vn, w), True
