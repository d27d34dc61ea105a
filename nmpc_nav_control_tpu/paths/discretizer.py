"""Path discretization: resample a parametric path into horizon poses.

Faithful reformulation of ``PathDiscretizer::getNextNPoses``
(``PathDiscretizer.cpp:14-63``): starting from the nearest-point parameter,
march along the path in adaptive parameter steps ``du = rel / |dP/du|`` and
emit a pose every ``|vel| * dt`` of accumulated chord length (within the 1%
tolerance, ``percent_error_dist_treshold_``), padding the tail with the
end-of-path pose.  ``num_points_per_cycle`` is 10 (20 when dt >= 1 s),
``PathDiscretizer.cpp:10-11``.

The reference's data-dependent ``while (u < N)`` loop becomes a fixed-length
``lax.scan`` with masking: the iteration budget is
``num_poses * num_points_per_cycle * OVERSHOOT`` — each emission takes
~num_points_per_cycle steps by construction, so a 2x margin covers tolerance
slop and end-of-path clamping.  Whole function jits and vmaps over a
scenario batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from nmpc_nav_control_tpu.paths.pathlist import PathList, pose_sample, vel_sample

__all__ = ["get_next_n_poses"]

PERCENT_ERROR_DIST_THRESHOLD = 1e-2   # PathDiscretizer.cpp:8
OVERSHOOT = 2                          # iteration-budget safety factor


def _seg_speed(plist: PathList, u):
    """|GetVelocity()| of the segment containing u (clamped to the last
    valid segment, ``PathDiscretizer.cpp:26,45``).  One-hot contraction
    instead of a gather for the same fusion reason as ``_locate``."""
    idx = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, plist.count - 1)
    m = plist.segs.velocity.shape[0]
    onehot = (jnp.arange(m) == idx).astype(plist.segs.velocity.dtype)
    return jnp.abs(jnp.tensordot(onehot, plist.segs.velocity, axes=1))


def get_next_n_poses(
    plist: PathList,
    nearest_u,
    sample_period: float,
    num_poses: int,
    is_holonomic: bool = False,
):
    """Resample ``num_poses`` poses spaced |vel|*dt in arc length.

    Args:
      plist: path list (fixed capacity, masked).
      nearest_u: fractional global parameter of the nearest point.
      sample_period: dt between poses (the controller period).
      num_poses: static number of poses to emit (horizon + 1).
      is_holonomic: use the holonomic heading profile.

    Returns [num_poses, 3] (x, y, theta).
    """
    dtype = plist.segs.cx.dtype
    n_cycle = 20 if sample_period >= 1.0 else 10
    budget = num_poses * n_cycle * OVERSHOOT
    n_end = plist.count.astype(dtype)

    speed0 = _seg_speed(plist, nearest_u)
    goal0 = speed0 * sample_period
    rel0 = goal0 / n_cycle
    old0 = pose_sample(plist, nearest_u, is_holonomic)
    dxy0 = vel_sample(plist, nearest_u)
    step0 = rel0 / jnp.sqrt(dxy0[0] ** 2 + dxy0[1] ** 2)

    def body(carry, _):
        u, old, step, goal, rel, curr, emitted = carry
        active = (u < n_end) & (emitted < num_poses)

        u_new = jnp.minimum(u + step, n_end)
        new = pose_sample(plist, u_new, is_holonomic)
        curr_new = curr + jnp.sqrt(
            (new[0] - old[0]) ** 2 + (new[1] - old[1]) ** 2
        )

        emit = active & ((goal - curr_new) <= PERCENT_ERROR_DIST_THRESHOLD * goal)
        slot = emitted                     # output row if this step emits
        speed = _seg_speed(plist, u_new)
        goal = jnp.where(emit, speed * sample_period, goal)
        rel = jnp.where(emit, goal / n_cycle, rel)
        curr_new = jnp.where(emit, jnp.zeros_like(curr_new), curr_new)
        emitted = emitted + emit.astype(jnp.int32)

        dxy = vel_sample(plist, u_new)
        step_new = rel / jnp.sqrt(dxy[0] ** 2 + dxy[1] ** 2)

        # Frozen when inactive.
        u = jnp.where(active, u_new, u)
        old = jnp.where(active, new, old)
        step = jnp.where(active, step_new, step)
        curr = jnp.where(active, curr_new, curr)
        # Emissions ride the scan ys; a per-step dynamic-index scatter into
        # the pose buffer would break XLA fusion at every substep (measured
        # ~25% of the whole FollowPath tick under a fleet vmap).
        return (u, old, step, goal, rel, curr, emitted), (emit, slot, new)

    carry0 = (
        jnp.asarray(nearest_u, dtype), old0, step0, goal0, rel0,
        jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
    )
    # unroll: the body is ~30 scalar ops, so the XLA while-loop's
    # per-iteration overhead dominates the march; unrolled blocks keep
    # bit-identical semantics.
    (u, _, _, _, _, _, emitted), (emits, slots, news) = jax.lax.scan(
        body, carry0, None, length=budget, unroll=8 * n_cycle
    )
    # ONE scatter-add reconstructs the pose table: each output row is
    # written by exactly one emitting substep (slots strictly increase at
    # emissions), so add == set; non-emitting substeps contribute zeros.
    poses = jnp.zeros((num_poses, 3), dtype).at[
        jnp.clip(slots, 0, num_poses - 1)
    ].add(jnp.where(emits[:, None], news, 0.0))

    # Tail padding with the end-of-path pose (``PathDiscretizer.cpp:57-62``).
    last = pose_sample(plist, n_end, is_holonomic)
    idx = jnp.arange(num_poses)
    poses = jnp.where((idx < emitted)[:, None], poses, last[None, :])
    return poses
