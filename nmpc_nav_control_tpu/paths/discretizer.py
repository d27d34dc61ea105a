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

__all__ = ["get_next_n_poses", "get_next_n_poses_fast"]

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


def get_next_n_poses_fast(
    plist: PathList,
    nearest_u,
    sample_period: float,
    num_poses: int,
    is_holonomic: bool = False,
    coarse_samples: int = 64,
    fine_samples: int = 512,
):
    """TPU-native arc-length resampler (same contract as
    :func:`get_next_n_poses`, parallel instead of marched).

    The reference march (``PathDiscretizer.cpp:14-63``) is a sequential
    chain of ~``num_poses * num_points_per_cycle`` adaptive sub-steps; its
    faithful scan reformulation above is DEPTH-bound on TPU — measured 90%
    of the whole FollowPath navigation tick under a fleet vmap
    (``tools/node_probe.py``: 14.4 us/robot vs 0.34 us for the NMPC solve
    itself).  This version inverts the dependency structure:

      1. coarse pass: ``coarse_samples`` chord cumsum over [u0, n_end]
         bounds the parameter window that can hold the horizon's arc
         (``num_poses * dt * max_speed``);
      2. fine pass: ``fine_samples`` exact polynomial samples over that
         window -> chord-cumulative arc table s(u) (one parallel cumsum —
         resolution adapts to the window, ~0.5 mm at 0.5 m/s);
      3. the emission recurrence  t_k = t_{k-1} + |vel(u_{k-1})| * dt,
         u_k = s^{-1}(t_k)  (pose spacing follows the segment speed AT the
         previous emitted pose, exactly the march's goal update) has
         piecewise-constant speeds, so it is solved EXACTLY by one static
         pass over the M segments (targets advance by spacing_j inside
         segment j; the boundary-crossing step keeps j's spacing), then a
         single parallel table inversion for all u_k.  (A Jacobi-sweep
         formulation was tried first and rejected: it needs ~one sweep per
         crossed speed boundary and silently under-converged — 7 cm pose
         error — on short-segment speed-contrast paths.)

    Differences vs the march, by construction: the march emits up to one
    sub-step (~10% of one pose spacing) late and discards the overshoot,
    and accumulates chord over ~goal/10 steps; this resampler emits at the
    exact accumulated-chord target on a finer table.  Deviations are below
    1.5e-3 m at 0.5 m/s (``tests/test_paths.py`` pins them) — an order of
    magnitude inside ``final_position_error`` — with identical end-of-path
    clamping and tail padding.  One DELIBERATE deviation: on a zero-tangent
    (degenerate, constant-point) segment the reference computes
    ``du = rel/|dP/du| -> inf`` and jumps straight to the path end
    (``PathDiscretizer.cpp:31,52``, reproduced by the march above); this
    resampler treats zero tangent as zero arc and keeps resampling the
    remaining path — the sane reading of an input the planner contract
    never produces.  Select per deployment via ``NavConfig.discretizer``
    ("fast" default, "march" for bit-level parity with the reference loop).
    """
    from nmpc_nav_control_tpu.paths.segment import poly_eval

    dtype = plist.segs.cx.dtype
    n_end = plist.count.astype(dtype)
    u0 = jnp.minimum(jnp.asarray(nearest_u, dtype), n_end)
    eps = jnp.asarray(1e-6, dtype)

    DEG = plist.segs.cx.shape[-1]
    cxy = jnp.concatenate([plist.segs.cx, plist.segs.cy], axis=-1)  # [M, 2D]

    def xy_sample(us):
        """[n] global u -> [n, 2] points (positions only — the chord table
        needs no headings, so skip _locate's theta/frame/velocity work;
        cx/cy ride one packed one-hot matmul)."""
        seg_i = jnp.clip(jnp.floor(us).astype(jnp.int32), 0, plist.count - 1)
        lu = jnp.clip(us - seg_i.astype(dtype), 0.0, 1.0)
        m = cxy.shape[0]
        onehot = (seg_i[:, None] == jnp.arange(m)).astype(dtype)   # [n, M]
        cc = onehot @ cxy                                          # [n, 2D]
        return jnp.stack(
            [poly_eval(cc[..., :DEG], lu), poly_eval(cc[..., DEG:], lu)],
            axis=-1)

    def chord_table(lo, hi, n):
        """Chord-cumulative arc lengths [n+1] over a uniform u grid on
        [lo, hi].  Returns (du, s)."""
        frac = jnp.linspace(0.0, 1.0, n + 1, dtype=dtype)
        us = lo + (hi - lo) * frac
        pts = xy_sample(us)
        seglen = jnp.sqrt(jnp.sum(jnp.diff(pts, axis=0) ** 2, axis=1))
        s = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(seglen)])
        return (hi - lo) / n, s

    def invert_arc(t, s, u_lo, du):
        """u(t) by linear interpolation in the (uniform-u, s) table —
        WITHOUT gathers.  ``jnp.interp``'s searchsorted lowers to dynamic
        gathers, which serialize horribly on TPU (measured 69 ms/batch for
        the whole resampler vs 29 ms for the sequential march it was meant
        to replace); masked reductions over the [F] axis keep the whole
        inversion a fused compare+reduce.  Queries beyond the table clamp
        to its last point."""
        le = s[None, :] <= t[:, None]                       # [P, F+1]
        idx = jnp.sum(le, axis=1).astype(dtype) - 1.0       # >= 0 (s[0]=0)
        s_lo = jnp.max(jnp.where(le, s[None, :], -jnp.inf), axis=1)
        s_hi = jnp.min(jnp.where(le, jnp.inf, s[None, :]), axis=1)
        frac = jnp.clip((t - s_lo) / jnp.maximum(s_hi - s_lo, eps), 0.0, 1.0)
        n = s.shape[0] - 1
        return u_lo + jnp.minimum(idx + frac, n) * du

    # --- 1. coarse window bound ---------------------------------------
    cap_idx = jnp.arange(plist.segs.velocity.shape[0])
    valid = cap_idx < plist.count
    max_speed = jnp.max(jnp.where(valid, jnp.abs(plist.segs.velocity), 0.0))
    arc_needed = num_poses * sample_period * max_speed * 1.02 + eps
    duc, sc = chord_table(u0, jnp.maximum(n_end, u0 + eps), coarse_samples)
    u_hi = invert_arc(arc_needed[None], sc, u0, duc)[0]   # clamps at n_end
    u_hi = jnp.minimum(u_hi + duc, n_end)                 # +1 cell margin
    u_hi = jnp.maximum(u_hi, u0 + eps)

    # --- 2. fine arc table --------------------------------------------
    duf, sf = chord_table(u0, u_hi, fine_samples)
    s_total = sf[-1]

    # --- 3. exact per-segment solve of the emission recurrence --------
    # The recurrence  t_k = t_{k-1} + dt * |vel(segment of pose k-1)|  has
    # piecewise-constant speeds, so it is solved EXACTLY by one static
    # pass over the M segments: inside segment j, targets advance by
    # spacing_j = dt * |vel_j| until they cross the segment's end arc S_j;
    # the crossing step keeps segment j's spacing (the march's goal rule:
    # the goal is set by the speed at the PREVIOUS emitted pose).  No
    # per-pose iteration, no convergence question (a Jacobi formulation
    # needed ~one sweep per crossed boundary and silently under-converged
    # on short-segment speed-contrast paths).
    dt_ = jnp.asarray(sample_period, dtype)
    M = plist.segs.velocity.shape[0]
    spacing = jnp.maximum(jnp.abs(plist.segs.velocity) * dt_, eps)   # [M]
    # S_j: table arc at the end of segment j (global u = j+1), gather-free.
    # Table point i sits at u = u0 + i*duf.
    i_tab = jnp.arange(sf.shape[0], dtype=dtype)
    u_tab = u0 + i_tab * duf
    jb = jnp.arange(M, dtype=dtype) + 1.0                            # [M]
    S = jnp.max(jnp.where(u_tab[None, :] <= jb[:, None] + 1e-9,
                          sf[None, :], 0.0), axis=1)                 # [M]

    P = num_poses
    a = _seg_speed(plist, u0) * dt_        # first target (march's goal0)
    k = jnp.zeros((), dtype)
    a_in = []
    K = []
    n_in = []
    for j in range(M):                      # static unroll, no gathers
        sp = spacing[j]
        room = S[j] - a
        n = jnp.where(room >= -1e-12, jnp.floor(room / sp) + 1.0, 0.0)
        n = jnp.clip(n, 0.0, P - k)
        a_in.append(a)
        K.append(k)
        n_in.append(n)
        a = a + n * sp
        k = k + n
    # Targets past the last segment's arc keep stepping with the last
    # spacing (they fall off the table and clamp to the path end anyway).
    a_in.append(a)
    K.append(k)
    n_in.append(jnp.asarray(float(P), dtype) - k)
    a_in, K, n_in = jnp.stack(a_in), jnp.stack(K), jnp.stack(n_in)
    sp_all = jnp.concatenate([spacing, spacing[-1:]])
    ks = jnp.arange(P, dtype=dtype)
    in_j = (ks[None, :] >= K[:, None]) & (ks[None, :] < (K + n_in)[:, None])
    t = jnp.sum(jnp.where(in_j,
                          a_in[:, None] + (ks[None, :] - K[:, None])
                          * sp_all[:, None], 0.0), axis=0)           # [P]
    sp_prev = jnp.diff(jnp.concatenate([jnp.zeros((1,), dtype), t]))

    # --- 4. emission mask + poses + tail padding ----------------------
    # The march's 1% rule counts a >= 99%-complete final interval as
    # emitted; mirror it so the emitted count matches at path end.
    emit = (t - 0.01 * sp_prev) <= s_total
    u_em = jnp.where(emit, invert_arc(t, sf, u0, duf), n_end)
    poses = jax.vmap(lambda u: pose_sample(plist, u, is_holonomic))(u_em)
    last = pose_sample(plist, n_end, is_holonomic)
    emitted = jnp.sum(emit.astype(jnp.int32))
    idx = jnp.arange(num_poses)
    return jnp.where((idx < emitted)[:, None], poses, last[None, :])
