"""Real-Time Iteration (RTI) SQP step.

Functional equivalent of one ``{name}_acados_solve()`` call on an SQP_RTI
capsule (``scripts/diff/generate_c_code.py:74``) *plus* the surrounding
per-tick controller logic of ``NMPCNavControl{Diff,Omni4,Tric}::run``:

  1. pin x0 as lbx = ubx at stage 0        (``NMPCNavControlDiff.cpp:96-101``)
  2. build yref with the theta-unwrap chain seeded at the robot theta and
     tail padding with the last pose       (``NMPCNavControlDiff.cpp:104-118``)
  3. diff-only adaptive terminal weight: if the last two pose refs are
     identical, scale the pose entries of W_e by 100
                                           (``NMPCNavControlDiff.cpp:126-139``;
     present but commented out for tric, ``NMPCNavControlTric.cpp:131-145``;
     absent for omni4)
  4. ONE Gauss-Newton linearize -> QP -> expand iteration, warm-started from
     the previous solution (acados keeps the trajectory in the capsule; here
     it is an explicit ``RTIState`` pytree)
  5. read u0, integrate the reference entries ``ref += u0 * dt``, and carry
     the predicted stage-1 state with those integrated refs as next tick's
     initial state                         (``NMPCNavControlDiff.cpp:155-173``)

Everything is traced: the whole step jits as a single XLA program and vmaps
over a scenario batch.  The Gauss-Newton structure (NONLINEAR_LS with
y = (x, u), J = I) makes stage Hessians exactly ``diag(Q), diag(R)``
(``scripts/diff/generate_c_code.py:30-39``, ``hessian_approx='GAUSS_NEWTON'``).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nmpc_nav_control_tpu.ocp.integrator import linearize_trajectory
from nmpc_nav_control_tpu.ocp.spec import OCPData, OCPDims
from nmpc_nav_control_tpu.qp.ipm import BoxQP, solve_box_qp
from nmpc_nav_control_tpu.utils.angles import unwrap_angle

__all__ = ["RTIConfig", "RTIState", "RTIStats", "rti_init", "rti_reset", "rti_step"]


@dataclasses.dataclass(frozen=True)
class RTIConfig:
    """Static RTI solver configuration.

    ``spars``: optional static (A_pattern, B_pattern) structural-nonzero
    masks of the stage Jacobians (``ocp.sparsity.detect_jacobian_sparsity``),
    exploited by the fused TPU IPM kernels; None = dense.
    """

    dims: OCPDims
    ipm_iters: int = 8
    adaptive_terminal_weight: bool = False  # the diff-only x100 pose-weight hack
    adaptive_terminal_scale: float = 100.0
    ipm_reg: float = 1e-8
    spars: tuple | None = None


class RTIState(NamedTuple):
    """Warm-start state — the explicit pytree replacing the acados capsule's
    internal primal trajectory plus the controller-held ``acados_in_.x0``.

    xs: [N+1, nx] primal state trajectory (linearization point).
    us: [N, nu]   primal input trajectory.
    x0_carry: [nx] next-tick initial state: predicted stage-1 state with the
       reference entries overwritten by the integrated refs
       (``NMPCNavControlDiff.cpp:168-173``).  The control layer overwrites the
       measured entries (pose, velocities) each tick before calling
       ``rti_step``; only the ref entries persist (and survive ``rti_reset``,
       matching the reference where ``acados_reset`` does not touch
       ``acados_in_``).
    """

    xs: jnp.ndarray
    us: jnp.ndarray
    x0_carry: jnp.ndarray


class RTIStats(NamedTuple):
    kkt_res: jnp.ndarray   # [] inf-norm stationarity residual (acados inf_norm_res analog)
    mu: jnp.ndarray        # [] final IPM complementarity
    ok: jnp.ndarray        # [] bool: solution finite (acados status==0 analog)


def rti_init(dims: OCPDims, dtype=jnp.float32) -> RTIState:
    """Fresh solver state (zeros — acados capsule create/zero-init,
    ``NMPCNavControlDiff.cpp:14-15``)."""
    m = dims.model
    return RTIState(
        xs=jnp.zeros((dims.N + 1, m.nx), dtype),
        us=jnp.zeros((dims.N, m.nu), dtype),
        x0_carry=jnp.zeros((m.nx,), dtype),
    )


def rti_reset(state: RTIState) -> RTIState:
    """Reset the solver memory, keep the carried initial state.

    ``{name}_acados_reset(capsule, 1)`` zeroes the solver's primal/dual
    trajectory (``NMPCNavControlDiff.cpp:177-181``) but ``acados_in_.x0`` is
    untouched, so integrated reference entries persist across path/goal
    changes.
    """
    return RTIState(
        xs=jnp.zeros_like(state.xs),
        us=jnp.zeros_like(state.us),
        x0_carry=state.x0_carry,
    )


def build_yref(N: int, robot_theta, traj_xy_theta, n_valid):
    """Unwrap-and-pad reference build (``NMPCNavControlDiff.cpp:104-118``).

    Args:
      N: horizon (produces N+1 rows).
      robot_theta: seed for the unwrap chain (the measured robot heading).
      traj_xy_theta: [N+1, 3] candidate poses (rows >= n_valid ignored).
      n_valid: number of valid rows (traced; 1 for pose-goal mode).

    Returns [N+1, 3] with the theta chain unwrapped and the tail padded with
    the last valid (unwrapped) pose.
    """

    def step(carry, inp):
        prev_theta, last_pose = carry
        pose_i, i = inp
        valid = i < n_valid
        theta_u = unwrap_angle(pose_i[2], prev_theta)
        pose = jnp.where(valid, jnp.stack([pose_i[0], pose_i[1], theta_u]), last_pose)
        return (pose[2], pose), pose

    idx = jnp.arange(N + 1)
    init = (robot_theta, jnp.zeros(3, traj_xy_theta.dtype))
    # Fully unrolled: the body is a handful of scalar-ish ops, so the XLA
    # while-loop's per-iteration overhead dominated (~15% of the whole
    # control tick at N=40, measured by tools/phase_probe.py); unrolling
    # keeps bit-identical semantics and lets XLA fuse the chain.
    _, yref = jax.lax.scan(step, init, (traj_xy_theta, idx), unroll=True)
    return yref


_LIN_SOLVER_CACHE: dict = {}


def _make_lin_solver(model, dt, iters, reg, spars):
    """Cached custom-vmap [linearize -> box-QP solve] for one (model, config).

    Unbatched (and every non-TPU / f64 / stage-parallel-fallback case):
    ``linearize_trajectory`` + dense ``BoxQP`` + ``solve_box_qp`` — exactly
    the pre-refactor path.  Under a full scenario-batch vmap on the TPU the
    rule instead linearizes straight into the packed tile layout
    (``ops.tiled_linearize``) and feeds the fused tiled IPM, so the dense
    [B, N, nx, nx] Jacobians never exist.  This removes the XLA fusion-size
    cliff that made linearization cost ~10x more at N=80 than at N=40
    (VERDICT r3 item 5; measured numbers in ops/tiled_linearize.py).
    """
    # ModelSpec.f is compare=False (excluded from __eq__/__hash__), so two
    # specs with identical metadata but different dynamics functions would
    # otherwise silently share one cached solver closed over the first f
    # (ADVICE r4) — key on the function identity too.
    key = (model, id(model.f), dt, iters, reg, spars)
    cached = _LIN_SOLVER_CACHE.get(key)
    if cached is not None:
        return cached

    idxbx, idxbu = model.idxbx, model.idxbu

    def unbatched(xs_lin, us, p, Qd, qx, Rd, qu,
                  lbx_d, ubx_d, lbu_d, ubu_d, dx0):
        x_next, A, B = linearize_trajectory(model.f, dt, xs_lin, us, p)
        c = x_next - xs_lin[1:]
        qp = BoxQP(A=A, B=B, c=c, Qd=Qd, qx=qx, Rd=Rd, qu=qu, dx0=dx0,
                   lbx=lbx_d, ubx=ubx_d, lbu=lbu_d, ubu=ubu_d)
        return solve_box_qp(qp, idxbx, idxbu, iters=iters, reg=reg,
                            spars=spars)

    @jax.custom_batching.custom_vmap
    def solve(xs_lin, us, p, Qd, qx, Rd, qu,
              lbx_d, ubx_d, lbu_d, ubu_d, dx0):
        return unbatched(xs_lin, us, p, Qd, qx, Rd, qu,
                         lbx_d, ubx_d, lbu_d, ubu_d, dx0)

    @solve.def_vmap
    def _rule(axis_size, in_batched, *args):
        from nmpc_nav_control_tpu.ops.pallas_riccati import BT
        from nmpc_nav_control_tpu.qp.ipm import IPMSolution, _tiled_ipm_ok

        out_batched = IPMSolution(*([True] * len(IPMSolution._fields)))
        padded = -(-axis_size // BT) * BT
        if not _tiled_ipm_ok(model.nx, model.nu, padded, args[0].dtype):
            axes = tuple(0 if b else None for b in in_batched)
            return jax.vmap(unbatched, in_axes=axes)(*args), out_batched

        from nmpc_nav_control_tpu.ops.pallas_ipm import dense_sparsity
        from nmpc_nav_control_tpu.ops.pallas_riccati import to_tiles
        from nmpc_nav_control_tpu.ops.tiled_linearize import (
            linearize_packed_tiled,
        )
        from nmpc_nav_control_tpu.qp.ipm_tiled import solve_box_qp_tiled

        full = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)]
        if padded != axis_size:
            # Edge-replicate up to a whole batch tile (same policy as the
            # solve-level dispatch rule in qp/ipm.py).
            full = [jnp.pad(a, [(0, padded - axis_size)]
                            + [(0, 0)] * (a.ndim - 1), mode="edge")
                    for a in full]
        (xs_lin, us, p, Qd, qx, Rd, qu,
         lbx_d, ubx_d, lbu_d, ubu_d, dx0) = full
        patterns = spars if spars is not None else dense_sparsity(
            model.nx, model.nu)
        At, Bmt, xnt = linearize_packed_tiled(
            model.f, dt, xs_lin, us, p, *patterns)
        ct = xnt - to_tiles(xs_lin[:, 1:], (model.nx,))
        qp = BoxQP(A=None, B=None, c=None, Qd=Qd, qx=qx, Rd=Rd, qu=qu,
                   dx0=dx0, lbx=lbx_d, ubx=ubx_d, lbu=lbu_d, ubu=ubu_d)
        sol = solve_box_qp_tiled(qp, idxbx, idxbu, iters=iters, reg=reg,
                                 spars=patterns, tiled_abc=(At, Bmt, ct))
        if padded != axis_size:
            sol = jax.tree_util.tree_map(lambda x: x[:axis_size], sol)
        return sol, out_batched

    _LIN_SOLVER_CACHE[key] = solve
    return solve


def rti_step(
    config: RTIConfig,
    data: OCPData,
    state: RTIState,
    x0,
    traj_xy_theta,
    n_valid,
):
    """One warm-started RTI solve.

    Args:
      config: static solver configuration.
      data:   OCP numeric data (params, bounds, weights).
      state:  warm-start state (``x0_carry`` unused here — the caller composes
              the measured ``x0``).
      x0:     [nx] initial state to pin (measured pose/vel + carried refs,
              composed by the control layer).
      traj_xy_theta: [N+1, 3] reference poses (pose-goal mode: 1 valid row).
      n_valid: number of valid reference rows.

    Returns (new_state, u0, stats).
    """
    dims = config.dims
    model = dims.model
    N, dt = dims.N, dims.dt
    nx, nu = model.nx, model.nu
    idxbx = jnp.asarray(model.idxbx)

    # --- Reference build: unwrap chain seeded at the measured heading. ---
    yref = build_yref(N, x0[2], traj_xy_theta, n_valid)

    # --- Adaptive terminal weight (diff-only hack). ---
    q = data.q_diag
    qe = data.qe_diag
    if config.adaptive_terminal_weight:
        same = jnp.all(yref[N] == yref[N - 1])
        scale = jnp.where(same, config.adaptive_terminal_scale, 1.0)
        qe = qe.at[:3].set(scale * q[:3])

    # --- Linearization point: stage 0 is the *pinned* x0 (acados
    # re-linearizes around the updated stage-0 iterate, which equals x0 by
    # the equality constraint). ---
    xs_lin = state.xs.at[0].set(x0)

    # --- Gauss-Newton cost blocks (diagonal W; yref nonzero only in pose). ---
    Qd = jnp.concatenate([jnp.tile(q[None], (N, 1)), qe[None]], axis=0)
    Rd = jnp.tile(data.r_diag[None], (N, 1))
    x_res = xs_lin.at[:, :3].add(-yref)          # x - yref (pose entries)
    qx = Qd * x_res
    qu = Rd * state.us                            # u ref is zero

    # --- Box bounds in delta form. ---
    lbx_d = data.lbx[None, :] - xs_lin[1:, idxbx]
    ubx_d = data.ubx[None, :] - xs_lin[1:, idxbx]
    idxbu = jnp.asarray(model.idxbu)
    lbu_d = data.lbu[None, :] - state.us[:, idxbu]
    ubu_d = data.ubu[None, :] - state.us[:, idxbu]

    # --- Linearize + QP solve (one custom_vmap boundary: under a full
    # scenario-batch vmap on TPU the rule linearizes straight into the tile
    # layout and never materializes dense Jacobians). ---
    solver = _make_lin_solver(model, float(dt), config.ipm_iters,
                              config.ipm_reg, config.spars)
    sol = solver(xs_lin, state.us, data.p, Qd, qx, Rd, qu,
                 lbx_d, ubx_d, lbu_d, ubu_d, x0 - xs_lin[0])

    # --- Expand. ---
    xs_new = xs_lin + sol.dxs
    us_new = state.us + sol.dus
    u0 = us_new[0]

    # --- Reference integration + stage-1 carry (``:155-173``). ---
    new_refs = x0[idxbx] + u0 * dt
    x0_carry = xs_new[1].at[idxbx].set(new_refs)

    ok = jnp.isfinite(sol.kkt_res) & jnp.all(jnp.isfinite(u0))
    new_state = RTIState(xs=xs_new, us=us_new, x0_carry=x0_carry)
    stats = RTIStats(kkt_res=sol.kkt_res, mu=sol.mu, ok=ok)
    return new_state, u0, stats
