"""Solver parity vs an independent nonlinear-programming oracle.

The reference's cross-check is a CasADi Opti + IPOPT direct transcription of
the same OCP (``scripts/test_scripts/casadi_sim_diff.py:35-70``).  acados is
not available in this environment, so parity is validated through the chain:

  1. one RTI iteration == linearize -> box-QP -> expand, with the QP solution
     checked against dense oracles (tests/test_qp.py);
  2. the RTI fixed point == the NLP optimum: iterating the warm-started RTI
     step at a fixed (x0, yref) must converge to the solution of the full
     nonlinear direct transcription — solved here by scipy trust-constr with
     exact JAX-computed derivatives (the IPOPT-oracle analog);
  3. closed-loop behavior tests (tests/test_closed_loop.py) cover the
    40 Hz warm-starting semantics.

This file implements (2) for the diff geometry.
"""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from nmpc_nav_control_tpu.models import diff
from nmpc_nav_control_tpu.ocp.integrator import make_discrete_dynamics
from nmpc_nav_control_tpu.ocp.spec import OCPData, OCPDims
from nmpc_nav_control_tpu.rti.step import RTIConfig, rti_init, rti_step

DT = 0.025
N = 20
V_MAX, A_MAX = 1.0, 2.0
Q = np.array([10.0, 10.0, 5.0, 0, 0, 0, 0])
R = np.array([1.0, 1.0])


def _make_problem(v_max=V_MAX, a_max=A_MAX):
    dims = OCPDims(model=diff.SPEC, N=N, dt=DT)
    config = RTIConfig(dims=dims, ipm_iters=20, adaptive_terminal_weight=False)
    data = OCPData(
        p=jnp.asarray([0.27, 0.1], jnp.float64),
        lbx=jnp.asarray([-v_max, -v_max], jnp.float64),
        ubx=jnp.asarray([v_max, v_max], jnp.float64),
        lbu=jnp.asarray([-a_max, -a_max], jnp.float64),
        ubu=jnp.asarray([a_max, a_max], jnp.float64),
        q_diag=jnp.asarray(Q, jnp.float64),
        r_diag=jnp.asarray(R, jnp.float64),
        qe_diag=jnp.asarray(Q, jnp.float64),
    )
    return config, data


def _solve_nlp_oracle(x0, goal, v_max=V_MAX, a_max=A_MAX):
    """Direct transcription solved by trust-constr with exact JAX derivatives."""
    F = make_discrete_dynamics(diff.f, DT)
    p = jnp.asarray([0.27, 0.1], jnp.float64)
    nx, nu = 7, 2
    nw = (N + 1) * nx + N * nu
    yref = np.zeros(nx)
    yref[:3] = goal

    def split(w):
        xs = w[: (N + 1) * nx].reshape(N + 1, nx)
        us = w[(N + 1) * nx:].reshape(N, nu)
        return xs, us

    def obj(w):
        xs, us = split(w)
        jq = jnp.asarray(Q)
        return 0.5 * jnp.sum(jq * (xs - yref) ** 2) + 0.5 * jnp.sum(
            jnp.asarray(R) * us ** 2
        )

    def eq(w):
        xs, us = split(w)
        res = [xs[0] - x0]
        x_next = jax.vmap(lambda x, u: F(x, u, p))(xs[:-1], us)
        res.append((x_next - xs[1:]).reshape(-1))
        return jnp.concatenate([res[0], res[1]])

    obj_j = jax.jit(obj)
    grad_j = jax.jit(jax.grad(obj))
    eq_j = jax.jit(eq)
    eq_jac = jax.jit(jax.jacfwd(eq))

    lb = np.full(nw, -np.inf)
    ub = np.full(nw, np.inf)
    for k in range(1, N + 1):
        for i in (5, 6):
            lb[k * nx + i], ub[k * nx + i] = -v_max, v_max
    off = (N + 1) * nx
    lb[off:], ub[off:] = -a_max, a_max

    w0 = np.zeros(nw)
    w0[: (N + 1) * nx] = np.tile(np.asarray(x0), N + 1)
    res = scipy.optimize.minimize(
        lambda w: float(obj_j(jnp.asarray(w))),
        w0,
        jac=lambda w: np.asarray(grad_j(jnp.asarray(w))),
        method="trust-constr",
        constraints=[scipy.optimize.NonlinearConstraint(
            lambda w: np.asarray(eq_j(jnp.asarray(w))),
            0.0, 0.0,
            jac=lambda w: np.asarray(eq_jac(jnp.asarray(w))),
        )],
        bounds=scipy.optimize.Bounds(lb, ub),
        options={"maxiter": 500, "gtol": 1e-10, "xtol": 1e-12},
    )
    assert res.status in (1, 2), res.message
    return split(res.x)


def test_rti_fixpoint_matches_nlp_oracle():
    config, data = _make_problem()
    x0 = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float64)
    goal = np.array([0.6, 0.1, 0.2])
    traj = jnp.zeros((N + 1, 3), jnp.float64).at[0].set(jnp.asarray(goal))

    state = rti_init(config.dims, jnp.float64)
    step = jax.jit(lambda s: rti_step(config, data, s, x0, traj, 1))
    for _ in range(40):  # iterate the warm-started RTI to its fixed point
        state, u0, stats = step(state)
    assert float(stats.kkt_res) < 1e-7

    xs_o, us_o = _solve_nlp_oracle(x0, goal)
    us_rti = np.asarray(state.us)
    np.testing.assert_allclose(us_rti, us_o, atol=2e-4)
    np.testing.assert_allclose(np.asarray(state.xs), xs_o, atol=2e-4)


def test_rti_fixpoint_with_active_constraints():
    """Tight bounds -> velocity/acceleration boxes bind at the optimum."""
    v_max, a_max = 0.05, 0.5
    config, data = _make_problem(v_max, a_max)
    x0 = jnp.zeros(7, jnp.float64)
    goal = np.array([1.0, 0.0, 0.0])
    traj = jnp.zeros((N + 1, 3), jnp.float64).at[0].set(jnp.asarray(goal))

    state = rti_init(config.dims, jnp.float64)
    step = jax.jit(lambda s: rti_step(config, data, s, x0, traj, 1))
    for _ in range(60):
        state, u0, stats = step(state)

    us_rti = np.asarray(state.us)
    xs_rti = np.asarray(state.xs)
    # Bounds must bind (sanity that this is a constrained instance)...
    assert np.abs(xs_rti[1:, 5:]).max() > 0.99 * v_max
    # ...and never be violated.
    assert np.abs(xs_rti[1:, 5:]).max() <= v_max + 1e-6
    assert np.abs(us_rti).max() <= a_max + 1e-6

    xs_o, us_o = _solve_nlp_oracle(x0, goal, v_max, a_max)
    np.testing.assert_allclose(us_rti, us_o, atol=5e-4)
