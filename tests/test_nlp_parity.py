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

This file implements (2) for all three steering geometries (the north-star
"u-trajectory parity ... on all three geometries" check, BASELINE.json).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from nmpc_nav_control_tpu.models import diff, omni4, tric
from nmpc_nav_control_tpu.ocp.integrator import make_discrete_dynamics
from nmpc_nav_control_tpu.ocp.spec import OCPData, OCPDims
from nmpc_nav_control_tpu.rti.step import RTIConfig, rti_init, rti_step

DT = 0.025
N = 20
V_MAX, A_MAX = 1.0, 2.0
Q = np.array([10.0, 10.0, 5.0, 0, 0, 0, 0])
R = np.array([1.0, 1.0])


def _make_problem(spec, p, Q, R, lbx, ubx, lbu, ubu, N=N, ipm_iters=20):
    dims = OCPDims(model=spec, N=N, dt=DT)
    config = RTIConfig(dims=dims, ipm_iters=ipm_iters,
                       adaptive_terminal_weight=False)
    data = OCPData(
        p=jnp.asarray(p, jnp.float64),
        lbx=jnp.asarray(lbx, jnp.float64),
        ubx=jnp.asarray(ubx, jnp.float64),
        lbu=jnp.asarray(lbu, jnp.float64),
        ubu=jnp.asarray(ubu, jnp.float64),
        q_diag=jnp.asarray(Q, jnp.float64),
        r_diag=jnp.asarray(R, jnp.float64),
        qe_diag=jnp.asarray(Q, jnp.float64),
    )
    return config, data


def _solve_nlp_oracle(model_f, nx, nu, p, Q, R, x0, goal,
                      idxbx, lbx_b, ubx_b, lbu_b, ubu_b, N=N, w0=None):
    """Direct transcription solved by trust-constr with exact JAX derivatives."""
    F = make_discrete_dynamics(model_f, DT)
    p = jnp.asarray(p, jnp.float64)
    nw = (N + 1) * nx + N * nu
    yref = np.zeros(nx)
    yref[:3] = goal

    def split(w):
        xs = w[: (N + 1) * nx].reshape(N + 1, nx)
        us = w[(N + 1) * nx:].reshape(N, nu)
        return xs, us

    def obj(w):
        xs, us = split(w)
        return 0.5 * jnp.sum(jnp.asarray(Q) * (xs - yref) ** 2) + 0.5 * jnp.sum(
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
        for b, i in enumerate(idxbx):
            lb[k * nx + i], ub[k * nx + i] = lbx_b[b], ubx_b[b]
    off = (N + 1) * nx
    lb[off:] = np.tile(np.asarray(lbu_b, float), N)
    ub[off:] = np.tile(np.asarray(ubu_b, float), N)

    if w0 is None:
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
        options={"maxiter": 3000, "gtol": 1e-10, "xtol": 1e-12},
    )
    assert res.status in (1, 2), res.message
    return split(res.x)


def _rti_fixpoint(config, data, x0, goal, iters=40):
    traj = jnp.zeros((config.dims.N + 1, 3), jnp.float64).at[0].set(
        jnp.asarray(goal, jnp.float64)
    )
    state = rti_init(config.dims, jnp.float64)
    step = jax.jit(lambda s: rti_step(config, data, s, x0, traj, 1))
    for _ in range(iters):
        state, u0, stats = step(state)
    return state, stats


@pytest.mark.parametrize("N_h", [
    20, pytest.param(80, marks=pytest.mark.slow)])
def test_rti_fixpoint_matches_nlp_oracle(N_h):
    """Parametrized over N=20 (fast tier) and the reference default N=80
    (``scripts/diff/common.py:5-9``)."""
    config, data = _make_problem(
        diff.SPEC, [0.27, 0.1], Q, R,
        [-V_MAX, -V_MAX], [V_MAX, V_MAX], [-A_MAX, -A_MAX], [A_MAX, A_MAX],
        N=N_h,
    )
    x0 = jnp.zeros(7, jnp.float64)
    goal = np.array([0.6, 0.1, 0.2])
    state, stats = _rti_fixpoint(config, data, x0, goal)
    assert float(stats.kkt_res) < 1e-7

    xs_o, us_o = _solve_nlp_oracle(
        diff.f, 7, 2, [0.27, 0.1], Q, R, x0, goal,
        diff.SPEC.idxbx, [-V_MAX, -V_MAX], [V_MAX, V_MAX],
        [-A_MAX, -A_MAX], [A_MAX, A_MAX], N=N_h,
    )
    np.testing.assert_allclose(np.asarray(state.us), us_o, atol=2e-4)
    np.testing.assert_allclose(np.asarray(state.xs), xs_o, atol=2e-4)


def test_rti_fixpoint_with_active_constraints():
    """Tight bounds -> velocity/acceleration boxes bind at the optimum."""
    v_max, a_max = 0.05, 0.5
    config, data = _make_problem(
        diff.SPEC, [0.27, 0.1], Q, R,
        [-v_max, -v_max], [v_max, v_max], [-a_max, -a_max], [a_max, a_max],
    )
    x0 = jnp.zeros(7, jnp.float64)
    goal = np.array([1.0, 0.0, 0.0])
    state, _ = _rti_fixpoint(config, data, x0, goal, iters=60)

    us_rti = np.asarray(state.us)
    xs_rti = np.asarray(state.xs)
    # Bounds must bind (sanity that this is a constrained instance)...
    assert np.abs(xs_rti[1:, 5:]).max() > 0.99 * v_max
    # ...and never be violated.
    assert np.abs(xs_rti[1:, 5:]).max() <= v_max + 1e-6
    assert np.abs(us_rti).max() <= a_max + 1e-6

    xs_o, us_o = _solve_nlp_oracle(
        diff.f, 7, 2, [0.27, 0.1], Q, R, x0, goal,
        diff.SPEC.idxbx, [-v_max, -v_max], [v_max, v_max],
        [-a_max, -a_max], [a_max, a_max],
    )
    np.testing.assert_allclose(us_rti, us_o, atol=5e-4)


@pytest.mark.parametrize("N_h", [
    20, pytest.param(80, marks=pytest.mark.slow)])
def test_rti_fixpoint_matches_nlp_oracle_omni4(N_h):
    Qo = np.array([10.0, 10.0, 5.0] + [0.0] * 8)
    Ro = np.ones(4)
    p = [0.535, 0.1]
    v_max, a_max = 1.0, 1.0
    lbx, ubx = [-v_max] * 4, [v_max] * 4
    lbu, ubu = [-a_max] * 4, [a_max] * 4
    config, data = _make_problem(omni4.SPEC, p, Qo, Ro, lbx, ubx, lbu, ubu,
                                 N=N_h)
    x0 = jnp.zeros(11, jnp.float64)
    goal = np.array([0.4, 0.2, 0.3])
    state, stats = _rti_fixpoint(config, data, x0, goal)
    assert float(stats.kkt_res) < 1e-7

    xs_o, us_o = _solve_nlp_oracle(
        omni4.f, 11, 4, p, Qo, Ro, x0, goal,
        omni4.SPEC.idxbx, lbx, ubx, lbu, ubu, N=N_h,
    )
    np.testing.assert_allclose(np.asarray(state.us), us_o, atol=3e-4)
    np.testing.assert_allclose(np.asarray(state.xs), xs_o, atol=3e-4)


@pytest.mark.parametrize("bug_compat", [False, True])
@pytest.mark.parametrize("N_h", [
    20, pytest.param(80, marks=pytest.mark.slow)])
def test_rti_fixpoint_matches_nlp_oracle_tric(N_h, bug_compat):
    """Tricycle parity, including the asymmetric steering-angle box and the
    reference's sin/cos model bug in ``bug_compat`` mode
    (``scripts/tric/tric_amr_model.py:45``)."""
    spec = tric.SPEC_BUG_COMPAT if bug_compat else tric.SPEC
    p = [1.05, 0.1, 0.1]
    v_max = 1.0
    alpha_min, alpha_max = -np.deg2rad(60.0), np.deg2rad(75.0)  # asymmetric
    a_max, dalpha_max = 2.0, np.deg2rad(90.0)
    lbx, ubx = [-v_max, alpha_min], [v_max, alpha_max]
    lbu, ubu = [-a_max, -dalpha_max], [a_max, dalpha_max]
    config, data = _make_problem(spec, p, Q, R, lbx, ubx, lbu, ubu, N=N_h)
    # Nonzero initial (v, alpha): in bug-compat mode the origin is an
    # uncontrollable stationary point of the sin(alpha) dynamics — both
    # solvers would sit at different KKT points of a degenerate instance.
    x0 = jnp.asarray([0.0, 0.0, 0.0, 0.3, 0.2, 0.3, 0.2], jnp.float64)
    goal = np.array([0.5, -0.15, -0.2])
    state, stats = _rti_fixpoint(config, data, x0, goal)
    assert float(stats.kkt_res) < 1e-7

    # The tricycle OCP is nonconvex (multiple KKT points); the parity claim
    # is that the RTI fixed point IS a local NLP optimum: the exact-derivative
    # oracle started there must stay (up to its own tolerance).
    w0 = np.concatenate(
        [np.asarray(state.xs).reshape(-1), np.asarray(state.us).reshape(-1)]
    )
    xs_o, us_o = _solve_nlp_oracle(
        spec.f, 7, 2, p, Q, R, x0, goal,
        spec.idxbx, lbx, ubx, lbu, ubu, w0=w0, N=N_h,
    )
    np.testing.assert_allclose(np.asarray(state.us), us_o, atol=3e-4)
    np.testing.assert_allclose(np.asarray(state.xs), xs_o, atol=3e-4)
    # The asymmetric alpha box is respected.
    assert np.asarray(state.xs)[1:, 6].min() >= alpha_min - 1e-8
    assert np.asarray(state.xs)[1:, 6].max() <= alpha_max + 1e-8
