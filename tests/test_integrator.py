"""RK4 integrator + sensitivity tests."""
import jax
import jax.numpy as jnp
import numpy as np

from nmpc_nav_control_tpu.models import diff
from nmpc_nav_control_tpu.ocp.integrator import (
    linearize_trajectory,
    make_discrete_dynamics,
    rk4_step,
    rollout,
)


def test_rk4_linear_system_exactness_order():
    # xdot = a x has exact solution e^{a dt}; RK4 error ~ (a dt)^5 / 120.
    a = -2.0

    def f(x, u, p):
        return a * x

    dt = 0.025
    x0 = jnp.array([1.0])
    x1 = rk4_step(f, x0, jnp.zeros(1), jnp.zeros(1), dt)
    exact = np.exp(a * dt)
    import math

    taylor4 = sum((a * dt) ** k / math.factorial(k) for k in range(5))
    np.testing.assert_allclose(float(x1[0]), taylor4, rtol=1e-12)
    assert abs(float(x1[0]) - exact) < 1e-8


def test_rk4_convergence_order_on_diff_model():
    p = diff.make_params(0.27, 0.1)
    x0 = jnp.array([0.0, 0.0, 0.3, 0.5, 0.7, 0.6, 0.8])
    u = jnp.array([0.3, -0.2])

    def integrate(dt, steps):
        x = x0
        for _ in range(steps):
            x = rk4_step(diff.f, x, u, p, dt)
        return x

    ref = integrate(0.4 / 256, 256)  # fine solution
    e1 = float(jnp.max(jnp.abs(integrate(0.4, 1) - ref)))
    e2 = float(jnp.max(jnp.abs(integrate(0.2, 2) - ref)))
    # Halving dt should reduce error ~16x for 4th order.
    assert e2 < e1 / 12.0


def test_linearize_trajectory_matches_fd():
    p = diff.make_params(0.27, 0.1)
    dt = 0.025
    N = 4
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(N + 1, 7)))
    us = jnp.asarray(rng.normal(size=(N, 2)))
    x_next, A, B = linearize_trajectory(diff.f, dt, xs, us, p)

    F = make_discrete_dynamics(diff.f, dt)
    eps = 1e-5
    k = 2
    for i in range(7):
        dx = jnp.zeros(7).at[i].set(eps)
        fd = (F(xs[k] + dx, us[k], p) - F(xs[k] - dx, us[k], p)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(A[k][:, i]), np.asarray(fd), atol=1e-5)
    for i in range(2):
        du = jnp.zeros(2).at[i].set(eps)
        fd = (F(xs[k], us[k] + du, p) - F(xs[k], us[k] - du, p)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(B[k][:, i]), np.asarray(fd), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(x_next[k]), np.asarray(F(xs[k], us[k], p)), rtol=1e-12
    )


def test_rollout_consistency():
    p = diff.make_params(0.27, 0.1)
    dt = 0.025
    x0 = jnp.array([0.0, 0.0, 0.0, 0.1, 0.1, 0.2, 0.2])
    us = jnp.tile(jnp.array([0.5, -0.5]), (10, 1))
    xs = rollout(diff.f, dt, x0, us, p)
    assert xs.shape == (11, 7)
    F = make_discrete_dynamics(diff.f, dt)
    for k in range(10):
        np.testing.assert_allclose(
            np.asarray(xs[k + 1]), np.asarray(F(xs[k], us[k], p)), rtol=1e-10
        )


def test_vmap_batching():
    p = diff.make_params(0.27, 0.1)
    dt = 0.025
    B = 8
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.normal(size=(B, 5, 7)))
    us = jnp.asarray(rng.normal(size=(B, 4, 2)))
    batched = jax.vmap(lambda x, u: linearize_trajectory(diff.f, dt, x, u, p))
    xn, A, Bm = batched(xs, us)
    assert xn.shape == (B, 4, 7) and A.shape == (B, 4, 7, 7) and Bm.shape == (B, 4, 7, 2)
    # Spot check one element against the unbatched path.
    xn0, A0, B0 = linearize_trajectory(diff.f, dt, xs[3], us[3], p)
    np.testing.assert_allclose(np.asarray(A[3]), np.asarray(A0), rtol=1e-12)
