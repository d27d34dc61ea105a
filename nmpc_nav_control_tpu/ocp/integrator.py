"""Explicit RK4 integration with forward sensitivities.

Replaces the acados ERK integrator + CasADi-generated ``expl_vde_forw``
sensitivity functions (selected at ``scripts/diff/generate_c_code.py:73``,
``integrator_type='ERK'``; acados defaults: 4 Butcher stages, 1 integration
step per shooting interval).  Discretization over one shooting interval of
length ``dt``:

  x_{k+1} = F(x_k, u_k, p)   (single RK4 step of the continuous dynamics)

Stage Jacobians A_k = dF/dx, B_k = dF/du are obtained with ``jax.jacfwd``
through the RK4 step — the JAX-native equivalent of CasADi's forward VDE.
Everything is shape-static and vmaps cleanly over both the stage axis and a
scenario batch axis.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["rk4_step", "make_discrete_dynamics", "linearize_trajectory", "rollout"]


def rk4_step(f: Callable, x, u, p, dt):
    """One classical RK4 step of xdot = f(x, u, p) over step size dt."""
    k1 = f(x, u, p)
    k2 = f(x + 0.5 * dt * k1, u, p)
    k3 = f(x + 0.5 * dt * k2, u, p)
    k4 = f(x + dt * k3, u, p)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def make_discrete_dynamics(f: Callable, dt: float) -> Callable:
    """Return the discrete one-step map F(x, u, p) (single RK4 step)."""

    def F(x, u, p):
        return rk4_step(f, x, u, p, dt)

    return F


def linearize_trajectory(f: Callable, dt: float, xs, us, p):
    """Linearize the discrete dynamics along a trajectory.

    Args:
      f:  continuous dynamics.
      dt: shooting interval length.
      xs: [N+1, nx] state trajectory (linearization points; only xs[:N] used).
      us: [N, nu] input trajectory.
      p:  [npar] model parameters.

    Returns:
      x_next: [N, nx]  F(xs[k], us[k], p)
      A:      [N, nx, nx]  dF/dx at each stage
      B:      [N, nx, nu]  dF/du at each stage
    """
    F = make_discrete_dynamics(f, dt)

    def stage(x, u):
        x_next = F(x, u, p)
        A, B = jax.jacfwd(F, argnums=(0, 1))(x, u, p)
        return x_next, A, B

    return jax.vmap(stage)(xs[:-1], us)


def rollout(f: Callable, dt: float, x0, us, p):
    """Roll the discrete dynamics forward from x0 under us ([N, nu]).

    Returns the full state trajectory [N+1, nx].
    """
    F = make_discrete_dynamics(f, dt)

    def step(x, u):
        x_next = F(x, u, p)
        return x_next, x_next

    _, xs_tail = jax.lax.scan(step, x0, us)
    return jnp.concatenate([x0[None], xs_tail], axis=0)
