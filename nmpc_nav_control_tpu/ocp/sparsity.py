"""Structural sparsity detection for the discrete stage Jacobians.

The RK4 stage Jacobians A = dF/dx, B = dF/du of the wheeled-robot models are
mostly structural zeros: translation invariance makes the x/y columns of A
identity columns, and the first-order lag + reference-integrator chains keep
each wheel's states decoupled from the others (e.g. omni4 nx=11 has 45 of
121 A entries structurally nonzero).  The fused IPM kernels
(``ops/pallas_ipm.py``) exploit a static pattern by packing A/B streams to
their nonzeros and skipping the corresponding FMA terms.

Detection is numeric-at-build-time: evaluate the Jacobians at a few random
states/inputs with the controller's concrete parameters and OR the nonzero
masks — a structurally nonzero smooth term vanishing at every random sample
has probability zero.  The pattern must OVER-approximate: a false zero would
silently drop dynamics terms, so callers pass concrete (not traced)
parameters and the detector falls back to dense when it cannot evaluate.

The reference never needed this — acados/HPIPM treat the tiny stage blocks
as dense (BLASFEO panels, ``FindACADOS.cmake:48``); on TPU the unrolled
entry-flat kernels make static sparsity a direct FLOP/bandwidth saving.
"""
from __future__ import annotations

import numpy as np

__all__ = ["detect_jacobian_sparsity"]


def detect_jacobian_sparsity(f, dt: float, nx: int, nu: int, p,
                             samples: int = 4, seed: int = 0):
    """Return static (A_pattern, B_pattern) as nested bool tuples.

    Args:
      f:  continuous dynamics f(x, u, p) -> xdot.
      dt: shooting interval.
      nx, nu: dimensions.
      p:  CONCRETE model parameters (the controller's actual values).
      samples: number of random evaluation points to OR together.

    Returns ((nx x nx), (nx x nu)) nested tuples of bools, or dense patterns
    if the parameters are traced (cannot evaluate concretely).
    """
    import jax
    import jax.numpy as jnp

    from nmpc_nav_control_tpu.ocp.integrator import make_discrete_dynamics

    p_arr = jnp.asarray(p)
    if isinstance(p_arr, jax.core.Tracer):  # pragma: no cover - build-time API
        from nmpc_nav_control_tpu.ops.pallas_ipm import dense_sparsity

        return dense_sparsity(nx, nu)

    F = make_discrete_dynamics(f, dt)
    jac = jax.jit(jax.jacfwd(F, argnums=(0, 1)))
    rng = np.random.default_rng(seed)
    accA = np.zeros((nx, nx), bool)
    accB = np.zeros((nx, nu), bool)
    for _ in range(samples):
        x = jnp.asarray(rng.normal(size=nx), p_arr.dtype)
        u = jnp.asarray(rng.normal(size=nu), p_arr.dtype)
        A, B = jac(x, u, p_arr)
        accA |= np.asarray(A) != 0.0
        accB |= np.asarray(B) != 0.0
    return (
        tuple(tuple(bool(v) for v in row) for row in accA),
        tuple(tuple(bool(v) for v in row) for row in accB),
    )
