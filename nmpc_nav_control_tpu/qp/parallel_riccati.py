"""Stage-parallel LQR via associative scan — O(log N) depth Riccati.

The reference's solver stack is strictly sequential over the horizon: acados
condensing + HPIPM Riccati recursions are O(N) serial C loops inside one core
(SURVEY.md §5 "long-context").  Horizon stages are this domain's sequence
axis, so the TPU-native build treats them as a first-class parallel axis:
the backward Riccati sweep is reformulated as an associative suffix
reduction over "conditional value function" elements and evaluated with
``jax.lax.associative_scan`` (log-depth tree, XLA collectives when the stage
axis is sharded over a mesh).

Formulation (parallel LQT elements, cf. Sarkka & Garcia-Fernandez,
"Temporal Parallelization of Dynamic Programming and Linear Quadratic
Control"): each stage k contributes the element
    a = (A, b, C, eta, J)
      A   = A_k                        (dynamics)
      b   = c_k - B_k R^{-1} qu_k      (affine term; u-linear cost folded in)
      C   = B_k R^{-1} B_k'
      eta = -qx_k
      J   = diag(Qd_k)
with terminal element (0, 0, 0, -qx_N, diag(Qd_N)), and the composition
    (a1 * a2): A = A2 S A1,  b = A2 S (b1 + C1 eta2') + b2, ...
    where S = (I + C1 J2)^{-1}
is associative.  The suffix reduction at position k yields J = P_k and
eta = -p_k — the usual quadratic value function.  Gains and the forward
rollout are then stage-parallel too (the rollout composes affine maps with a
second associative scan).

Numerics match the serial ``qp/riccati.py`` to machine precision (see
tests/test_parallel_riccati.py); the IPM can run on either backend.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from nmpc_nav_control_tpu.qp.linalg_small import cho_solve_small, cholesky_small
from nmpc_nav_control_tpu.qp.riccati import _highest_precision

__all__ = ["plqr_solve"]


def _combine(e1, e2):
    """Associative composition: e1 spans [i, k), e2 spans [k, j) -> [i, j).

    Shapes: leading axes broadcast (the scan maps over stages).
    """
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    nx = A1.shape[-1]
    I = jnp.eye(nx, dtype=A1.dtype)
    # S = (I + C1 J2)^{-1}; T = (I + J2 C1)^{-1} = S' with these symmetric C, J.
    M = I + C1 @ J2
    S_A1 = jnp.linalg.solve(M, A1)
    b1c = b1[..., None]
    eta2c = eta2[..., None]
    S_b = jnp.linalg.solve(M, b1c + C1 @ eta2c)
    A = A2 @ S_A1
    b = (A2 @ S_b)[..., 0] + b2
    C = A2 @ jnp.linalg.solve(M, C1) @ _T(A2) + C2
    Mt = I + J2 @ C1
    T_eta = jnp.linalg.solve(Mt, eta2c - J2 @ b1c)
    eta = (_T(A1) @ T_eta)[..., 0] + eta1
    J = _T(A1) @ jnp.linalg.solve(Mt, J2) @ A1 + J1
    J = 0.5 * (J + _T(J))
    return A, b, C, eta, J


def _T(x):
    return jnp.swapaxes(x, -1, -2)


@_highest_precision
def plqr_solve(A, B, Qd, Rd, qx, qu, c, dx0):
    """Solve the same affine LQR as ``qp.riccati.lqr_solve`` with log-depth
    associative scans.

    Args/returns identical to ``lqr_solve`` (without the factor cache):
      A [N,nx,nx], B [N,nx,nu], Qd [N+1,nx], Rd [N,nu], qx [N+1,nx],
      qu [N,nu], c [N,nx], dx0 [nx] -> (dxs [N+1,nx], dus [N,nu]).
    """
    N, nx, nu = B.shape
    dtype = A.dtype

    Rinv_qu = qu / Rd                                 # [N, nu]
    Binv = B / Rd[:, None, :]                         # B R^{-1} [N, nx, nu]
    C = jnp.einsum("kiu,kju->kij", Binv, B)           # B R^{-1} B'
    b = c - jnp.einsum("kiu,ku->ki", B, Rinv_qu)
    eta = -qx[:-1]
    J = jax.vmap(jnp.diag)(Qd[:-1])

    # Append the terminal element.
    zeroA = jnp.zeros((1, nx, nx), dtype)
    elems = (
        jnp.concatenate([A, zeroA], 0),
        jnp.concatenate([b, jnp.zeros((1, nx), dtype)], 0),
        jnp.concatenate([C, zeroA], 0),
        jnp.concatenate([eta, -qx[-1:]], 0),
        jnp.concatenate([J, jnp.diag(Qd[-1])[None]], 0),
    )

    # Suffix reduction: res[k] = elem_k * elem_{k+1} * ... * elem_N.
    # NOTE: with reverse=True, lax.associative_scan invokes the operator with
    # the LATER element as its first argument — flip into our (earlier, later)
    # convention.
    _, _, _, etas, Js = jax.lax.associative_scan(
        lambda a, bb: _combine(bb, a), elems, reverse=True
    )
    Ps = Js                      # [N+1, nx, nx], Ps[k] = P_k
    ps = -etas                   # [N+1, nx]

    # Stage-parallel gains using P_{k+1}, p_{k+1}.
    P1 = Ps[1:]
    p1 = ps[1:]
    PB = jnp.einsum("kij,kju->kiu", P1, B)
    Quu = jnp.einsum("kiu,kiv->kuv", B, PB)
    Quu = Quu + jax.vmap(jnp.diag)(Rd)
    L = cholesky_small(Quu)
    tmp = p1 + jnp.einsum("kij,kj->ki", P1, c)        # p_{k+1} + P_{k+1} c_k
    qu_bar = qu + jnp.einsum("kiu,ki->ku", B, tmp)
    kff = -cho_solve_small(L, qu_bar)
    Qux = jnp.einsum("kiu,kij->kuj", PB, A)           # B'P_{k+1}A
    K = -cho_solve_small(L, Qux)

    # Forward rollout as an affine-map prefix scan:
    # dx_{k+1} = M_k dx_k + v_k, M = A + B K, v = B kff + c.
    M = A + jnp.einsum("kiu,kuj->kij", B, K)
    v = jnp.einsum("kiu,ku->ki", B, kff) + c

    def fwd_combine(f1, f2):
        # f1 earlier: x -> M1 x + v1 ; f2 later. Compose: M2 M1 x + M2 v1 + v2.
        M1, v1 = f1
        M2, v2 = f2
        return M2 @ M1, (M2 @ v1[..., None])[..., 0] + v2

    Mc, vc = jax.lax.associative_scan(fwd_combine, (M, v))
    # dx_{k+1} = Mc[k] dx0 + vc[k].
    dxs_tail = jnp.einsum("kij,j->ki", Mc, dx0) + vc
    dxs = jnp.concatenate([dx0[None], dxs_tail], 0)
    dus = jnp.einsum("kuj,kj->ku", K, dxs[:-1]) + kff
    return dxs, dus
