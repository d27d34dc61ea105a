"""Riccati factorization/solve for the stagewise LQR subproblem.

This is the structure-exploiting linear-algebra core that replaces the
acados partial-condensing + HPIPM Riccati recursion (selected at
``scripts/diff/generate_c_code.py:69``, ``qp_solver='PARTIAL_CONDENSING_HPIPM'``).
The interior-point loop (``qp/ipm.py``) calls it with barrier-modified
*diagonal* stage costs — box constraints only ever touch diagonals, so the
stage Hessians stay ``diag(q) / diag(r)`` and the only dense objects are the
cost-to-go matrices P_k [nx, nx] and the tiny Quu [nu, nu] blocks.

Design for TPU:
  - matrix recursion (P, K, chol(Quu)) is separated from the vector recursion
    (p, kff) so one factorization serves the two solves of a Mehrotra
    predictor-corrector iteration;
  - all stage algebra is einsum on [nx, nx] / [nx, nu] blocks with unrolled
    tiny Cholesky (``linalg_small``) — under ``vmap`` the scenario batch is
    the vectorized axis and fills the VPU lanes;
  - the stage loop is ``lax.scan`` (sequential, O(N) depth); a parallel
    associative-scan formulation lives in ``qp/parallel_riccati.py`` for the
    stage-sharded multi-chip path.

Problem solved (delta form; dx0 given):
  min  sum_{k=0}^{N-1} 1/2 dx'diag(Qd_k)dx + qx_k'dx + 1/2 du'diag(Rd_k)du + qu_k'du
       + 1/2 dx_N'diag(Qd_N)dx_N + qx_N'dx_N
  s.t. dx_{k+1} = A_k dx_k + B_k du_k + c_k,   dx_0 = dx0.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nmpc_nav_control_tpu.qp.linalg_small import cho_solve_small, cholesky_small

__all__ = ["RiccatiFactors", "riccati_factor", "riccati_solve", "lqr_solve"]


class RiccatiFactors(NamedTuple):
    """Cached backward-sweep factorization.

    Ps: [N+1, nx, nx] cost-to-go Hessians (Ps[k] = P_k).
    Ks: [N, nu, nx]   feedback gains.
    Ls: [N, nu, nu]   lower Cholesky factors of Quu_k.
    """

    Ps: jnp.ndarray
    Ks: jnp.ndarray
    Ls: jnp.ndarray


def _highest_precision(fn):
    """TPU matmuls default to bf16-mantissa MXU passes; the Riccati recursion
    (and the IPM's tiny-slack arithmetic downstream) needs true f32."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return wrapped


@_highest_precision
def riccati_factor(A, B, Qd, Rd, reg: float = 0.0) -> RiccatiFactors:
    """Backward matrix recursion.

    Args:
      A:  [N, nx, nx] stage Jacobians.
      B:  [N, nx, nu].
      Qd: [N+1, nx] diagonal state Hessians (stage N = terminal).
      Rd: [N, nu] diagonal input Hessians.
      reg: optional Tikhonov regularization added to Quu.

    Returns RiccatiFactors.
    """
    N, nx, nu = B.shape
    P_N = jnp.zeros((nx, nx), Qd.dtype).at[jnp.arange(nx), jnp.arange(nx)].set(Qd[-1])

    def bwd(P, inp):
        A_k, B_k, Qd_k, Rd_k = inp
        PA = P @ A_k                     # [nx, nx]
        PB = P @ B_k                     # [nx, nu]
        Quu = B_k.T @ PB                 # [nu, nu]
        Quu = Quu.at[jnp.arange(nu), jnp.arange(nu)].add(Rd_k + reg)
        Qux = B_k.T @ PA                 # [nu, nx]
        L = cholesky_small(Quu)
        K = -cho_solve_small(L, Qux)     # [nu, nx]
        P_k = A_k.T @ PA + Qux.T @ K
        P_k = P_k.at[jnp.arange(nx), jnp.arange(nx)].add(Qd_k)
        P_k = 0.5 * (P_k + P_k.T)
        return P_k, (P, K, L)

    # Reverse scan: carry enters as P_{k+1}, leaves as P_k; per-stage output
    # records the incoming carry, so Ps_next[k] == P_{k+1} and the final carry
    # is P_0.
    P0, (Ps_next, Ks, Ls) = jax.lax.scan(
        bwd, P_N, (A, B, Qd[:-1], Rd), reverse=True
    )
    Ps = jnp.concatenate([P0[None], Ps_next], axis=0)
    return RiccatiFactors(Ps=Ps, Ks=Ks, Ls=Ls)


@_highest_precision
def riccati_solve(factors: RiccatiFactors, A, B, qx, qu, c, dx0):
    """Vector backward recursion + forward rollout using cached factors.

    Args:
      factors: output of ``riccati_factor`` (same A, B, Hessians).
      qx: [N+1, nx] stage gradients (stage N = terminal).
      qu: [N, nu].
      c:  [N, nx] dynamics residuals (affine terms).
      dx0: [nx] fixed initial delta state.

    Returns:
      dxs: [N+1, nx], dus: [N, nu].
    """
    Ps, Ks, Ls = factors

    def bwd(p, inp):
        A_k, B_k, K_k, L_k, P_next, qx_k, qu_k, c_k = inp
        tmp = p + P_next @ c_k           # [nx]
        qu_bar = qu_k + B_k.T @ tmp      # [nu]
        kff = -cho_solve_small(L_k, qu_bar)
        p_k = qx_k + A_k.T @ tmp + K_k.T @ qu_bar
        return p_k, kff

    _, kffs = jax.lax.scan(
        bwd,
        qx[-1],
        (A, B, Ks, Ls, Ps[1:], qx[:-1], qu, c),
        reverse=True,
    )

    def fwd(dx, inp):
        A_k, B_k, K_k, kff_k, c_k = inp
        du = K_k @ dx + kff_k
        dx_next = A_k @ dx + B_k @ du + c_k
        return dx_next, (dx, du)

    _, (dxs_head, dus) = jax.lax.scan(fwd, dx0, (A, B, Ks, kffs, c))
    dx_N = A[-1] @ dxs_head[-1] + B[-1] @ dus[-1] + c[-1]
    dxs = jnp.concatenate([dxs_head, dx_N[None]], axis=0)
    return dxs, dus


def lqr_solve(A, B, Qd, Rd, qx, qu, c, dx0, reg: float = 0.0):
    """Factor + solve in one call (single-solve convenience)."""
    factors = riccati_factor(A, B, Qd, Rd, reg=reg)
    return riccati_solve(factors, A, B, qx, qu, c, dx0)


# --------------------------------------------------------------------------- #
# vmap-dispatched entry points: under a scenario-batch vmap on TPU these swap
# in the fused Pallas sweeps (ops/pallas_riccati.py); everywhere else they
# fall back to vmapping the serial implementations above.
# --------------------------------------------------------------------------- #


def _pallas_ok(nx: int, nu: int, batch: int, dtype) -> bool:
    import os

    # Default-on (validated end-to-end: zero-NaN closed loop with exact
    # constraint satisfaction, 3.9x IPM throughput); set
    # NMPC_TPU_PALLAS_RICCATI=0 to force the XLA path.
    if os.environ.get("NMPC_TPU_PALLAS_RICCATI", "1") != "1":
        return False
    try:
        from nmpc_nav_control_tpu.ops import pallas_riccati
    except ImportError:  # pragma: no cover
        return False
    if not pallas_riccati.supported(nx, nu, batch, dtype):
        return False
    if pallas_riccati.interpret_mode():
        return True  # CPU testing of the kernel paths via the interpreter
    plat = jax.devices()[0].platform.lower()
    return "tpu" in plat or "axon" in plat


@jax.custom_batching.custom_vmap
def riccati_factor_v(A, B, Qd, Rd):
    return riccati_factor(A, B, Qd, Rd)


@riccati_factor_v.def_vmap
def _factor_vmap_rule(axis_size, in_batched, A, B, Qd, Rd):
    out_batched = RiccatiFactors(Ps=True, Ks=True, Ls=True)
    if all(jax.tree_util.tree_leaves(in_batched)) and _pallas_ok(
        A.shape[-1], B.shape[-1], axis_size, A.dtype
    ):
        from nmpc_nav_control_tpu.ops.pallas_riccati import riccati_factor_batched

        Ps, Ks, Ls = riccati_factor_batched(A, B, Qd, Rd)
        return RiccatiFactors(Ps=Ps, Ks=Ks, Ls=Ls), out_batched
    axes = jax.tree_util.tree_map(lambda b: 0 if b else None, in_batched)
    out = jax.vmap(riccati_factor, in_axes=tuple(axes))(A, B, Qd, Rd)
    return out, out_batched


@jax.custom_batching.custom_vmap
def riccati_solve_v(factors, A, B, qx, qu, c, dx0):
    return riccati_solve(factors, A, B, qx, qu, c, dx0)


@riccati_solve_v.def_vmap
def _solve_vmap_rule(axis_size, in_batched, factors, A, B, qx, qu, c, dx0):
    out_batched = (True, True)
    if all(jax.tree_util.tree_leaves(in_batched)) and _pallas_ok(
        A.shape[-1], B.shape[-1], axis_size, A.dtype
    ):
        from nmpc_nav_control_tpu.ops.pallas_riccati import riccati_solve_batched

        dxs, dus = riccati_solve_batched(
            factors.Ps, factors.Ks, factors.Ls, A, B, qx, qu, c, dx0
        )
        return (dxs, dus), out_batched
    axes = jax.tree_util.tree_map(lambda b: 0 if b else None, in_batched)
    out = jax.vmap(riccati_solve, in_axes=axes)(factors, A, B, qx, qu, c, dx0)
    return out, out_batched
