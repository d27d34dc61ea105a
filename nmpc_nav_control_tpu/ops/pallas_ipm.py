"""Fully-fused Pallas TPU kernels for the tiled Mehrotra box-IPM iteration.

One IPM iteration of ``qp/ipm_tiled.py`` historically ran 3 Pallas sweeps
plus ~6 large XLA elementwise/reduction passes over [G, N, e, 8, 128]
tensors (gaps/residuals, barrier diagonals, effective-multiplier gradients,
mu and mu_aff reductions, fraction-to-boundary assembly) — each pass a full
HBM round trip of the per-stage operands.  Here the whole iteration is four
sweeps, everything else stays in VMEM/registers:

  1. ``ipm_bwd_fused``  — backward: Riccati factorization + dynamics
     residual + bound gaps/primal residuals + barrier-modified diagonals +
     the AFFINE vector recursion + the complementarity (mu) reduction, in
     one pass.  The cost-to-go carry excludes the diagonal cost term; the
     diagonal (incl. barrier) is added at consumption, which is what lets
     the factorization and the residual/barrier algebra share one sweep.
  2. ``ipm_fwd_affine`` — forward: affine rollout + slack/multiplier deltas
     + fraction-to-boundary alpha + the Mehrotra corrector products
     (ds*dl) + the mu_aff polynomial coefficients (so mu_aff is a per-lane
     quadratic in alpha, no tensor reduction afterwards).
  3. ``ipm_bwd_corr``   — backward: corrector vector recursion with the
     effective-multiplier gradients computed in-kernel from (sigma*mu,
     corrector products, slacks, multipliers, primal residuals).
  4. ``ipm_fwd_corr``   — forward: corrector rollout + deltas + alpha + a
     per-lane finiteness flag for the step-rejection guard.

Static A/B sparsity: the RK4 stage Jacobians of wheeled-robot models are
structurally sparse (translation invariance zeroes the x/y columns except
the diagonal; lag/integrator chains keep wheel states decoupled).  Kernels
take a static sparsity pattern and the A/B tensors arrive PACKED to their
structural nonzeros — for omni4 (nx=11) this cuts the dominant stream from
121 to ~45 tile-entries per stage and the nx^3 factorization FLOPs by ~2.5x.

Layout as in ``ops/pallas_riccati.py``: stage-major, entry-flat,
batch-minor; every entry is an [8, 128] VPU tile of 1024 scenario lanes.

Replaces what acados' SQP-RTI + HPIPM do per iteration in C
(``/root/reference/scripts/diff/generate_c_code.py:69-74`` selects
PARTIAL_CONDENSING_HPIPM; the reference never had a batched or fused form).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmpc_nav_control_tpu.ops.pallas_riccati import (
    _SB,
    _chol_solve_entries,
    _pallas_call,
)

__all__ = [
    "dense_sparsity",
    "pack_sparse",
    "ipm_bwd_fused",
    "ipm_fwd_affine",
    "ipm_bwd_corr",
    "ipm_fwd_corr",
    "ipm_kkt_fused",
]

_BIG = 3.4e38


# --------------------------------------------------------------------------- #
# Static sparsity patterns
# --------------------------------------------------------------------------- #


def dense_sparsity(nx: int, nu: int):
    """All-nonzero pattern (the safe default for arbitrary QP data)."""
    return (
        tuple(tuple(True for _ in range(nx)) for _ in range(nx)),
        tuple(tuple(True for _ in range(nu)) for _ in range(nx)),
    )


def _nz_positions(sp):
    """Row-major list of (i, j) structural nonzeros of a pattern."""
    return [(i, j) for i, row in enumerate(sp) for j, nz in enumerate(row) if nz]


def pack_sparse(x, sp):
    """[..., n, m] -> [..., nnz] keeping only the structural nonzeros."""
    pos = _nz_positions(sp)
    n, m = len(sp), len(sp[0])
    flat = x.reshape(x.shape[:-2] + (n * m,))
    idx = jnp.asarray([i * m + j for i, j in pos])
    return flat[..., idx]


def _unpack_entries(ref, sp, k0=0):
    """Kernel-side accessor: nested list with None at structural zeros.

    ``ref`` holds the packed entries at [0, 0, k0 + pos]; returns
    ``M[i][j]`` = tile or None.  Lower-precision streams (the optional bf16
    A/B streaming mode of ``qp/ipm_tiled.py``) are widened to f32 at load,
    so all in-kernel arithmetic stays f32 regardless of the HBM dtype.
    """
    n, m = len(sp), len(sp[0])
    M = [[None] * m for _ in range(n)]
    k = k0
    widen = ref.dtype == jnp.bfloat16
    for i, j in _nz_positions(sp):
        t = ref[0, 0, k]
        M[i][j] = t.astype(jnp.float32) if widen else t
        k += 1
    return M


def _dot(pairs):
    """Sum of a*b over pairs, skipping structural-zero (None) factors."""
    s = None
    for a, b in pairs:
        if a is None or b is None:
            continue
        term = a * b
        s = term if s is None else s + term
    return s


def _zeros_like_tile(ref):
    return jnp.zeros((_SB, 128), ref.dtype)


def _nn(x, ref):
    """None (structural zero) -> a zeros tile."""
    return _zeros_like_tile(ref) if x is None else x


# --------------------------------------------------------------------------- #
# Shared in-kernel algebra
# --------------------------------------------------------------------------- #


def _gaps_rp(idxbx, idxbu, dx_next, du, lbx_ref, ubx_ref, lbu_ref, ubu_ref,
             sxl_ref, sxu_ref, sul_ref, suu_ref):
    """Bound gaps and primal residuals rp = gap - s at the current iterate.

    x bounds at tensor row k apply to stage k+1 (dx_next); u bounds to du.
    """
    rp_xl, rp_xu, rp_ul, rp_uu = [], [], [], []
    for b, ix in enumerate(idxbx):
        z = dx_next[ix]
        rp_xl.append(z - lbx_ref[0, 0, b] - sxl_ref[0, 0, b])
        rp_xu.append(ubx_ref[0, 0, b] - z - sxu_ref[0, 0, b])
    for b, iu in enumerate(idxbu):
        z = du[iu]
        rp_ul.append(z - lbu_ref[0, 0, b] - sul_ref[0, 0, b])
        rp_uu.append(ubu_ref[0, 0, b] - z - suu_ref[0, 0, b])
    return rp_xl, rp_xu, rp_ul, rp_uu


def _grad_terms(nx, nu, idxbx, idxbu, Qdn_ref, qxn_ref, dx_next,
                Rd_ref, qu_ref, du, le_xl, le_xu, le_ul, le_uu):
    """Stationarity gradients at consumption rows:
    gx_{k+1} = Qd_{k+1} dx_{k+1} + qx_{k+1} + sel'(le_xu - le_xl),
    gu_k     = Rd_k du_k + qu_k + sel'(le_uu - le_ul)."""
    gx = [Qdn_ref[0, 0, i] * dx_next[i] + qxn_ref[0, 0, i] for i in range(nx)]
    for b, ix in enumerate(idxbx):
        gx[ix] = gx[ix] + (le_xu[b] - le_xl[b])
    gu = [Rd_ref[0, 0, i] * du[i] + qu_ref[0, 0, i] for i in range(nu)]
    for b, iu in enumerate(idxbu):
        gu[iu] = gu[iu] + (le_uu[b] - le_ul[b])
    return gx, gu


def _vector_bwd(nx, nu, A, Bm, K, L, Pc, gx, gu, p_scr):
    """One stage of the backward vector recursion with the diagonal-free
    carry: tmp = p_core_{k+1} + gx_{k+1} + P_full_{k+1} c_k.  Returns kff_k
    and stores the new carry."""
    p = [p_scr[i] for i in range(nx)]
    tmp = [p[i] + gx[i] + Pc[i] for i in range(nx)]
    qu_bar = []
    for i in range(nu):
        bt = _dot((Bm[m][i], tmp[m]) for m in range(nx))
        qu_bar.append(gu[i] if bt is None else gu[i] + bt)
    sol = _chol_solve_entries(L, [qu_bar], nu)[0]
    for i in range(nx):
        at = _dot((A[m][i], tmp[m]) for m in range(nx))
        kt = sum(K[m][i] * qu_bar[m] for m in range(nu))
        p_scr[i] = (0.0 if at is None else at) + kt
    return [-sol[i] for i in range(nu)]


def _ftb_ratio_update(m, pairs):
    """Running fraction-to-boundary min over (v, dv) pairs."""
    big = jnp.asarray(_BIG, m.dtype)
    for v, dv in pairs:
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), big)
        m = jnp.minimum(m, ratio)
    return m


# --------------------------------------------------------------------------- #
# Kernel 1: fused backward sweep (factor + residuals + affine recursion + mu)
# --------------------------------------------------------------------------- #


def _bwd_fused_kernel(nx, nu, N, idxbx, idxbu, reg, d_cap, asp, bsp,
                      # inputs
                      A_ref, B_ref, Qdn_ref, Rd_ref, qxn_ref, qu_ref, c0_ref,
                      dx_ref, dxn_ref, du_ref,
                      sxl_ref, sxu_ref, sul_ref, suu_ref,
                      lxl_ref, lxu_ref, lul_ref, luu_ref,
                      lbx_ref, ubx_ref, lbu_ref, ubu_ref,
                      # outputs
                      Ks_ref, Ls_ref, Pc_ref, rdyn_ref, kff_ref,
                      rpxl_ref, rpxu_ref, rpul_ref, rpuu_ref, mu_ref,
                      # scratch
                      P_scr, p_scr, mu_scr):
    kk = pl.program_id(1)            # stage k = N-1-kk (backward)
    nbx, nbu = len(idxbx), len(idxbu)

    ntri_x = nx * (nx + 1) // 2

    @pl.when(kk == 0)
    def _init():
        for i in range(ntri_x):
            P_scr[i] = _zeros_like_tile(Qdn_ref)
        for i in range(nx):
            p_scr[i] = _zeros_like_tile(Qdn_ref)
        mu_scr[0] = _zeros_like_tile(Qdn_ref)

    A = _unpack_entries(A_ref, asp)
    Bm = _unpack_entries(B_ref, bsp)
    dx = [dx_ref[0, 0, i] for i in range(nx)]
    dx_next = [dxn_ref[0, 0, i] for i in range(nx)]
    du = [du_ref[0, 0, i] for i in range(nu)]

    s_xl = [sxl_ref[0, 0, b] for b in range(nbx)]
    s_xu = [sxu_ref[0, 0, b] for b in range(nbx)]
    s_ul = [sul_ref[0, 0, b] for b in range(nbu)]
    s_uu = [suu_ref[0, 0, b] for b in range(nbu)]
    l_xl = [lxl_ref[0, 0, b] for b in range(nbx)]
    l_xu = [lxu_ref[0, 0, b] for b in range(nbx)]
    l_ul = [lul_ref[0, 0, b] for b in range(nbu)]
    l_uu = [luu_ref[0, 0, b] for b in range(nbu)]

    # --- Gaps / primal residuals (emitted for the other three sweeps). ---
    rp_xl, rp_xu, rp_ul, rp_uu = _gaps_rp(
        idxbx, idxbu, dx_next, du, lbx_ref, ubx_ref, lbu_ref, ubu_ref,
        sxl_ref, sxu_ref, sul_ref, suu_ref,
    )
    for b in range(nbx):
        rpxl_ref[0, 0, b] = rp_xl[b]
        rpxu_ref[0, 0, b] = rp_xu[b]
    for b in range(nbu):
        rpul_ref[0, 0, b] = rp_ul[b]
        rpuu_ref[0, 0, b] = rp_uu[b]

    # --- Complementarity accumulation (final flush = full sum). ---
    acc = mu_scr[0]
    for b in range(nbx):
        acc = acc + s_xl[b] * l_xl[b] + s_xu[b] * l_xu[b]
    for b in range(nbu):
        acc = acc + s_ul[b] * l_ul[b] + s_uu[b] * l_uu[b]
    mu_scr[0] = acc
    mu_ref[0, 0, 0] = acc

    # --- Barrier diagonals for the CONSUMED rows: state cost of stage k+1,
    #     input cost of stage k. ---
    cap = jnp.asarray(d_cap, Qdn_ref.dtype)
    Dx = [jnp.minimum(l_xl[b] / s_xl[b] + l_xu[b] / s_xu[b], cap)
          for b in range(nbx)]
    Du = [jnp.minimum(l_ul[b] / s_ul[b] + l_uu[b] / s_uu[b], cap)
          for b in range(nbu)]
    qbar_next = [Qdn_ref[0, 0, i] for i in range(nx)]
    for b, ix in enumerate(idxbx):
        qbar_next[ix] = qbar_next[ix] + Dx[b]
    rbar = [Rd_ref[0, 0, i] + reg for i in range(nu)]
    for b, iu in enumerate(idxbu):
        rbar[iu] = rbar[iu] + Du[b]

    # --- Full cost-to-go at consumption: P_{k+1} = P_core + diag(qbar).
    # P is symmetric; the carry stores only the lower triangle (66 vs 121
    # tiles for omni4) and both (i,j)/(j,i) views share ONE load. ---
    def tri(i, j):
        return i * (i + 1) // 2 + j if i >= j else j * (j + 1) // 2 + i

    P_lo = [P_scr[t] for t in range(ntri_x)]
    P = [[P_lo[tri(i, j)] + qbar_next[i] if i == j else P_lo[tri(i, j)]
          for j in range(nx)] for i in range(nx)]

    # --- Dynamics residual r_dyn_k = A dx_k + B du_k + c_k - dx_{k+1}. ---
    c = []
    for i in range(nx):
        ax = _dot((A[i][m], dx[m]) for m in range(nx))
        bu = _dot((Bm[i][m], du[m]) for m in range(nu))
        t = c0_ref[0, 0, i] - dx_next[i]
        if ax is not None:
            t = t + ax
        if bu is not None:
            t = t + bu
        c.append(t)
    for i in range(nx):
        rdyn_ref[0, 0, i] = c[i]

    # Pc = P_{k+1} @ r_dyn (consumed by both vector recursions).
    Pc = [sum(P[i][m] * c[m] for m in range(nx)) for i in range(nx)]
    for i in range(nx):
        Pc_ref[0, 0, i] = Pc[i]

    # --- Riccati factorization (P dense; A/B sparsity exploited). ---
    # Column-wise evaluation: the j-th column of PA is produced, consumed
    # into Qux[:, j] and the j-th column of A'PA, then DROPPED — peak live
    # tiles fall from ~(PA + PB + P) = 286 to ~(P_tri + apa_tri + one
    # column) = 143 for omni4, which is what bounds Mosaic's register/VMEM
    # scheduling in this nx=11 kernel.  FLOPs are identical to the
    # materialized form.
    Qux = [[None] * nx for _ in range(nu)]
    apa = {}
    for j in range(nx):
        PAj = [_dot((P[i][m], A[m][j]) for m in range(nx))
               for i in range(nx)]
        for i in range(nu):
            Qux[i][j] = _nn(_dot((Bm[m][i], PAj[m]) for m in range(nx)),
                            Rd_ref)
        # Lower triangle of A'PA (symmetric given symmetric P).
        for i in range(j, nx):
            apa[(i, j)] = _dot((A[m][i], PAj[m]) for m in range(nx))

    Quu = {}
    for j in range(nu):
        PBj = [_dot((P[i][m], Bm[m][j]) for m in range(nx))
               for i in range(nx)]
        for i in range(j, nu):
            s = _dot((Bm[m][i], PBj[m]) for m in range(nx))
            if s is None:  # pragma: no cover - all-zero B column
                s = _zeros_like_tile(Rd_ref)
            if i == j:
                s = s + rbar[i]
            Quu[(i, j)] = s

    L = {}
    for i in range(nu):
        for j in range(i + 1):
            s = Quu[(i, j)]
            for k in range(j):
                s = s - L[(i, k)] * L[(j, k)]
            if i == j:
                L[(i, j)] = jnp.sqrt(s)
            else:
                L[(i, j)] = s / L[(j, j)]

    rhs_cols = [[Qux[i][j] for i in range(nu)] for j in range(nx)]
    Kcols = _chol_solve_entries(L, rhs_cols, nu)
    K = [[-Kcols[j][i] for j in range(nx)] for i in range(nu)]

    # P_core_k = A' P A + Qux' K, WITHOUT the stage-k diagonal (added at
    # consumption next step).  Both terms are symmetric given symmetric P,
    # so only the lower triangle is computed and stored — symmetric by
    # construction (the HPIPM approach), half the update FLOPs of
    # compute-both-and-average.
    for i in range(nx):
        for j in range(i + 1):
            s = apa[(i, j)]
            P_scr[tri(i, j)] = (0.0 if s is None else s) + sum(
                Qux[m][i] * K[m][j] for m in range(nu)
            )

    for i in range(nu):
        for j in range(nx):
            Ks_ref[0, 0, i * nx + j] = K[i][j]
    idx = 0
    for i in range(nu):
        for j in range(i + 1):
            Ls_ref[0, 0, idx] = L[(i, j)]
            idx += 1

    # --- Affine vector recursion (sigma = 0, corr = 0):
    #     le = -(lam/s) * rp. ---
    le_xl = [-(l_xl[b] / s_xl[b]) * rp_xl[b] for b in range(nbx)]
    le_xu = [-(l_xu[b] / s_xu[b]) * rp_xu[b] for b in range(nbx)]
    le_ul = [-(l_ul[b] / s_ul[b]) * rp_ul[b] for b in range(nbu)]
    le_uu = [-(l_uu[b] / s_uu[b]) * rp_uu[b] for b in range(nbu)]
    gx, gu = _grad_terms(nx, nu, idxbx, idxbu, Qdn_ref, qxn_ref, dx_next,
                         Rd_ref, qu_ref, du, le_xl, le_xu, le_ul, le_uu)
    kff = _vector_bwd(nx, nu, A, Bm, K, L, Pc, gx, gu, p_scr)
    for i in range(nu):
        kff_ref[0, 0, i] = kff[i]


def ipm_bwd_fused(At, Bt, Qdt, Rdt, qxt, qut, ct0, dxst, dust,
                  s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
                  lbxt, ubxt, lbut, ubut,
                  idxbx, idxbu, nx, nu, *, reg, d_cap, asp, bsp):
    """Fused backward sweep.  A/B arrive PACKED per ``pack_sparse``.

    Shapes (tiled, [G, rows, entries, 8, 128]): At [G,N,nnzA], Bt [G,N,nnzB],
    Qdt/qxt [G,N+1,nx], Rdt/qut [G,N,nu], ct0 [G,N,nx], dxst [G,N+1,nx],
    dust [G,N,nu], bounds/slacks/multipliers [G,N,nb].

    Returns (Kt, Lt, Pct, rdynt, kff_aff, rp_xl, rp_xu, rp_ul, rp_uu, musum)
    with musum [G, 1, 1, 8, 128] = sum of s*lam over ALL constraints.
    """
    G, N = ct0.shape[0], ct0.shape[1]
    nbx, nbu = len(idxbx), len(idxbu)
    ntri = nu * (nu + 1) // 2
    dtype = ct0.dtype
    nnzA, nnzB = At.shape[2], Bt.shape[2]

    def rev(b, k):
        return (b, N - 1 - k, 0, 0, 0)

    def rev_next(b, k):
        return (b, N - k, 0, 0, 0)

    def fix0(b, k):
        return (b, 0, 0, 0, 0)

    def spec(e, mp=rev):
        return pl.BlockSpec((1, 1, e, _SB, 128), mp, memory_space=pltpu.VMEM)

    kern = functools.partial(
        _bwd_fused_kernel, nx, nu, N, tuple(idxbx), tuple(idxbu),
        float(reg), float(d_cap), asp, bsp,
    )
    return _pallas_call(
        kern,
        grid=(G, N),
        in_specs=[
            spec(nnzA), spec(nnzB),
            spec(nx, rev_next), spec(nu), spec(nx, rev_next), spec(nu),
            spec(nx),
            spec(nx), spec(nx, rev_next), spec(nu),
            spec(nbx), spec(nbx), spec(nbu), spec(nbu),
            spec(nbx), spec(nbx), spec(nbu), spec(nbu),
            spec(nbx), spec(nbx), spec(nbu), spec(nbu),
        ],
        out_specs=[
            spec(nu * nx), spec(ntri), spec(nx), spec(nx), spec(nu),
            spec(nbx), spec(nbx), spec(nbu), spec(nbu),
            spec(1, fix0),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, N, nu * nx, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, ntri, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nx, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nx, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nu, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbx, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbx, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbu, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbu, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, 1, 1, _SB, 128), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx * (nx + 1) // 2, _SB, 128), dtype),
            pltpu.VMEM((nx, _SB, 128), dtype),
            pltpu.VMEM((1, _SB, 128), dtype),
        ],
    )(At, Bt, Qdt, Rdt, qxt, qut, ct0, dxst, dxst, dust,
      s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
      lbxt, ubxt, lbut, ubut)


# --------------------------------------------------------------------------- #
# Kernel 3: corrector backward sweep (vector recursion, gradients in-kernel)
# --------------------------------------------------------------------------- #


def _bwd_corr_kernel(nx, nu, N, idxbx, idxbu, asp, bsp,
                     A_ref, B_ref, K_ref, L_ref, Pc_ref,
                     Qdn_ref, qxn_ref, dxn_ref, Rd_ref, qu_ref, du_ref,
                     sxl_ref, sxu_ref, sul_ref, suu_ref,
                     lxl_ref, lxu_ref, lul_ref, luu_ref,
                     rpxl_ref, rpxu_ref, rpul_ref, rpuu_ref,
                     cxl_ref, cxu_ref, cul_ref, cuu_ref,
                     sm_ref,
                     kff_ref, p_scr):
    kk = pl.program_id(1)
    nbx, nbu = len(idxbx), len(idxbu)

    @pl.when(kk == 0)
    def _init():
        for i in range(nx):
            p_scr[i] = _zeros_like_tile(Qdn_ref)

    A = _unpack_entries(A_ref, asp)
    Bm = _unpack_entries(B_ref, bsp)
    K = [[K_ref[0, 0, i * nx + j] for j in range(nx)] for i in range(nu)]
    L = {}
    idx = 0
    for i in range(nu):
        for j in range(i + 1):
            L[(i, j)] = L_ref[0, 0, idx]
            idx += 1
    Pc = [Pc_ref[0, 0, i] for i in range(nx)]
    dx_next = [dxn_ref[0, 0, i] for i in range(nx)]
    du = [du_ref[0, 0, i] for i in range(nu)]
    sm = sm_ref[0, 0, 0]

    def le(s_ref, l_ref, rp_ref, c_ref, b):
        s, lam = s_ref[0, 0, b], l_ref[0, 0, b]
        return (sm - c_ref[0, 0, b]) / s - (lam / s) * rp_ref[0, 0, b]

    le_xl = [le(sxl_ref, lxl_ref, rpxl_ref, cxl_ref, b) for b in range(nbx)]
    le_xu = [le(sxu_ref, lxu_ref, rpxu_ref, cxu_ref, b) for b in range(nbx)]
    le_ul = [le(sul_ref, lul_ref, rpul_ref, cul_ref, b) for b in range(nbu)]
    le_uu = [le(suu_ref, luu_ref, rpuu_ref, cuu_ref, b) for b in range(nbu)]
    gx, gu = _grad_terms(nx, nu, idxbx, idxbu, Qdn_ref, qxn_ref, dx_next,
                         Rd_ref, qu_ref, du, le_xl, le_xu, le_ul, le_uu)
    kff = _vector_bwd(nx, nu, A, Bm, K, L, Pc, gx, gu, p_scr)
    for i in range(nu):
        kff_ref[0, 0, i] = kff[i]


def ipm_bwd_corr(At, Bt, Kt, Lt, Pct, Qdt, qxt, dxst, Rdt, qut, dust,
                 s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
                 rp_xl, rp_xu, rp_ul, rp_uu,
                 corr_xl, corr_xu, corr_ul, corr_uu, sigma_mu,
                 idxbx, idxbu, nx, nu, *, asp, bsp):
    """Corrector backward vector recursion; returns kff [G, N, nu, 8, 128].

    ``sigma_mu``: [G, 1, 1, 8, 128] per-lane centering value sigma*mu.
    """
    G, N = Kt.shape[0], Kt.shape[1]
    nbx, nbu = len(idxbx), len(idxbu)
    ntri = nu * (nu + 1) // 2
    dtype = Kt.dtype
    nnzA, nnzB = At.shape[2], Bt.shape[2]

    def rev(b, k):
        return (b, N - 1 - k, 0, 0, 0)

    def rev_next(b, k):
        return (b, N - k, 0, 0, 0)

    def fix0(b, k):
        return (b, 0, 0, 0, 0)

    def spec(e, mp=rev):
        return pl.BlockSpec((1, 1, e, _SB, 128), mp, memory_space=pltpu.VMEM)

    kern = functools.partial(
        _bwd_corr_kernel, nx, nu, N, tuple(idxbx), tuple(idxbu), asp, bsp,
    )
    (kfft,) = _pallas_call(
        kern,
        grid=(G, N),
        in_specs=[
            spec(nnzA), spec(nnzB), spec(nu * nx), spec(ntri), spec(nx),
            spec(nx, rev_next), spec(nx, rev_next), spec(nx, rev_next),
            spec(nu), spec(nu), spec(nu),
            spec(nbx), spec(nbx), spec(nbu), spec(nbu),
            spec(nbx), spec(nbx), spec(nbu), spec(nbu),
            spec(nbx), spec(nbx), spec(nbu), spec(nbu),
            spec(nbx), spec(nbx), spec(nbu), spec(nbu),
            spec(1, fix0),
        ],
        out_specs=[spec(nu)],
        out_shape=[jax.ShapeDtypeStruct((G, N, nu, _SB, 128), dtype)],
        scratch_shapes=[pltpu.VMEM((nx, _SB, 128), dtype)],
    )(At, Bt, Kt, Lt, Pct, Qdt, qxt, dxst, Rdt, qut, dust,
      s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
      rp_xl, rp_xu, rp_ul, rp_uu,
      corr_xl, corr_xu, corr_ul, corr_uu, sigma_mu)
    return kfft


# --------------------------------------------------------------------------- #
# Kernels 2 & 4: forward sweeps (rollout + deltas + step length)
# --------------------------------------------------------------------------- #


def _fwd_rollout(nx, nu, asp, bsp, A_ref, B_ref, K_ref, kff_ref, c_ref,
                 dx0_ref, dx_scr, kk):
    """Shared forward-rollout stage: returns (dx, du, dx_next) and stores the
    new carry."""

    @pl.when(kk == 0)
    def _init():
        for i in range(nx):
            dx_scr[i] = dx0_ref[0, 0, i]

    A = _unpack_entries(A_ref, asp)
    Bm = _unpack_entries(B_ref, bsp)
    K = [[K_ref[0, 0, i * nx + j] for j in range(nx)] for i in range(nu)]
    dx = [dx_scr[i] for i in range(nx)]
    du = [kff_ref[0, 0, i] + sum(K[i][m] * dx[m] for m in range(nx))
          for i in range(nu)]
    dx_next = []
    for i in range(nx):
        ax = _dot((A[i][m], dx[m]) for m in range(nx))
        bu = _dot((Bm[i][m], du[m]) for m in range(nu))
        t = c_ref[0, 0, i]
        if ax is not None:
            t = t + ax
        if bu is not None:
            t = t + bu
        dx_next.append(t)
    for i in range(nx):
        dx_scr[i] = dx_next[i]
    return dx, du, dx_next


def _fwd_kernel(nx, nu, N, idxbx, idxbu, tau, mode, asp, bsp,
                *refs):
    """Forward sweep.  mode='affine' emits corrector products + mu_aff
    coefficients; mode='corr' emits full deltas + a finiteness flag."""
    nbx, nbu = len(idxbx), len(idxbu)
    it = iter(refs)
    A_ref, B_ref, K_ref, kff_ref, c_ref, dx0_ref = (next(it) for _ in range(6))
    sxl_ref, sxu_ref, sul_ref, suu_ref = (next(it) for _ in range(4))
    lxl_ref, lxu_ref, lul_ref, luu_ref = (next(it) for _ in range(4))
    rpxl_ref, rpxu_ref, rpul_ref, rpuu_ref = (next(it) for _ in range(4))
    if mode == "corr":
        cxl_ref, cxu_ref, cul_ref, cuu_ref = (next(it) for _ in range(4))
        sm_ref = next(it)
        (dxs_ref, dus_ref, dxN_ref,
         dsxl_ref, dsxu_ref, dsul_ref, dsuu_ref,
         dlxl_ref, dlxu_ref, dlul_ref, dluu_ref,
         alpha_ref, fin_ref) = (next(it) for _ in range(13))
        dx_scr, ratio_scr, fin_scr = (next(it) for _ in range(3))
    else:
        (pxl_ref, pxu_ref, pul_ref, puu_ref,
         alpha_ref, c12_ref) = (next(it) for _ in range(6))
        dx_scr, ratio_scr, c12_scr = (next(it) for _ in range(3))

    kk = pl.program_id(1)
    big = jnp.asarray(_BIG, dx0_ref.dtype)

    @pl.when(kk == 0)
    def _init():
        ratio_scr[0] = jnp.full((_SB, 128), big, dx0_ref.dtype)
        if mode == "corr":
            fin_scr[0] = jnp.ones((_SB, 128), dx0_ref.dtype)
        else:
            c12_scr[0] = _zeros_like_tile(dx0_ref)
            c12_scr[1] = _zeros_like_tile(dx0_ref)

    dx, du, dx_next = _fwd_rollout(
        nx, nu, asp, bsp, A_ref, B_ref, K_ref, kff_ref, c_ref, dx0_ref,
        dx_scr, kk,
    )
    if mode == "corr":
        for i in range(nx):
            dxs_ref[0, 0, i] = dx[i]
            dxN_ref[0, 0, i] = dx_next[i]   # constant map: final write = dx_N
        for i in range(nu):
            dus_ref[0, 0, i] = du[i]

    sm = sm_ref[0, 0, 0] if mode == "corr" else None

    def le_of(s, lam, rp, corr):
        if mode == "corr":
            return (sm - corr) / s - (lam / s) * rp
        return -(lam / s) * rp

    groups = []
    for b, ix in enumerate(idxbx):
        dz = dx_next[ix]
        s_l, s_u = sxl_ref[0, 0, b], sxu_ref[0, 0, b]
        l_l, l_u = lxl_ref[0, 0, b], lxu_ref[0, 0, b]
        rp_l, rp_u = rpxl_ref[0, 0, b], rpxu_ref[0, 0, b]
        c_l = cxl_ref[0, 0, b] if mode == "corr" else None
        c_u = cxu_ref[0, 0, b] if mode == "corr" else None
        groups.append(("xl", b, dz, s_l, l_l, rp_l, le_of(s_l, l_l, rp_l, c_l), +1))
        groups.append(("xu", b, dz, s_u, l_u, rp_u, le_of(s_u, l_u, rp_u, c_u), -1))
    for b, iu in enumerate(idxbu):
        dz = du[iu]
        s_l, s_u = sul_ref[0, 0, b], suu_ref[0, 0, b]
        l_l, l_u = lul_ref[0, 0, b], luu_ref[0, 0, b]
        rp_l, rp_u = rpul_ref[0, 0, b], rpuu_ref[0, 0, b]
        c_l = cul_ref[0, 0, b] if mode == "corr" else None
        c_u = cuu_ref[0, 0, b] if mode == "corr" else None
        groups.append(("ul", b, dz, s_l, l_l, rp_l, le_of(s_l, l_l, rp_l, c_l), +1))
        groups.append(("uu", b, dz, s_u, l_u, rp_u, le_of(s_u, l_u, rp_u, c_u), -1))

    m = ratio_scr[0]
    if mode == "affine":
        c1 = c12_scr[0]
        c2 = c12_scr[1]
    else:
        fin = fin_scr[0]
        for v in du + dx_next:
            fin = fin * jnp.isfinite(v).astype(fin.dtype)

    prod_refs = {"xl": None, "xu": None, "ul": None, "uu": None}
    if mode == "affine":
        prod_refs = {"xl": pxl_ref, "xu": pxu_ref, "ul": pul_ref, "uu": puu_ref}
    ds_refs = {}
    dl_refs = {}
    if mode == "corr":
        ds_refs = {"xl": dsxl_ref, "xu": dsxu_ref, "ul": dsul_ref, "uu": dsuu_ref}
        dl_refs = {"xl": dlxl_ref, "xu": dlxu_ref, "ul": dlul_ref, "uu": dluu_ref}

    for tag, b, dz, s, lam, rp, le, sign in groups:
        ds = rp + sign * dz
        dl = -sign * (lam / s) * dz + le - lam
        m = _ftb_ratio_update(m, [(s, ds), (lam, dl)])
        if mode == "affine":
            prod_refs[tag][0, 0, b] = ds * dl
            c1 = c1 + s * dl + lam * ds
            c2 = c2 + ds * dl
        else:
            ds_refs[tag][0, 0, b] = ds
            dl_refs[tag][0, 0, b] = dl
            fin = fin * jnp.isfinite(ds).astype(fin.dtype)
            fin = fin * jnp.isfinite(dl).astype(fin.dtype)

    ratio_scr[0] = m
    alpha_ref[0, 0, 0] = jnp.minimum(jnp.ones_like(m), tau * m)
    if mode == "affine":
        c12_scr[0] = c1
        c12_scr[1] = c2
        c12_ref[0, 0, 0] = c1
        c12_ref[0, 0, 1] = c2
    else:
        fin_scr[0] = fin
        fin_ref[0, 0, 0] = fin


def _fwd_common_specs(G, N, nbx, nbu, nnzA, nnzB, nx, nu):
    def fwd(b, k):
        return (b, k, 0, 0, 0)

    def fix0(b, k):
        return (b, 0, 0, 0, 0)

    def spec(e, mp=fwd):
        return pl.BlockSpec((1, 1, e, _SB, 128), mp, memory_space=pltpu.VMEM)

    ins = [
        spec(nnzA), spec(nnzB), spec(nu * nx), spec(nu), spec(nx),
        spec(nx, fix0),
        spec(nbx), spec(nbx), spec(nbu), spec(nbu),
        spec(nbx), spec(nbx), spec(nbu), spec(nbu),
        spec(nbx), spec(nbx), spec(nbu), spec(nbu),
    ]
    return ins, spec, fix0


def ipm_fwd_affine(At, Bt, Kt, kfft, rdynt, dx0t,
                   s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
                   rp_xl, rp_xu, rp_ul, rp_uu,
                   idxbx, idxbu, tau, nx, nu, *, asp, bsp):
    """Affine forward sweep.  Returns
    (corr_xl, corr_xu, corr_ul, corr_uu, alphat, c12t) where corr_* are the
    Mehrotra products ds_aff*dl_aff, alphat [G,1,1,8,128] the per-lane
    fraction-to-boundary step, c12t [G,1,2,8,128] the mu_aff polynomial
    coefficients: mu_aff = (musum + alpha*c1 + alpha^2*c2) / n_con."""
    G, N = Kt.shape[0], Kt.shape[1]
    nbx, nbu = len(idxbx), len(idxbu)
    dtype = Kt.dtype
    ins, spec, fix0 = _fwd_common_specs(
        G, N, nbx, nbu, At.shape[2], Bt.shape[2], nx, nu)

    kern = functools.partial(
        _fwd_kernel, nx, nu, N, tuple(idxbx), tuple(idxbu), float(tau),
        "affine", asp, bsp,
    )
    return _pallas_call(
        kern,
        grid=(G, N),
        in_specs=ins,
        out_specs=[
            spec(nbx), spec(nbx), spec(nbu), spec(nbu),
            spec(1, fix0), spec(2, fix0),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, N, nbx, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbx, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbu, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbu, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, 1, 1, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, 1, 2, _SB, 128), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx, _SB, 128), dtype),
            pltpu.VMEM((1, _SB, 128), dtype),
            pltpu.VMEM((2, _SB, 128), dtype),
        ],
    )(At, Bt, Kt, kfft, rdynt, dx0t,
      s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
      rp_xl, rp_xu, rp_ul, rp_uu)


def ipm_fwd_corr(At, Bt, Kt, kfft, rdynt, dx0t,
                 s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
                 rp_xl, rp_xu, rp_ul, rp_uu,
                 corr_xl, corr_xu, corr_ul, corr_uu, sigma_mu,
                 idxbx, idxbu, tau, nx, nu, *, asp, bsp):
    """Corrector forward sweep.  Returns
    (dxst rows 0..N-1, dust, dxNt, ds_xl, ds_xu, ds_ul, ds_uu,
     dl_xl, dl_xu, dl_ul, dl_uu, alphat, finitet) — finitet [G,1,1,8,128]
    is 1.0 on lanes whose full delta set is finite."""
    G, N = Kt.shape[0], Kt.shape[1]
    nbx, nbu = len(idxbx), len(idxbu)
    dtype = Kt.dtype
    ins, spec, fix0 = _fwd_common_specs(
        G, N, nbx, nbu, At.shape[2], Bt.shape[2], nx, nu)
    ins = ins + [
        spec(nbx), spec(nbx), spec(nbu), spec(nbu),  # corr products
        spec(1, fix0),                               # sigma*mu
    ]

    kern = functools.partial(
        _fwd_kernel, nx, nu, N, tuple(idxbx), tuple(idxbu), float(tau),
        "corr", asp, bsp,
    )
    return _pallas_call(
        kern,
        grid=(G, N),
        in_specs=ins,
        out_specs=[
            spec(nx), spec(nu), spec(nx, fix0),
            spec(nbx), spec(nbx), spec(nbu), spec(nbu),
            spec(nbx), spec(nbx), spec(nbu), spec(nbu),
            spec(1, fix0), spec(1, fix0),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, N, nx, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nu, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, 1, nx, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbx, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbx, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbu, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbu, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbx, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbx, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbu, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, N, nbu, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, 1, 1, _SB, 128), dtype),
            jax.ShapeDtypeStruct((G, 1, 1, _SB, 128), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx, _SB, 128), dtype),
            pltpu.VMEM((1, _SB, 128), dtype),
            pltpu.VMEM((1, _SB, 128), dtype),
        ],
    )(At, Bt, Kt, kfft, rdynt, dx0t,
      s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
      rp_xl, rp_xu, rp_ul, rp_uu,
      corr_xl, corr_xu, corr_ul, corr_uu, sigma_mu)


# --------------------------------------------------------------------------- #
# Post-solve KKT stationarity (one backward sweep per SOLVE, not iteration)
# --------------------------------------------------------------------------- #


def _kkt_kernel(nx, nu, N, idxbx, idxbu, asp, bsp,
                A_ref, B_ref, Qdn_ref, qxn_ref, dxn_ref,
                Rd_ref, qu_ref, du_ref,
                lxl_ref, lxu_ref, lul_ref, luu_ref,
                sxl_ref, sxu_ref, sul_ref, suu_ref,
                kkt_ref, mu_ref, c_scr, m_scr, mu_scr):
    """Costate recursion + inf-norm u-stationarity + complementarity, fused.

    Matches ``qp/ipm._stationarity_inf_norm`` (the ``inf_norm_res`` analog
    read at ``NMPCNavControlDiff.cpp:146``) on the tiled layout: carry
    c_k = A_k' nu_{k+1}; nu_{k+1} = gx_{k+1} + c_{k+1};
    ru_k = gu_k + B_k' nu_{k+1}; report max_k |ru_k|.  The sum of s*lam over
    all constraints rides along (one pass instead of a standalone XLA
    reduction over the slack tensors).
    """
    kk = pl.program_id(1)            # stage k = N-1-kk
    nbx, nbu = len(idxbx), len(idxbu)

    @pl.when(kk == 0)
    def _init():
        for i in range(nx):
            c_scr[i] = _zeros_like_tile(Qdn_ref)
        m_scr[0] = _zeros_like_tile(Qdn_ref)
        mu_scr[0] = _zeros_like_tile(Qdn_ref)

    A = _unpack_entries(A_ref, asp)
    Bm = _unpack_entries(B_ref, bsp)

    gxn = [Qdn_ref[0, 0, i] * dxn_ref[0, 0, i] + qxn_ref[0, 0, i]
           for i in range(nx)]
    for b, ix in enumerate(idxbx):
        gxn[ix] = gxn[ix] + (lxu_ref[0, 0, b] - lxl_ref[0, 0, b])
    nu_v = [gxn[i] + c_scr[i] for i in range(nx)]

    gu = [Rd_ref[0, 0, i] * du_ref[0, 0, i] + qu_ref[0, 0, i]
          for i in range(nu)]
    for b, iu in enumerate(idxbu):
        gu[iu] = gu[iu] + (luu_ref[0, 0, b] - lul_ref[0, 0, b])

    m = m_scr[0]
    for i in range(nu):
        bt = _dot((Bm[mm][i], nu_v[mm]) for mm in range(nx))
        ru = gu[i] if bt is None else gu[i] + bt
        m = jnp.maximum(m, jnp.abs(ru))
    m_scr[0] = m
    kkt_ref[0, 0, 0] = m                 # final write = global max

    acc = mu_scr[0]
    for b in range(nbx):
        acc = acc + (sxl_ref[0, 0, b] * lxl_ref[0, 0, b]
                     + sxu_ref[0, 0, b] * lxu_ref[0, 0, b])
    for b in range(nbu):
        acc = acc + (sul_ref[0, 0, b] * lul_ref[0, 0, b]
                     + suu_ref[0, 0, b] * luu_ref[0, 0, b])
    mu_scr[0] = acc
    mu_ref[0, 0, 0] = acc                # final write = full sum

    for i in range(nx):
        at = _dot((A[mm][i], nu_v[mm]) for mm in range(nx))
        c_scr[i] = _zeros_like_tile(Qdn_ref) if at is None else at


def ipm_kkt_fused(At, Bt, Qdt, qxt, dxst, Rdt, qut, dust,
                  l_xl, l_xu, l_ul, l_uu, s_xl, s_xu, s_ul, s_uu,
                  idxbx, idxbu, nx, nu, *, asp, bsp):
    """Per-lane inf-norm KKT stationarity + complementarity sum of a (tiled)
    iterate.

    Replaces the vmapped XLA costate scan — N sequential tiny batched
    matvecs per tick whose launch overhead dominated ~25% of the control
    tick — with one Pallas backward sweep over the already-tiled solution.
    Returns (kkt, musum), each [G, 1, 1, 8, 128].
    """
    G, N = At.shape[0], At.shape[1]
    nbx, nbu = len(idxbx), len(idxbu)
    # Compute dtype comes from the f32 operands: A/B may stream as bf16.
    dtype = Qdt.dtype
    nnzA, nnzB = At.shape[2], Bt.shape[2]

    def rev(b, k):
        return (b, N - 1 - k, 0, 0, 0)

    def rev_next(b, k):
        return (b, N - k, 0, 0, 0)

    def fix0(b, k):
        return (b, 0, 0, 0, 0)

    def spec(e, mp=rev):
        return pl.BlockSpec((1, 1, e, _SB, 128), mp, memory_space=pltpu.VMEM)

    kern = functools.partial(
        _kkt_kernel, nx, nu, N, tuple(idxbx), tuple(idxbu), asp, bsp,
    )
    (kkt, musum) = _pallas_call(
        kern,
        grid=(G, N),
        in_specs=[
            spec(nnzA), spec(nnzB),
            spec(nx, rev_next), spec(nx, rev_next), spec(nx, rev_next),
            spec(nu), spec(nu), spec(nu),
            spec(nbx), spec(nbx), spec(nbu), spec(nbu),
            spec(nbx), spec(nbx), spec(nbu), spec(nbu),
        ],
        out_specs=[spec(1, fix0), spec(1, fix0)],
        out_shape=[jax.ShapeDtypeStruct((G, 1, 1, _SB, 128), dtype),
                   jax.ShapeDtypeStruct((G, 1, 1, _SB, 128), dtype)],
        scratch_shapes=[
            pltpu.VMEM((nx, _SB, 128), dtype),
            pltpu.VMEM((1, _SB, 128), dtype),
            pltpu.VMEM((1, _SB, 128), dtype),
        ],
    )(At, Bt, Qdt, qxt, dxst, Rdt, qut, dust,
      l_xl, l_xu, l_ul, l_uu, s_xl, s_xu, s_ul, s_uu)
    return kkt, musum
