"""Batched Mehrotra box-IPM in the Pallas tile layout.

Numerically identical algorithm to ``qp/ipm.py`` (same predictor-corrector,
fraction-to-boundary, freeze and f32 guards — keep the two in sync), but
engineered for throughput on TPU:

  - every per-stage quantity lives in the tiled layout
    [G, N(+1), entries, 8, 128] (G = batch/1024 tile groups) for the entire
    solve: inputs are transposed ONCE, outputs ONCE.  The per-iteration
    re-tiling of A/B/gradients that the generic path pays (24+ HBM-shuffles
    of the largest tensors per solve) disappears;
  - the Riccati factor kernel consumes the dynamics residual c and emits
    Pc = P_{k+1} c_k instead of the full cost-to-go P ([nx] vs [nx, nx] per
    stage), removing the biggest tensor from the HBM traffic entirely
    (``ops/pallas_riccati.riccati_factor_c_tiled``);
  - all slack/multiplier algebra is elementwise in the tiled layout (XLA
    fuses it); per-problem reductions (mu, step lengths, freeze masks)
    reduce over the (stage, entry) axes, leaving per-lane [G, 8, 128]
    scalars.

Replaces HPIPM like ``qp/ipm.py`` does; selected automatically under a full
scenario-batch ``vmap`` on TPU via the ``custom_vmap`` rule in ``qp/ipm.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from nmpc_nav_control_tpu.ops.pallas_riccati import (
    from_tiles,
    riccati_factor_c_tiled,
    riccati_solve_bwd_tiled,
    riccati_solve_fwd_ftb_tiled,
    to_tiles,
)
from nmpc_nav_control_tpu.qp.riccati import _highest_precision

__all__ = ["solve_box_qp_tiled"]


@_highest_precision
def solve_box_qp_tiled(
    qp,  # BoxQP with leading batch axis on every leaf
    idxbx,
    idxbu,
    iters: int = 12,
    tau: float = 0.995,
    mu0: float = 1e-1,
    s_min: float = 1e-2,
    reg: float = 1e-8,
    mu_min: float | None = None,
):
    """Batched solve; returns an ``IPMSolution`` with leading batch axes.

    Requirements (checked by the dispatch rule): f32, batch % 1024 == 0.
    """
    from nmpc_nav_control_tpu.qp.ipm import (
        IPMSolution,
        _Iterate,
        _stationarity_inf_norm,
    )

    idxbx_t = tuple(int(i) for i in idxbx)
    idxbu_t = tuple(int(i) for i in idxbu)
    Bt_, N, nx, nu = qp.B.shape
    nbx, nbu = len(idxbx_t), len(idxbu_t)
    dtype = qp.A.dtype
    if mu_min is None:
        mu_min = 1e-7  # f32 only on this path

    # ---- One-time tiling of the QP data. ----
    At = to_tiles(qp.A, (nx, nx))
    Bmt = to_tiles(qp.B, (nx, nu))
    ct0 = to_tiles(qp.c, (nx,))                 # base c (residual refreshed per iter)
    Qdt = to_tiles(qp.Qd, (nx,))                # [G, N+1, nx, ...]
    qxt = to_tiles(qp.qx, (nx,))
    Rdt = to_tiles(qp.Rd, (nu,))
    qut = to_tiles(qp.qu, (nu,))
    dx0t = to_tiles(qp.dx0[:, None], (nx,))     # [G, 1, nx, ...]
    lbxt = to_tiles(qp.lbx, (nbx,))
    ubxt = to_tiles(qp.ubx, (nbx,))
    lbut = to_tiles(qp.lbu, (nbu,))
    ubut = to_tiles(qp.ubu, (nbu,))

    G = At.shape[0]
    ibx = jnp.asarray(idxbx_t)
    ibu = jnp.asarray(idxbu_t)

    eps_floor = jnp.asarray(1e-9, dtype)
    d_cap = jnp.asarray(1e10, dtype)
    n_con = 2 * N * (nbx + nbu)

    def gaps(dxt, dut):
        # dxt: [G, N+1, nx, ...] rows 0..N; bounds apply to rows 1..N.
        zx = dxt[:, 1:, ibx]
        zu = dut[:, :, ibu]
        return zx - lbxt, ubxt - zx, zu - lbut, ubut - zu

    # ---- Initial iterate (all tiled). ----
    dxt0 = jnp.zeros((G, N + 1, nx, 8, 128), dtype)
    dut0 = jnp.zeros((G, N, nu, 8, 128), dtype)
    gxl, gxu, gul, guu = gaps(dxt0, dut0)

    def init_sl(gap):
        s = jnp.maximum(gap, s_min)
        lam = jnp.maximum(mu0 / s, s_min)
        return s, lam

    s_xl, l_xl = init_sl(gxl)
    s_xu, l_xu = init_sl(gxu)
    s_ul, l_ul = init_sl(gul)
    s_uu, l_uu = init_sl(guu)
    it0 = _Iterate(dxt0, dut0, s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu)

    def mu_of(it):
        total = (
            jnp.sum(it.s_xl * it.l_xl, axis=(1, 2))
            + jnp.sum(it.s_xu * it.l_xu, axis=(1, 2))
            + jnp.sum(it.s_ul * it.l_ul, axis=(1, 2))
            + jnp.sum(it.s_uu * it.l_uu, axis=(1, 2))
        )
        return total / n_con                       # [G, 8, 128]

    def per_stage(lane):                           # [G, 8, 128] -> broadcastable
        return lane[:, None, None]

    def ipm_iter(it, _):
        gxl, gxu, gul, guu = gaps(it.dxs, it.dus)
        rp_xl, rp_xu = gxl - it.s_xl, gxu - it.s_xu
        rp_ul, rp_uu = gul - it.s_ul, guu - it.s_uu

        mu = mu_of(it)                             # [G, 8, 128]

        Dx = jnp.minimum(it.l_xl / it.s_xl + it.l_xu / it.s_xu, d_cap)
        Du = jnp.minimum(it.l_ul / it.s_ul + it.l_uu / it.s_uu, d_cap)
        Qbar = Qdt.at[:, 1:, ibx].add(Dx)
        Rbar = (Rdt + reg).at[:, :, ibu].add(Du)

        # Equality residuals at the current iterate: r_dyn is evaluated
        # INSIDE the factor kernel (which already holds A_k/B_k in VMEM),
        # avoiding a separate matvec pass over the two largest tensors.
        r_init = dx0t - it.dxs[:, :1]

        Kt, Lt, Pct, r_dyn = riccati_factor_c_tiled(
            At, Bmt, Qbar, Rbar, ct0, it.dxs, it.dus, nx, nu
        )

        def newton(sigma_mu, corr_xl, corr_xu, corr_ul, corr_uu):
            """One Newton solve.  The backward pass consumes the barrier
            gradients; the forward pass also computes the slack/multiplier
            deltas and the fraction-to-boundary step length in-kernel.
            Returns (ddxs, ddus, ds_*, dl_*, alpha [G,8,128])."""

            def lam_eff(lam, s, rp, corr):
                return (sigma_mu - corr) / s - (lam / s) * rp

            le_xl = lam_eff(it.l_xl, it.s_xl, rp_xl, corr_xl)
            le_xu = lam_eff(it.l_xu, it.s_xu, rp_xu, corr_xu)
            le_ul = lam_eff(it.l_ul, it.s_ul, rp_ul, corr_ul)
            le_uu = lam_eff(it.l_uu, it.s_uu, rp_uu, corr_uu)

            gx = Qdt * it.dxs + qxt
            gx = gx.at[:, 1:, ibx].add(le_xu - le_xl)
            gu = Rdt * it.dus + qut
            gu = gu.at[:, :, ibu].add(le_uu - le_ul)

            kfft = riccati_solve_bwd_tiled(At, Bmt, Kt, Lt, Pct, gx, gu, nx, nu)
            (ddx_head, ddus, ddx_N,
             ds_xl, ds_xu, ds_ul, ds_uu,
             dl_xl, dl_xu, dl_ul, dl_uu,
             alphat) = riccati_solve_fwd_ftb_tiled(
                At, Bmt, Kt, kfft, r_dyn, r_init,
                it.s_xl, it.s_xu, it.s_ul, it.s_uu,
                it.l_xl, it.l_xu, it.l_ul, it.l_uu,
                rp_xl, rp_xu, rp_ul, rp_uu,
                le_xl, le_xu, le_ul, le_uu,
                idxbx_t, idxbu_t, tau, nx, nu,
            )
            ddxs = jnp.concatenate([ddx_head, ddx_N], axis=1)
            return (
                ddxs, ddus,
                ds_xl, ds_xu, ds_ul, ds_uu,
                dl_xl, dl_xu, dl_ul, dl_uu,
                alphat[:, 0, 0],                    # [G, 8, 128]
            )

        # --- Predictor (affine). ---
        zxl = jnp.zeros_like(it.s_xl)
        zul = jnp.zeros_like(it.s_ul)
        d_aff = newton(jnp.zeros((G, 1, 1, 8, 128), dtype), zxl, zxl, zul, zul)
        a_aff = per_stage(d_aff[-1])

        (_, _, dsa_xl, dsa_xu, dsa_ul, dsa_uu,
         dla_xl, dla_xu, dla_ul, dla_uu, _) = d_aff
        mu_aff = (
            jnp.sum((it.s_xl + a_aff * dsa_xl) * (it.l_xl + a_aff * dla_xl),
                    axis=(1, 2))
            + jnp.sum((it.s_xu + a_aff * dsa_xu) * (it.l_xu + a_aff * dla_xu),
                      axis=(1, 2))
            + jnp.sum((it.s_ul + a_aff * dsa_ul) * (it.l_ul + a_aff * dla_ul),
                      axis=(1, 2))
            + jnp.sum((it.s_uu + a_aff * dsa_uu) * (it.l_uu + a_aff * dla_uu),
                      axis=(1, 2))
        ) / n_con
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-16)) ** 3, 0.0, 1.0)

        # --- Corrector. ---
        d = newton(
            per_stage(sigma * mu),
            dsa_xl * dla_xl,
            dsa_xu * dla_xu,
            dsa_ul * dla_ul,
            dsa_uu * dla_uu,
        )
        alpha = per_stage(d[-1])

        (ddxs, ddus, ds_xl, ds_xu, ds_ul, ds_uu,
         dl_xl, dl_xu, dl_ul, dl_uu, _) = d

        def pos(v):
            return jnp.maximum(v, eps_floor)

        new = _Iterate(
            dxs=it.dxs + alpha * ddxs,
            dus=it.dus + alpha * ddus,
            s_xl=pos(it.s_xl + alpha * ds_xl),
            s_xu=pos(it.s_xu + alpha * ds_xu),
            s_ul=pos(it.s_ul + alpha * ds_ul),
            s_uu=pos(it.s_uu + alpha * ds_uu),
            l_xl=pos(it.l_xl + alpha * dl_xl),
            l_xu=pos(it.l_xu + alpha * dl_xu),
            l_ul=pos(it.l_ul + alpha * dl_ul),
            l_uu=pos(it.l_uu + alpha * dl_uu),
        )
        # Per-lane freeze + non-finite step rejection (same safeguards as the
        # generic path, reduced per lane instead of per problem).
        finite = jnp.ones((G, 8, 128), bool)
        for leaf in jax.tree_util.tree_leaves(new):
            finite = finite & jnp.all(jnp.isfinite(leaf), axis=(1, 2))
        frozen = per_stage((mu < mu_min) | ~finite)
        new = jax.tree_util.tree_map(
            lambda old, upd: jnp.where(frozen, old, upd), it, new
        )
        return new, None

    it_final, _ = jax.lax.scan(ipm_iter, it0, None, length=iters)

    # ---- Untile the solution; KKT via the generic residual under vmap. ----
    dxs = from_tiles(it_final.dxs, (nx,))
    dus = from_tiles(it_final.dus, (nu,))
    lam_xl = from_tiles(it_final.l_xl, (nbx,))
    lam_xu = from_tiles(it_final.l_xu, (nbx,))
    lam_ul = from_tiles(it_final.l_ul, (nbu,))
    lam_uu = from_tiles(it_final.l_uu, (nbu,))
    s_xl = from_tiles(it_final.s_xl, (nbx,))
    s_xu = from_tiles(it_final.s_xu, (nbx,))
    s_ul = from_tiles(it_final.s_ul, (nbu,))
    s_uu = from_tiles(it_final.s_uu, (nbu,))

    it_flat = _Iterate(dxs, dus, s_xl, s_xu, s_ul, s_uu,
                       lam_xl, lam_xu, lam_ul, lam_uu)
    kkt = jax.vmap(
        lambda q, i: _stationarity_inf_norm(q, ibx, ibu, i)
    )(qp, it_flat)
    mu_lane = from_tiles(
        mu_of(it_final)[:, None, None], (1,)
    )[:, 0, 0]

    return IPMSolution(
        dxs=dxs, dus=dus,
        lam_xl=lam_xl, lam_xu=lam_xu, lam_ul=lam_ul, lam_uu=lam_uu,
        mu=mu_lane, kkt_res=kkt,
    )
