"""Batched Mehrotra box-IPM in the Pallas tile layout.

Numerically identical algorithm to ``qp/ipm.py`` (same predictor-corrector,
fraction-to-boundary, freeze and f32 guards — keep the two in sync), but
engineered for throughput on TPU.  Each IPM iteration is FOUR fused Pallas
sweeps (``ops/pallas_ipm.py``) and nothing else touches the per-stage
tensors:

  backward  : Riccati factorization + dynamics residual + bound gaps +
              barrier diagonals + the affine vector recursion + the mu
              reduction (one sweep);
  forward   : affine rollout + fraction-to-boundary + Mehrotra corrector
              products + the mu_aff polynomial coefficients;
  backward  : corrector vector recursion (gradients in-kernel);
  forward   : corrector rollout + slack/multiplier deltas + step length +
              per-lane finiteness flag.

Between sweeps only per-lane [G, 8, 128] scalars are combined (sigma,
alpha); the iterate update is one fused XLA elementwise pass.  Every
per-stage quantity lives in the tiled layout [G, N(+1), entries, 8, 128]
(G = batch/1024 tile groups) for the entire solve: inputs are transposed
ONCE, outputs ONCE.  The stage Jacobians A/B are packed to their structural
nonzeros (``spars``) — a large FLOP and bandwidth cut for the wheeled-robot
models whose Jacobians are mostly structural zeros.

Replaces HPIPM like ``qp/ipm.py`` does; selected automatically under a full
scenario-batch ``vmap`` on TPU via the ``custom_vmap`` rule in ``qp/ipm.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from nmpc_nav_control_tpu.ops.pallas_ipm import (
    dense_sparsity,
    ipm_bwd_corr,
    ipm_bwd_fused,
    ipm_fwd_affine,
    ipm_fwd_corr,
    ipm_kkt_fused,
    pack_sparse,
)
from nmpc_nav_control_tpu.ops.pallas_riccati import from_tiles, to_tiles
from nmpc_nav_control_tpu.qp.riccati import _highest_precision

__all__ = ["solve_box_qp_tiled"]


@_highest_precision
def solve_box_qp_tiled(
    qp,  # BoxQP with leading batch axis on every leaf
    idxbx,
    idxbu,
    iters: int = 12,
    tau: float = 0.995,
    mu0: float = 1.0,
    s_min: float = 0.3,
    reg: float = 1e-8,
    mu_min: float | None = None,
    spars=None,
    tiled_abc=None,
):
    """Batched solve; returns an ``IPMSolution`` with leading batch axes.

    Requirements (checked by the dispatch rule): f32, batch % 1024 == 0.
    ``spars``: optional static ``(A_pattern, B_pattern)`` of structural
    nonzeros (nested bool tuples) — e.g. from
    ``ocp.sparsity.detect_sparsity``; ``None`` means dense.
    ``tiled_abc``: optional pre-tiled ``(At, Bmt, ct)`` in the kernel
    layout [G, N, e, 8, 128] with A/B already packed to ``spars`` — e.g.
    from ``ops.tiled_linearize.linearize_packed_tiled``; ``qp.A/B/c`` are
    ignored (may be None) and the dense Jacobians never materialize.
    """
    from nmpc_nav_control_tpu.qp.ipm import IPMSolution, _Iterate

    idxbx_t = tuple(int(i) for i in idxbx)
    idxbu_t = tuple(int(i) for i in idxbu)
    N, nx = qp.Qd.shape[1] - 1, qp.Qd.shape[2]
    nu = qp.Rd.shape[-1]
    nbx, nbu = len(idxbx_t), len(idxbu_t)
    dtype = qp.Qd.dtype
    if mu_min is None:
        mu_min = 1e-7  # f32 only on this path
    if spars is None:
        asp, bsp = dense_sparsity(nx, nu)
    else:
        asp, bsp = spars

    # ---- One-time tiling of the QP data (A/B packed to nonzeros). ----
    if tiled_abc is None:
        At = to_tiles(pack_sparse(qp.A, asp), (len(_flat(asp)),))
        Bmt = to_tiles(pack_sparse(qp.B, bsp), (len(_flat(bsp)),))
        ct0 = to_tiles(qp.c, (nx,))
    else:
        At, Bmt, ct0 = tiled_abc
    # Optional bf16 streaming of the stage Jacobians: halves the A/B HBM
    # bytes of every sweep; entries are widened back to f32 at load inside
    # the kernels (ops/pallas_ipm._unpack_entries), so only the STORAGE of
    # A/B loses precision (~3 decimal digits on O(1) entries).  Gated by
    # the golden-trajectory parity suite (tests/test_rti_oracle.py with
    # NMPC_TPU_BF16_STREAM=1); measured verdict in PERFORMANCE.md.
    import os
    if os.environ.get("NMPC_TPU_BF16_STREAM", "0") == "1":
        At = At.astype(jnp.bfloat16)
        Bmt = Bmt.astype(jnp.bfloat16)
    Qdt = to_tiles(qp.Qd, (nx,))                # [G, N+1, nx, ...]
    qxt = to_tiles(qp.qx, (nx,))
    Rdt = to_tiles(qp.Rd, (nu,))
    qut = to_tiles(qp.qu, (nu,))
    dx0t = to_tiles(qp.dx0[:, None], (nx,))     # [G, 1, nx, ...]
    lbxt = to_tiles(qp.lbx, (nbx,))
    ubxt = to_tiles(qp.ubx, (nbx,))
    lbut = to_tiles(qp.lbu, (nbu,))
    ubut = to_tiles(qp.ubu, (nbu,))

    G = ct0.shape[0]
    ibx = jnp.asarray(idxbx_t)
    ibu = jnp.asarray(idxbu_t)

    eps_floor = jnp.asarray(1e-9, dtype)
    d_cap = 1e10
    n_con = 2 * N * (nbx + nbu)

    # ---- Initial iterate (all tiled). ----
    dxt0 = jnp.zeros((G, N + 1, nx, 8, 128), dtype)
    dut0 = jnp.zeros((G, N, nu, 8, 128), dtype)
    gxl = dxt0[:, 1:, ibx] - lbxt
    gxu = ubxt - dxt0[:, 1:, ibx]
    gul = dut0[:, :, ibu] - lbut
    guu = ubut - dut0[:, :, ibu]

    def init_sl(gap):
        s = jnp.maximum(gap, s_min)
        lam = jnp.maximum(mu0 / s, s_min)
        return s, lam

    s_xl, l_xl = init_sl(gxl)
    s_xu, l_xu = init_sl(gxu)
    s_ul, l_ul = init_sl(gul)
    s_uu, l_uu = init_sl(guu)
    it0 = _Iterate(dxt0, dut0, s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu)

    def per_stage(lane):                           # [G, 8, 128] -> broadcastable
        return lane[:, None, None]

    def ipm_iter(it, _):
        # --- Sweep 1: factor + residuals + affine backward + mu. ---
        (Kt, Lt, Pct, rdynt, kff_aff,
         rp_xl, rp_xu, rp_ul, rp_uu, musumt) = ipm_bwd_fused(
            At, Bmt, Qdt, Rdt, qxt, qut, ct0, it.dxs, it.dus,
            it.s_xl, it.s_xu, it.s_ul, it.s_uu,
            it.l_xl, it.l_xu, it.l_ul, it.l_uu,
            lbxt, ubxt, lbut, ubut,
            idxbx_t, idxbu_t, nx, nu,
            reg=reg, d_cap=d_cap, asp=asp, bsp=bsp,
        )
        musum = musumt[:, 0, 0]                    # [G, 8, 128]
        mu = musum / n_con
        r_init = dx0t - it.dxs[:, :1]

        # --- Sweep 2: affine forward (corrector products + mu_aff coeffs). ---
        (corr_xl, corr_xu, corr_ul, corr_uu, a_afft, c12t) = ipm_fwd_affine(
            At, Bmt, Kt, kff_aff, rdynt, r_init,
            it.s_xl, it.s_xu, it.s_ul, it.s_uu,
            it.l_xl, it.l_xu, it.l_ul, it.l_uu,
            rp_xl, rp_xu, rp_ul, rp_uu,
            idxbx_t, idxbu_t, tau, nx, nu, asp=asp, bsp=bsp,
        )
        a_aff = a_afft[:, 0, 0]
        mu_aff = (musum + a_aff * c12t[:, 0, 0]
                  + a_aff * a_aff * c12t[:, 0, 1]) / n_con
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-16)) ** 3, 0.0, 1.0)
        sigma_mu = (sigma * mu)[:, None, None]     # [G, 1, 1, 8, 128]
        # Scale the Mehrotra corrector by a_aff (damped toward the step
        # actually achievable) — keep in sync with qp/ipm.py, which
        # documents the cycling failure this prevents on warm starts that
        # touch a bound exactly.
        corr_sc = a_aff[:, None, None]             # [G, 1, 1, 8, 128]
        corr_xl = corr_sc * corr_xl
        corr_xu = corr_sc * corr_xu
        corr_ul = corr_sc * corr_ul
        corr_uu = corr_sc * corr_uu

        # --- Sweep 3: corrector backward. ---
        kff_c = ipm_bwd_corr(
            At, Bmt, Kt, Lt, Pct, Qdt, qxt, it.dxs, Rdt, qut, it.dus,
            it.s_xl, it.s_xu, it.s_ul, it.s_uu,
            it.l_xl, it.l_xu, it.l_ul, it.l_uu,
            rp_xl, rp_xu, rp_ul, rp_uu,
            corr_xl, corr_xu, corr_ul, corr_uu, sigma_mu,
            idxbx_t, idxbu_t, nx, nu, asp=asp, bsp=bsp,
        )

        # --- Sweep 4: corrector forward (deltas + alpha + finiteness). ---
        (ddx_head, ddus, ddx_N,
         ds_xl, ds_xu, ds_ul, ds_uu,
         dl_xl, dl_xu, dl_ul, dl_uu,
         alphat, finitet) = ipm_fwd_corr(
            At, Bmt, Kt, kff_c, rdynt, r_init,
            it.s_xl, it.s_xu, it.s_ul, it.s_uu,
            it.l_xl, it.l_xu, it.l_ul, it.l_uu,
            rp_xl, rp_xu, rp_ul, rp_uu,
            corr_xl, corr_xu, corr_ul, corr_uu, sigma_mu,
            idxbx_t, idxbu_t, tau, nx, nu, asp=asp, bsp=bsp,
        )
        ddxs = jnp.concatenate([ddx_head, ddx_N], axis=1)
        alpha = per_stage(alphat[:, 0, 0])

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
        # generic path).  The finiteness flag is accumulated in-kernel over
        # the full corrector delta set; alpha is finite whenever the deltas
        # are (ratio guards), so delta-finiteness implies iterate-finiteness.
        frozen = per_stage((mu < mu_min) | (finitet[:, 0, 0] < 0.5))
        new = jax.tree_util.tree_map(
            lambda old, upd: jnp.where(frozen, old, upd), it, new
        )
        return new, None

    it_final, _ = jax.lax.scan(ipm_iter, it0, None, length=iters)

    # ---- KKT + complementarity on the TILED iterate (one fused backward
    # sweep per solve; the former vmapped XLA costate scan was N sequential
    # tiny batched matvecs whose launch overhead dominated ~25% of the
    # control tick), then untile the solution. ----
    kkt_t, musum_t = ipm_kkt_fused(
        At, Bmt, Qdt, qxt, it_final.dxs, Rdt, qut, it_final.dus,
        it_final.l_xl, it_final.l_xu, it_final.l_ul, it_final.l_uu,
        it_final.s_xl, it_final.s_xu, it_final.s_ul, it_final.s_uu,
        idxbx_t, idxbu_t, nx, nu, asp=asp, bsp=bsp,
    )
    kkt = from_tiles(kkt_t, (1,))[:, 0, 0]
    mu_lane = from_tiles(musum_t, (1,))[:, 0, 0] / n_con

    dxs = from_tiles(it_final.dxs, (nx,))
    dus = from_tiles(it_final.dus, (nu,))
    lam_xl = from_tiles(it_final.l_xl, (nbx,))
    lam_xu = from_tiles(it_final.l_xu, (nbx,))
    lam_ul = from_tiles(it_final.l_ul, (nbu,))
    lam_uu = from_tiles(it_final.l_uu, (nbu,))

    return IPMSolution(
        dxs=dxs, dus=dus,
        lam_xl=lam_xl, lam_xu=lam_xu, lam_ul=lam_ul, lam_uu=lam_uu,
        mu=mu_lane, kkt_res=kkt,
    )


def _flat(sp):
    return [v for row in sp for v in row if v]
