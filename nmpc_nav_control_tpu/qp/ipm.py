"""Box-constrained stagewise QP solver: Mehrotra primal-dual interior point.

TPU-native replacement for HPIPM (linked via the acados capsule, reference
``cmake/FindACADOS.cmake:49``; status/KKT read at
``NMPCNavControlDiff.cpp:142-148``).  Same problem class as the reference
configuration: stagewise QP with equality dynamics, diagonal Hessians and box
constraints on subsets of states (stages 1..N incl. terminal) and inputs
(stages 0..N-1) — reference bound setup ``NMPCNavControlDiff.cpp:49-66``.

Algorithm:
  - primal-dual IPM with Mehrotra predictor-corrector; slacks/multipliers are
    eliminated so every Newton step is an equality-constrained LQR with
    *diagonally* barrier-modified stage costs, solved by one Riccati
    factorization + two vector solves (``qp/riccati.py``).
  - FIXED iteration count (static for jit); extra iterations after convergence
    only polish the solution.  No data-dependent control flow anywhere, so the
    whole solve batches under ``vmap`` and shards under ``shard_map``.

QP (delta form around a reference trajectory):
  min  sum_k 1/2 dx'diag(Qd_k)dx + qx_k'dx + 1/2 du'diag(Rd_k)du + qu_k'du
  s.t. dx_0 = dx0
       dx_{k+1} = A_k dx_k + B_k du_k + c_k
       lbx_k <= sel_x(dx_k) <= ubx_k   (k = 1..N; bounds already in delta form)
       lbu_k <= sel_u(du_k) <= ubu_k   (k = 0..N-1)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nmpc_nav_control_tpu.qp.riccati import (
    _highest_precision,
    riccati_factor_v,
    riccati_solve_v,
)

__all__ = ["BoxQP", "IPMSolution", "solve_box_qp"]


class BoxQP(NamedTuple):
    """Stagewise box-QP data (delta form). Shapes given for a single problem;
    every leaf may carry leading batch axes under vmap."""

    A: jnp.ndarray     # [N, nx, nx]
    B: jnp.ndarray     # [N, nx, nu]
    c: jnp.ndarray     # [N, nx]    dynamics affine terms / residuals
    Qd: jnp.ndarray    # [N+1, nx]  diagonal state Hessians (incl. terminal)
    qx: jnp.ndarray    # [N+1, nx]  state gradients
    Rd: jnp.ndarray    # [N, nu]
    qu: jnp.ndarray    # [N, nu]
    dx0: jnp.ndarray   # [nx]       pinned initial delta state
    lbx: jnp.ndarray   # [N, nbx]   bounds on dx_k[idxbx], k = 1..N
    ubx: jnp.ndarray   # [N, nbx]
    lbu: jnp.ndarray   # [N, nbu]   bounds on du_k[idxbu], k = 0..N-1
    ubu: jnp.ndarray   # [N, nbu]


class IPMSolution(NamedTuple):
    dxs: jnp.ndarray       # [N+1, nx]
    dus: jnp.ndarray       # [N, nu]
    lam_xl: jnp.ndarray    # [N, nbx] multipliers, x lower bounds (stages 1..N)
    lam_xu: jnp.ndarray    # [N, nbx]
    lam_ul: jnp.ndarray    # [N, nbu] multipliers, u bounds (stages 0..N-1)
    lam_uu: jnp.ndarray    # [N, nbu]
    mu: jnp.ndarray        # [] final complementarity measure
    kkt_res: jnp.ndarray   # [] inf-norm of the stationarity residual


class _Iterate(NamedTuple):
    dxs: jnp.ndarray
    dus: jnp.ndarray
    s_xl: jnp.ndarray
    s_xu: jnp.ndarray
    s_ul: jnp.ndarray
    s_uu: jnp.ndarray
    l_xl: jnp.ndarray
    l_xu: jnp.ndarray
    l_ul: jnp.ndarray
    l_uu: jnp.ndarray


def _gaps(qp: BoxQP, idxbx, idxbu, dxs, dus):
    """Distances to the four bound groups (positive = strictly feasible)."""
    zx = dxs[1:, idxbx]                      # [N, nbx]
    zu = dus[:, idxbu]                       # [N, nbu]
    return zx - qp.lbx, qp.ubx - zx, zu - qp.lbu, qp.ubu - zu


def _ftb_alpha(v, dv, tau):
    """Fraction-to-boundary step for v + alpha*dv >= 0 given v > 0."""
    ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    return jnp.minimum(1.0, tau * jnp.min(ratio))


def solve_box_qp(
    qp: BoxQP,
    idxbx,
    idxbu,
    iters: int = 12,
    tau: float = 0.995,
    mu0: float = 1.0,
    s_min: float = 0.3,
    reg: float = 1e-8,
    mu_min: float | None = None,
    stage_parallel: bool = False,
    spars=None,
) -> IPMSolution:
    """Solve the stagewise box QP. ``idxbx``/``idxbu`` are static index tuples.

    ``spars``: optional static (A_pattern, B_pattern) structural-nonzero
    masks exploited by the fused TPU kernels; must OVER-approximate the true
    nonzeros of qp.A/qp.B.  Ignored on the generic (non-tiled) path.

    Fixed ``iters`` Mehrotra iterations; one Riccati factorization and two
    vector solves per iteration.  Under a full scenario-batch ``vmap`` on TPU
    this dispatches to the tiled-layout batched implementation
    (``qp/ipm_tiled.py``); everywhere else the per-problem path below runs
    (vmapped when batched).

    ``stage_parallel=True`` runs every Newton solve through the log-depth
    associative-scan Riccati (``qp/parallel_riccati.plqr_solve``) instead of
    the serial factor/solve split: O(log N) depth, and the stage axis of the
    QP arrays can be sharded over a mesh (ICI collectives in the scan) for
    horizons too long for one core — the stage-parallel axis of SURVEY.md
    §2.4 applied to the full box-constrained solve, not just the LQR.
    """
    solver = _make_solver(
        tuple(int(i) for i in idxbx),
        tuple(int(i) for i in idxbu),
        int(iters), float(tau), float(mu0), float(s_min), float(reg),
        None if mu_min is None else float(mu_min),
        bool(stage_parallel),
        spars,
    )
    return solver(qp)


def _make_solver(idxbx, idxbu, iters, tau, mu0, s_min, reg, mu_min,
                 stage_parallel=False, spars=None):
    import functools

    key = (idxbx, idxbu, iters, tau, mu0, s_min, reg, mu_min, stage_parallel,
           spars)
    cached = _SOLVER_CACHE.get(key)
    if cached is not None:
        return cached

    serial = functools.partial(
        _solve_box_qp_serial,
        idxbx=idxbx, idxbu=idxbu, iters=iters, tau=tau, mu0=mu0,
        s_min=s_min, reg=reg, mu_min=mu_min, stage_parallel=stage_parallel,
    )

    @jax.custom_batching.custom_vmap
    def solve(qp: BoxQP) -> IPMSolution:
        return serial(qp)

    @solve.def_vmap
    def _rule(axis_size, in_batched, qp):
        from nmpc_nav_control_tpu.ops.pallas_riccati import BT

        out_batched = IPMSolution(*([True] * len(IPMSolution._fields)))
        qp_batched = in_batched[0]
        nx, nu = qp.B.shape[-2], qp.B.shape[-1]
        # Small/ragged batches are padded up to a whole 1024-lane batch tile
        # by edge-replicating the last problem: a single 40 Hz robot (the
        # reference's actual workload, ``NMPCNavControlROS.cpp:36-41``) rides
        # the same fused kernels as the 4096-scenario fleet.
        padded = -(-axis_size // BT) * BT
        if not stage_parallel and _tiled_ipm_ok(nx, nu, padded, qp.A.dtype):
            from nmpc_nav_control_tpu.qp.ipm_tiled import solve_box_qp_tiled

            # Broadcast any lane-constant leaves (e.g. an unbatched Rd when
            # the cost diagonals are closed over): the tiled layout wants a
            # full batch axis on everything.
            qp_full = jax.tree_util.tree_map(
                lambda x, b: x if b else jnp.broadcast_to(
                    x, (axis_size,) + x.shape
                ),
                qp, qp_batched,
            )
            if padded != axis_size:
                qp_full = jax.tree_util.tree_map(
                    lambda x: jnp.pad(
                        x,
                        [(0, padded - axis_size)] + [(0, 0)] * (x.ndim - 1),
                        mode="edge",
                    ),
                    qp_full,
                )
            sol = solve_box_qp_tiled(
                qp_full, idxbx, idxbu, iters=iters, tau=tau, mu0=mu0,
                s_min=s_min, reg=reg, mu_min=mu_min, spars=spars,
            )
            if padded != axis_size:
                sol = jax.tree_util.tree_map(lambda x: x[:axis_size], sol)
            return sol, out_batched
        axes = jax.tree_util.tree_map(lambda b: 0 if b else None, qp_batched)
        out = jax.vmap(serial, in_axes=(axes,))(qp)
        return out, out_batched

    _SOLVER_CACHE[key] = solve
    return solve


_SOLVER_CACHE: dict = {}


def _tiled_ipm_ok(nx: int, nu: int, batch: int, dtype) -> bool:
    import os

    if os.environ.get("NMPC_TPU_TILED_IPM", "1") != "1":
        return False
    from nmpc_nav_control_tpu.qp.riccati import _pallas_ok

    return _pallas_ok(nx, nu, batch, dtype)


@_highest_precision
def _solve_box_qp_serial(
    qp: BoxQP,
    idxbx,
    idxbu,
    iters: int = 12,
    tau: float = 0.995,
    mu0: float = 1.0,
    s_min: float = 0.3,
    reg: float = 1e-8,
    mu_min: float | None = None,
    stage_parallel: bool = False,
) -> IPMSolution:
    """Single-problem reference implementation (see module docstring)."""
    idxbx = jnp.asarray(idxbx)
    idxbu = jnp.asarray(idxbu)
    N, nx, nu = qp.B.shape
    dtype = qp.A.dtype
    if mu_min is None:
        # Freeze threshold: with fixed iteration counts, a converged lane must
        # stop stepping before its slacks underflow the dtype.
        mu_min = 1e-14 if dtype == jnp.float64 else 1e-7

    dxs0 = jnp.zeros((N + 1, nx), dtype)
    dus0 = jnp.zeros((N, nu), dtype)
    gxl, gxu, gul, guu = _gaps(qp, idxbx, idxbu, dxs0, dus0)

    def init_sl(gap):
        s = jnp.maximum(gap, s_min)
        lam = jnp.maximum(mu0 / s, s_min)
        return s, lam

    s_xl, l_xl = init_sl(gxl)
    s_xu, l_xu = init_sl(gxu)
    s_ul, l_ul = init_sl(gul)
    s_uu, l_uu = init_sl(guu)
    it0 = _Iterate(dxs0, dus0, s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu)

    # f32 robustness floors: fraction-to-boundary keeps s, lam positive in
    # exact arithmetic, but rounding near active bounds can push them to 0
    # or below, and the barrier ratios lam/s then overflow/NaN.  HPIPM-style
    # eps clamps keep every division finite without affecting converged
    # accuracy (the floors are far below solution tolerances).
    eps_floor = 1e-11 if dtype == jnp.float64 else 1e-9
    d_cap = 1e14 if dtype == jnp.float64 else 1e10

    n_con = 2 * N * (idxbx.shape[0] + idxbu.shape[0])

    def mu_of(it: _Iterate):
        total = (
            jnp.sum(it.s_xl * it.l_xl)
            + jnp.sum(it.s_xu * it.l_xu)
            + jnp.sum(it.s_ul * it.l_ul)
            + jnp.sum(it.s_uu * it.l_uu)
        )
        return total / n_con

    def ipm_iter(it: _Iterate, _):
        gxl, gxu, gul, guu = _gaps(qp, idxbx, idxbu, it.dxs, it.dus)
        # Primal inequality residuals r_p = gap - s (zero when slacks track gaps).
        rp_xl, rp_xu = gxl - it.s_xl, gxu - it.s_xu
        rp_ul, rp_uu = gul - it.s_ul, guu - it.s_uu

        mu = mu_of(it)

        # Barrier-modified diagonals: D = lam_l/s_l + lam_u/s_u on bound
        # indices, capped for f32 safety.
        Dx = jnp.minimum(it.l_xl / it.s_xl + it.l_xu / it.s_xu, d_cap)
        Du = jnp.minimum(it.l_ul / it.s_ul + it.l_uu / it.s_uu, d_cap)
        Qbar = qp.Qd.at[1:, idxbx].add(Dx)
        # reg folds into the R diagonal (identical to adding it to Quu).
        Rbar = (qp.Rd + reg).at[:, idxbu].add(Du)

        if stage_parallel:
            factors = None  # each Newton solve runs the log-depth scan
        else:
            factors = riccati_factor_v(qp.A, qp.B, Qbar, Rbar)

        # Equality residuals at the current iterate.
        r_dyn = (
            jnp.einsum("kij,kj->ki", qp.A, it.dxs[:-1])
            + jnp.einsum("kij,kj->ki", qp.B, it.dus)
            + qp.c
            - it.dxs[1:]
        )
        r_init = qp.dx0 - it.dxs[0]

        def newton(sigma_mu, corr_xl, corr_xu, corr_ul, corr_uu):
            """One Newton solve; returns deltas for all variables."""

            def lam_eff(lam, s, rp, corr):
                return (sigma_mu - corr) / s - (lam / s) * rp

            le_xl = lam_eff(it.l_xl, it.s_xl, rp_xl, corr_xl)
            le_xu = lam_eff(it.l_xu, it.s_xu, rp_xu, corr_xu)
            le_ul = lam_eff(it.l_ul, it.s_ul, rp_ul, corr_ul)
            le_uu = lam_eff(it.l_uu, it.s_uu, rp_uu, corr_uu)

            # Stationarity residual (gradient) with effective multipliers.
            gx = qp.Qd * it.dxs + qp.qx
            gx = gx.at[1:, idxbx].add(le_xu - le_xl)
            gu = qp.Rd * it.dus + qp.qu
            gu = gu.at[:, idxbu].add(le_uu - le_ul)

            if stage_parallel:
                from nmpc_nav_control_tpu.qp.parallel_riccati import plqr_solve

                ddxs, ddus = plqr_solve(
                    qp.A, qp.B, Qbar, Rbar, gx, gu, r_dyn, r_init
                )
            else:
                ddxs, ddus = riccati_solve_v(
                    factors, qp.A, qp.B, gx, gu, r_dyn, r_init
                )
            dzx = ddxs[1:, idxbx]
            dzu = ddus[:, idxbu]

            ds_xl = rp_xl + dzx
            ds_xu = rp_xu - dzx
            ds_ul = rp_ul + dzu
            ds_uu = rp_uu - dzu
            dl_xl = -(it.l_xl / it.s_xl) * dzx + le_xl - it.l_xl
            dl_xu = (it.l_xu / it.s_xu) * dzx + le_xu - it.l_xu
            dl_ul = -(it.l_ul / it.s_ul) * dzu + le_ul - it.l_ul
            dl_uu = (it.l_uu / it.s_uu) * dzu + le_uu - it.l_uu
            return (
                ddxs, ddus,
                ds_xl, ds_xu, ds_ul, ds_uu,
                dl_xl, dl_xu, dl_ul, dl_uu,
            )

        def step_len(d):
            (_, _, ds_xl, ds_xu, ds_ul, ds_uu, dl_xl, dl_xu, dl_ul, dl_uu) = d
            alphas = jnp.stack(
                [
                    _ftb_alpha(it.s_xl, ds_xl, tau),
                    _ftb_alpha(it.s_xu, ds_xu, tau),
                    _ftb_alpha(it.s_ul, ds_ul, tau),
                    _ftb_alpha(it.s_uu, ds_uu, tau),
                    _ftb_alpha(it.l_xl, dl_xl, tau),
                    _ftb_alpha(it.l_xu, dl_xu, tau),
                    _ftb_alpha(it.l_ul, dl_ul, tau),
                    _ftb_alpha(it.l_uu, dl_uu, tau),
                ]
            )
            return jnp.min(alphas)

        # --- Predictor (affine) pass: sigma = 0, no corrector. ---
        zero = jnp.zeros((), dtype)
        zxl = jnp.zeros_like(it.s_xl)
        zul = jnp.zeros_like(it.s_ul)
        d_aff = newton(zero, zxl, zxl, zul, zul)
        a_aff = step_len(d_aff)

        (_, _, dsa_xl, dsa_xu, dsa_ul, dsa_uu, dla_xl, dla_xu, dla_ul, dla_uu) = d_aff
        mu_aff = (
            jnp.sum((it.s_xl + a_aff * dsa_xl) * (it.l_xl + a_aff * dla_xl))
            + jnp.sum((it.s_xu + a_aff * dsa_xu) * (it.l_xu + a_aff * dla_xu))
            + jnp.sum((it.s_ul + a_aff * dsa_ul) * (it.l_ul + a_aff * dla_ul))
            + jnp.sum((it.s_uu + a_aff * dsa_uu) * (it.l_uu + a_aff * dla_uu))
        ) / n_con
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-16)) ** 3, 0.0, 1.0)

        # --- Corrector pass. ---
        # The corrector products are scaled by a_aff — damped toward the
        # step actually achievable, not the full (possibly blocked) affine
        # direction.  With the unscaled products, instances whose warm start
        # touches a bound exactly (gap = 0 -> s_min-clamped slacks; routine
        # in closed loop whenever a tick saturates u) make the affine step
        # tiny (a_aff ~ 0.04) while ds_aff*dl_aff stays O(1): the corrector
        # then overshoots, mu oscillates around mu0 forever, and the
        # returned point is a barrier center instead of the optimum (found
        # by the NumPy f64 RTI oracle, tests/oracle/numpy_rti.py; the golden
        # closed-loop parity test pins the fix).  When the affine step is
        # accepted (a_aff ~ 1) the scale is ~1 and classic Mehrotra behavior
        # (superlinear tail) is unchanged.  Linear damping measured fastest
        # across the saved pathological instances (quadratic a_aff^2 is
        # over-conservative: +4-5 iterations to the same accuracy).
        corr_scale = a_aff
        d = newton(
            sigma * mu,
            corr_scale * dsa_xl * dla_xl,
            corr_scale * dsa_xu * dla_xu,
            corr_scale * dsa_ul * dla_ul,
            corr_scale * dsa_uu * dla_uu,
        )
        alpha = step_len(d)

        (ddxs, ddus, ds_xl, ds_xu, ds_ul, ds_uu, dl_xl, dl_xu, dl_ul, dl_uu) = d

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
        # Converged lanes stop stepping (prevents slack underflow when the
        # fixed iteration budget exceeds what this lane needed), and
        # non-finite steps are rejected outright (f32 cancellation in the
        # extreme-barrier Riccati recursion can destroy a step near
        # convergence; keeping the last good iterate is the standard
        # robust-IPM safeguard).
        step_bad = ~jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(leaf))
                       for leaf in jax.tree_util.tree_leaves(new)])
        )
        frozen = (mu < mu_min) | step_bad
        new = jax.tree_util.tree_map(
            lambda old, upd: jnp.where(frozen, old, upd), it, new
        )
        return new, None

    it_final, _ = jax.lax.scan(ipm_iter, it0, None, length=iters)

    kkt = _stationarity_inf_norm(qp, idxbx, idxbu, it_final)
    return IPMSolution(
        dxs=it_final.dxs,
        dus=it_final.dus,
        lam_xl=it_final.l_xl,
        lam_xu=it_final.l_xu,
        lam_ul=it_final.l_ul,
        lam_uu=it_final.l_uu,
        mu=mu_of(it_final),
        kkt_res=kkt,
    )


@_highest_precision
def _stationarity_inf_norm(qp: BoxQP, idxbx, idxbu, it: _Iterate):
    """Inf-norm KKT stationarity residual (the ``inf_norm_res`` analog the
    reference reads at ``NMPCNavControlDiff.cpp:146``).

    Costates are defined by the x-stationarity recursion; the reported
    residual is the u-stationarity (plus the final-stage definition error is
    zero by construction).
    """
    # Costate recursion: nu_N = Qd_N dx_N + qx_N + sel'(lam_xu - lam_xl)_N
    gx = qp.Qd * it.dxs + qp.qx
    gx = gx.at[1:, idxbx].add(it.l_xu - it.l_xl)

    def bwd(nu_next, inp):
        A_k, B_k, gx_k, gu_k = inp
        ru = gu_k + B_k.T @ nu_next
        nu_k = gx_k + A_k.T @ nu_next
        return nu_k, ru

    gu = qp.Rd * it.dus + qp.qu
    gu = gu.at[:, idxbu].add(it.l_uu - it.l_ul)
    _, rus = jax.lax.scan(bwd, gx[-1], (qp.A, qp.B, gx[:-1], gu), reverse=True)
    return jnp.max(jnp.abs(rus))
