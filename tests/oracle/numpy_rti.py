"""Independent reference-RTI oracle: pure NumPy float64, JAX-free.

This is the cross-check implementation the reference itself models with
``scripts/test_scripts/casadi_sim_diff.py:35-70`` (an independent CasADi
Opti + IPOPT transcription with warm starting): a SECOND implementation of
the warm-started real-time-iteration sequence of
``NMPCNavControl{Diff,Omni4,Tric}::run`` (``NMPCNavControlDiff.cpp:82-175``),
sharing NO code with the production JAX/Pallas stack:

  - dynamics: NumPy right-hand sides (complex-step differentiable);
  - sensitivities: complex-step derivatives through the RK4 step (machine
    precision, no autodiff framework);
  - QP: dense CONDENSED formulation (states eliminated through the
    dynamics) solved by OSQP-style ADMM + exact active-set KKT polish — a
    completely different algorithm family and linear-algebra path from the
    production Riccati-factorized interior-point method;
  - float64 throughout (acados/HPIPM run f64; the production TPU path is f32).

Behavioral contracts replicated (each tagged with its reference source):
  * x0 pinning as stage-0 equality            NMPCNavControlDiff.cpp:96-101
  * yref theta-unwrap chain seeded at the measured robot heading, tail
    padding with the last valid pose          NMPCNavControlDiff.cpp:104-118
  * diff-only adaptive terminal weight x100   NMPCNavControlDiff.cpp:126-139
  * ONE warm-started Gauss-Newton iteration per tick (SQP_RTI,
    scripts/diff/generate_c_code.py:74)
  * post-solve reference integration ref += u0*dt and stage-1 state carry
    with the integrated refs                  NMPCNavControlDiff.cpp:155-173
  * per-geometry measurement packing / command maps
                                              NMPCNavControlDiff.cpp:82-94,155-165
  * tricycle as-generated sin/cos model bug (``bug_compat``)
                                              scripts/tric/tric_amr_model.py:45

Used by ``tools/gen_goldens.py`` to produce the committed golden
u-trajectories in ``tests/goldens/`` and by ``tests/test_rti_oracle.py`` to
assert the f32 production path tracks them.
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np
import scipy.linalg

__all__ = [
    "OracleController",
    "Scenario",
    "closed_loop",
    "make_scenario",
    "plant_step",
    "reference_window",
]

# ---------------------------------------------------------------------------
# Models (NumPy, complex-step safe). State/input orderings per the reference
# headers (NMPCNavControlDiff.h:19-30, NMPCNavControlOmni4.h:19-30,
# NMPCNavControlTric.h:19-31).
# ---------------------------------------------------------------------------


def f_diff(x, u, p):
    dist_b, tau_v = p[0], p[1]
    theta, vl, vr = x[2], x[3], x[4]
    v = 0.5 * (vr + vl)
    return np.array(
        [
            v * np.cos(theta),
            v * np.sin(theta),
            (vr - vl) / dist_b,
            (x[5] - vl) / tau_v,
            (x[6] - vr) / tau_v,
            u[0],
            u[1],
        ]
    )


def f_omni4(x, u, p):
    l12, tau_v = p[0], p[1]
    theta = x[2]
    v1, v2, v3, v4 = x[3], x[4], x[5], x[6]
    v = (v1 - v2 + v3 - v4) / 4.0
    vn = (-v1 - v2 + v3 + v4) / 4.0
    w = -(v1 + v2 + v3 + v4) / (2.0 * l12)
    ct, st = np.cos(theta), np.sin(theta)
    return np.concatenate(
        [
            np.array([v * ct - vn * st, v * st + vn * ct, w]),
            (x[7:11] - x[3:7]) / tau_v,
            np.asarray(u),
        ]
    )


def _f_tric(x, u, p, cos_alpha_fn):
    dist_d, tau_v, tau_a = p[0], p[1], p[2]
    theta, v, alpha = x[2], x[3], x[4]
    ca = cos_alpha_fn(alpha)
    return np.array(
        [
            v * np.cos(theta) * ca,
            v * np.sin(theta) * ca,
            v / dist_d * np.sin(alpha),
            (x[5] - v) / tau_v,
            (x[6] - alpha) / tau_a,
            u[0],
            u[1],
        ]
    )


def f_tric(x, u, p):
    return _f_tric(x, u, p, np.cos)


def f_tric_bug(x, u, p):
    """As-generated reference model: sin(alpha) in the position rates
    (``scripts/tric/tric_amr_model.py:45``)."""
    return _f_tric(x, u, p, np.sin)


_GEOM = {
    # geometry -> (f, nx, nu, idxbx, idxbu)
    "diff": (f_diff, 7, 2, (5, 6), (0, 1)),
    "omni4": (f_omni4, 11, 4, (7, 8, 9, 10), (0, 1, 2, 3)),
    "tric": (f_tric, 7, 2, (5, 6), (0, 1)),
    "tric_bug": (f_tric_bug, 7, 2, (5, 6), (0, 1)),
}


def rk4(f, x, u, p, dt):
    """One classical RK4 step (the acados ERK discretization,
    ``scripts/diff/generate_c_code.py:73``)."""
    k1 = f(x, u, p)
    k2 = f(x + 0.5 * dt * k1, u, p)
    k3 = f(x + 0.5 * dt * k2, u, p)
    k4 = f(x + dt * k3, u, p)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def _rk4_jacobians(f, x, u, p, dt):
    """A = dF/dx, B = dF/du of the RK4 step via complex-step differentiation
    (exact to f64 rounding; independent of any autodiff framework)."""
    nx, nu = len(x), len(u)
    h = 1e-100
    A = np.empty((nx, nx))
    B = np.empty((nx, nu))
    xc = x.astype(complex)
    uc = u.astype(complex)
    for i in range(nx):
        xp = xc.copy()
        xp[i] += 1j * h
        A[:, i] = rk4(f, xp, uc, p, dt).imag / h
    for i in range(nu):
        up = uc.copy()
        up[i] += 1j * h
        B[:, i] = rk4(f, xc, up, p, dt).imag / h
    return A, B


# ---------------------------------------------------------------------------
# Angle helpers (reference include/nmpc_nav_control/utils.h,
# NMPCNavControl.cpp:25-31).
# ---------------------------------------------------------------------------


def unwrap_angle(current, previous):
    delta = current - previous
    if delta > math.pi:
        return current - 2.0 * math.pi
    if delta < -math.pi:
        return current + 2.0 * math.pi
    return current


def build_yref(N, robot_theta, traj, n_valid):
    """Unwrap-and-pad reference build (``NMPCNavControlDiff.cpp:104-118``)."""
    yref = np.zeros((N + 1, 3))
    prev_theta = float(robot_theta)
    last = np.zeros(3)
    for i in range(N + 1):
        if i < n_valid:
            th = unwrap_angle(float(traj[i, 2]), prev_theta)
            last = np.array([traj[i, 0], traj[i, 1], th])
        yref[i] = last
        prev_theta = last[2]
    return yref


# ---------------------------------------------------------------------------
# Dense condensed box-QP (delta form): OSQP-style ADMM + active-set polish.
# ---------------------------------------------------------------------------


def _solve_condensed_qp(A, B, c, Qd, Rd, qx, qu, dx0,
                        idxbx, idxbu, lbx, ubx, lbu, ubu, z0=None):
    """Solve the stagewise box QP by eliminating states through the dynamics.

    min  sum_k 1/2 dx'diag(Qd_k)dx + qx_k'dx + 1/2 du'diag(Rd_k)du + qu_k'du
    s.t. dx_0 = dx0;  dx_{k+1} = A_k dx_k + B_k du_k + c_k
         lbx_k <= dx_k[idxbx] <= ubx_k   (k = 1..N)
         lbu_k <= du_k[idxbu] <= ubu_k   (k = 0..N-1)

    Method: dense condensing to z = stacked du, then OSQP-style ADMM
    (splitting  min 0.5 z'Hz + g'z  s.t.  Wz = y,  y in [lo, hi]) followed
    by an active-set KKT polish that recovers the exact optimum (machine
    precision) from the converged active set.  Entirely dense NumPy f64 —
    no code or algorithm shared with the production Riccati-factorized
    stagewise IPM.

    Returns (dxs [N+1, nx], dus [N, nu]).
    """
    N, nx, nu = B.shape
    nz = N * nu

    # dx_k = d_k + M_k z  (z = stacked du)
    Ms = np.zeros((N + 1, nx, nz))
    ds = np.zeros((N + 1, nx))
    ds[0] = dx0
    for k in range(N):
        Ms[k + 1] = A[k] @ Ms[k]
        Ms[k + 1][:, k * nu:(k + 1) * nu] += B[k]
        ds[k + 1] = A[k] @ ds[k] + c[k]

    H = np.zeros((nz, nz))
    g = qu.reshape(-1).copy()
    H[np.arange(nz), np.arange(nz)] += Rd.reshape(-1)
    for k in range(N + 1):
        MQ = Ms[k].T * Qd[k]          # [nz, nx]
        H += MQ @ Ms[k]
        g += MQ @ ds[k] + Ms[k].T @ qx[k]
    H = 0.5 * (H + H.T)

    # Constraint rows W z in [lo, hi]: input boxes (selected z entries) then
    # state boxes (rows of M at stages 1..N restricted to idxbx).
    nbx, nbu = len(idxbx), len(idxbu)
    rows_u = np.array([k * nu + i for k in range(N) for i in idxbu], int)
    Wu = np.zeros((len(rows_u), nz))
    Wu[np.arange(len(rows_u)), rows_u] = 1.0
    lo_u = lbu.reshape(-1)
    hi_u = ubu.reshape(-1)
    Gx = np.concatenate([Ms[k][list(idxbx)] for k in range(1, N + 1)], axis=0)
    lo_x = (lbx - ds[1:, list(idxbx)]).reshape(-1)
    hi_x = (ubx - ds[1:, list(idxbx)]).reshape(-1)
    W = np.concatenate([Wu, Gx], axis=0)
    lo = np.concatenate([lo_u, lo_x])
    hi = np.concatenate([hi_u, hi_x])
    m = W.shape[0]

    z, y, wdual = _admm_box_qp(H, g, W, lo, hi,
                               z0 if z0 is not None else np.zeros(nz))
    z_pol = _active_set_polish(H, g, W, lo, hi, y, wdual)
    if z_pol is not None:
        z = z_pol
    dus = z.reshape(N, nu)
    dxs = ds + np.einsum("kij,j->ki", Ms, z)
    return dxs, dus


def _admm_box_qp(H, g, W, lo, hi, z0, rho=20.0, sigma=1e-6,
                 max_iter=20000, tol=1e-9):
    """OSQP-style ADMM for  min 0.5 z'Hz + g'z  s.t.  lo <= Wz <= hi."""
    nz = H.shape[0]
    m = W.shape[0]
    K = H + sigma * np.eye(nz) + rho * (W.T @ W)
    cho = scipy.linalg.cho_factor(K)
    z = z0.copy()
    y = np.clip(W @ z, lo, hi)
    w = np.zeros(m)
    for it in range(max_iter):
        rhs = sigma * z - g + W.T @ (rho * y - w)
        z = scipy.linalg.cho_solve(cho, rhs)
        Wz = W @ z
        y = np.clip(Wz + w / rho, lo, hi)
        w = w + rho * (Wz - y)
        if it % 25 == 0:
            rp = np.abs(Wz - y).max(initial=0.0)
            rd = np.abs(H @ z + g + W.T @ w).max(initial=0.0)
            if rp < tol and rd < tol:
                break
    return z, y, w


def _active_set_polish(H, g, W, lo, hi, y, wdual, eps=1e-7):
    """Exact KKT solve on the ADMM-identified active set (OSQP's 'polish').

    Returns the polished z, or None if the polish is inconsistent (wrong
    active set) — the caller keeps the ADMM iterate then.
    """
    act_lo = (y <= lo + eps) & (wdual < -eps)
    act_hi = (y >= hi - eps) & (wdual > eps)
    act = act_lo | act_hi
    b = np.where(act_lo, lo, hi)[act]
    Wa = W[act]
    na = Wa.shape[0]
    nz = H.shape[0]
    KKT = np.block([[H, Wa.T], [Wa, np.zeros((na, na))]])
    rhs = np.concatenate([-g, b])
    try:
        sol = np.linalg.solve(KKT, rhs)
    except np.linalg.LinAlgError:
        sol, *_ = np.linalg.lstsq(KKT, rhs, rcond=None)
    z = sol[:nz]
    lam = sol[nz:]
    # Verify: primal feasibility everywhere, dual signs on the active set.
    Wz = W @ z
    if (Wz < lo - 1e-8).any() or (Wz > hi + 1e-8).any():
        return None
    sign_ok = np.where(act_lo[act], lam <= 1e-8, lam >= -1e-8)
    if not sign_ok.all():
        return None
    # Stationarity check.
    if np.abs(H @ z + g + Wa.T @ lam).max(initial=0.0) > 1e-7:
        return None
    return z


# ---------------------------------------------------------------------------
# The oracle controller: warm-started RTI with per-geometry packing.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class OracleController:
    """Float64 NumPy twin of ``control.controllers`` + ``rti.step``."""

    geometry: str               # 'diff' | 'omni4' | 'tric' | 'tric_bug'
    dt: float
    N: int
    p: np.ndarray               # model parameters
    lbx: np.ndarray             # [nbx] state bounds (absolute)
    ubx: np.ndarray
    lbu: np.ndarray             # [nbu] input bounds (absolute)
    ubu: np.ndarray
    q: np.ndarray               # [nx] runtime Q diagonal
    r: np.ndarray               # [nu] runtime R diagonal

    def __post_init__(self):
        f, nx, nu, idxbx, idxbu = _GEOM[self.geometry]
        self.f, self.nx, self.nu = f, nx, nu
        self.idxbx, self.idxbu = idxbx, idxbu
        # The runtime overrides W_e with the runtime Q diagonal
        # (NMPCNavControlDiff.cpp:34-42).
        self.qe = self.q.copy()
        # Adaptive x100 terminal hack: diff only (NMPCNavControlDiff.cpp:126-139;
        # commented out for tric, absent for omni4).
        self.adaptive = self.geometry == "diff"
        self.reset_full()

    # -- solver lifecycle ---------------------------------------------------
    def reset_full(self):
        """Capsule creation: everything zero (NMPCNavControlDiff.cpp:14-15)."""
        self.xs = np.zeros((self.N + 1, self.nx))
        self.us = np.zeros((self.N, self.nu))
        self.x0_carry = np.zeros(self.nx)

    def reset(self):
        """acados_reset: zero the primal trajectory but keep acados_in_.x0
        (the carried integrated refs), NMPCNavControlDiff.cpp:177-181."""
        self.xs[:] = 0.0
        self.us[:] = 0.0

    # -- per-geometry measurement packing / command maps ---------------------
    def compose_x0(self, pose, vel, steer_angle=0.0):
        """Measured entries overwrite the carry (controller tick packing,
        NMPCNavControlDiff.cpp:87-94)."""
        x0 = self.x0_carry.copy()
        if self.geometry == "diff":
            dist_b = self.p[0]
            vl = vel[0] - 0.5 * dist_b * vel[2]
            vr = vel[0] + 0.5 * dist_b * vel[2]
            x0[:5] = [pose[0], pose[1], pose[2], vl, vr]
        elif self.geometry == "omni4":
            l12 = self.p[0]
            v, vn, w = vel
            half_lw = 0.5 * l12 * w
            x0[:7] = [pose[0], pose[1], pose[2],
                      v - vn - half_lw, -v - vn - half_lw,
                      v + vn - half_lw, -v + vn - half_lw]
        else:  # tric / tric_bug
            x0[:5] = [pose[0], pose[1], pose[2], vel[0], steer_angle]
        return x0

    def cmd_of(self, refs):
        """Integrated refs -> (v, vn, w) command (NMPCNavControlDiff.cpp:155-165,
        Omni4:160-167, Tric:169-176)."""
        if self.geometry == "diff":
            dist_b = self.p[0]
            return np.array([0.5 * (refs[1] + refs[0]), 0.0,
                             (refs[1] - refs[0]) / dist_b])
        if self.geometry == "omni4":
            l12 = self.p[0]
            v1, v2, v3, v4 = refs
            return np.array([(v1 - v2 + v3 - v4) / 4.0,
                             (-v1 - v2 + v3 + v4) / 4.0,
                             -(v1 + v2 + v3 + v4) / (2.0 * l12)])
        return np.array([refs[0], 0.0, refs[1]])  # tric: (v_ref, 0, alpha_ref)

    # -- one warm-started RTI tick -------------------------------------------
    def step(self, x0, traj, n_valid):
        """One RTI solve; mirrors ``rti.step.rti_step`` semantics exactly.

        Returns (u0, cmd, kkt_like_info-free None) and updates the warm state.
        """
        N, dt = self.N, self.dt
        idxbx = list(self.idxbx)

        yref = build_yref(N, x0[2], traj, n_valid)

        qe = self.qe.copy()
        scale = 1.0
        if self.adaptive and np.all(yref[N] == yref[N - 1]):
            scale = 100.0
        qe[:3] = scale * self.q[:3]

        xs_lin = self.xs.copy()
        xs_lin[0] = x0
        A = np.empty((N, self.nx, self.nx))
        B = np.empty((N, self.nx, self.nu))
        c = np.empty((N, self.nx))
        for k in range(N):
            A[k], B[k] = _rk4_jacobians(self.f, xs_lin[k], self.us[k],
                                        self.p, dt)
            c[k] = rk4(self.f, xs_lin[k], self.us[k], self.p, dt) - xs_lin[k + 1]

        Qd = np.concatenate([np.tile(self.q, (N, 1)), qe[None]], axis=0)
        Rd = np.tile(self.r, (N, 1))
        x_res = xs_lin.copy()
        x_res[:, :3] -= yref
        qx = Qd * x_res
        qu = Rd * self.us

        lbx_d = self.lbx[None, :] - xs_lin[1:, idxbx]
        ubx_d = self.ubx[None, :] - xs_lin[1:, idxbx]
        idxbu = list(self.idxbu)
        lbu_d = self.lbu[None, :] - self.us[:, idxbu]
        ubu_d = self.ubu[None, :] - self.us[:, idxbu]

        dxs, dus = _solve_condensed_qp(
            A, B, c, Qd, Rd, qx, qu, np.zeros(self.nx),
            self.idxbx, self.idxbu, lbx_d, ubx_d, lbu_d, ubu_d,
        )

        self.xs = xs_lin + dxs
        self.us = self.us + dus
        u0 = self.us[0].copy()

        # Reference integration + stage-1 carry (NMPCNavControlDiff.cpp:155-173).
        refs = x0[idxbx] + u0 * dt
        self.x0_carry = self.xs[1].copy()
        self.x0_carry[idxbx] = refs
        return u0, self.cmd_of(refs)


# ---------------------------------------------------------------------------
# Closed-loop scenario harness (shared by golden generation and the test's
# production-side run).
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Scenario:
    name: str
    geometry: str               # oracle geometry key ('tric_bug' allowed)
    N: int
    dt: float
    T: int                      # closed-loop ticks
    p: tuple
    lbx: tuple
    ubx: tuple
    lbu: tuple
    ubu: tuple
    q: tuple
    r: tuple
    mode: str                   # 'pose_goal' | 'arc'
    goal: tuple = (0.0, 0.0, 0.0)
    x_init: tuple = ()
    arc_radius: float = 2.0
    arc_speed: float = 0.5
    arc_phi0: float = 0.0

    def controller(self):
        return OracleController(
            geometry=self.geometry, dt=self.dt, N=self.N,
            p=np.asarray(self.p, float),
            lbx=np.asarray(self.lbx, float), ubx=np.asarray(self.ubx, float),
            lbu=np.asarray(self.lbu, float), ubu=np.asarray(self.ubu, float),
            q=np.asarray(self.q, float), r=np.asarray(self.r, float),
        )


def make_scenario(**kw) -> Scenario:
    return Scenario(**kw)


def reference_window(sc: Scenario, tick: int):
    """Reference trajectory fed to the controller at a tick.

    pose_goal: a single valid row (the goal), n_valid = 1 — the GoToPose path
    (``NMPCNavControlROS.cpp:629-634``); invalid rows zero.
    arc: a time-indexed window of N+1 poses marching along a circle at
    arc_speed, heading tangent (crosses +-pi to exercise the unwrap chain).
    """
    N = sc.N
    traj = np.zeros((N + 1, 3))
    if sc.mode == "pose_goal":
        traj[0] = sc.goal
        return traj, 1
    R, v, phi0 = sc.arc_radius, sc.arc_speed, sc.arc_phi0
    i = np.arange(N + 1)
    s = v * sc.dt * (tick + i)
    phi = phi0 + s / R
    traj[:, 0] = R * np.cos(phi)
    traj[:, 1] = R * np.sin(phi)
    # Tangent heading, wrapped to [-pi, pi) like any measured/encoded angle.
    traj[:, 2] = np.mod(phi + 0.5 * np.pi + np.pi, 2.0 * np.pi) - np.pi
    return traj, N + 1


def measure(sc: Scenario, x):
    """Plant state -> (pose, body vel, steering angle): the TF-acquisition
    analog (``NMPCNavControlROS.cpp:401-506``), exact from the plant state."""
    pose = np.array([x[0], x[1], x[2]])
    steer = 0.0
    if sc.geometry == "diff":
        dist_b = sc.p[0]
        vl, vr = x[3], x[4]
        vel = np.array([0.5 * (vr + vl), 0.0, (vr - vl) / dist_b])
    elif sc.geometry == "omni4":
        l12 = sc.p[0]
        v1, v2, v3, v4 = x[3], x[4], x[5], x[6]
        vel = np.array([(v1 - v2 + v3 - v4) / 4.0,
                        (-v1 - v2 + v3 + v4) / 4.0,
                        -(v1 + v2 + v3 + v4) / (2.0 * l12)])
    else:
        vel = np.array([x[3], 0.0, 0.0])
        steer = float(x[4])
    return pose, vel, steer


def plant_step(sc: Scenario, x, u0):
    """Perfect-model plant: f64 RK4 of the scenario's own dynamics under the
    solver's stage-0 input (the deterministic analog of the reference's sim
    scripts' Euler plants, ``scripts/test_scripts/acados_sim_diff.py:148-159``)."""
    f = _GEOM[sc.geometry][0]
    return rk4(f, np.asarray(x, float), np.asarray(u0, float),
               np.asarray(sc.p, float), sc.dt)


def closed_loop(sc: Scenario, step_fn=None):
    """Run T closed-loop ticks against the f64 perfect-model plant.

    ``step_fn(pose, vel, steer, traj, n_valid) -> (u0, cmd)`` defaults to the
    oracle controller (which composes x0 from the measurements and runs the
    warm-started RTI); pass a production-backed callable to drive the same
    scenario through the JAX path.

    Returns dict of arrays: xs_plant [T+1, nx], us [T, nu], cmds [T, 3].
    """
    if step_fn is None:
        ctl = sc.controller()

        def step_fn(pose, vel, steer, traj, n_valid):
            x0 = ctl.compose_x0(pose, vel, steer)
            return ctl.step(x0, traj, n_valid)

    nx, nu = _GEOM[sc.geometry][1], _GEOM[sc.geometry][2]
    x = np.zeros(nx)
    if sc.x_init:
        x[: len(sc.x_init)] = sc.x_init
    xs = np.empty((sc.T + 1, nx))
    xs[0] = x
    us = np.empty((sc.T, nu))
    cmds = np.empty((sc.T, 3))
    for t in range(sc.T):
        pose, vel, steer = measure(sc, x)
        traj, n_valid = reference_window(sc, t)
        u0, cmd = step_fn(pose, vel, steer, traj, n_valid)
        us[t] = np.asarray(u0, float)
        cmds[t] = np.asarray(cmd, float)
        x = plant_step(sc, x, us[t])
        xs[t + 1] = x
    return {"xs_plant": xs, "us": us, "cmds": cmds}
