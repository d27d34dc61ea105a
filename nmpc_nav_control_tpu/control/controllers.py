"""Per-geometry NMPC controllers.

Thin, fully-functional equivalents of ``NMPCNavControl{Diff,Omni4,Tric}``
(reference ``src/nmpc_nav_control/NMPCNavControl*.cpp``): each geometry is a
static ``ControllerSpec`` + an ``OCPData`` pytree + the shared ``rti_step``.
A controller tick composes the solver initial state from measurements and the
carried reference entries, runs one RTI solve, and maps the integrated
references to a robot command.

Construction mirrors the reference constructors, including the runtime
override where W_e is set from the *runtime* Q diagonal (not the codegen
QN): ``NMPCNavControlDiff.cpp:24-43``, ``NMPCNavControlOmni4.cpp:24-57``,
``NMPCNavControlTric.cpp:24-58``.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax.numpy as jnp

from nmpc_nav_control_tpu.models import diff, omni4, tric
from nmpc_nav_control_tpu.ocp.spec import OCPData, OCPDims
from nmpc_nav_control_tpu.rti.step import (
    RTIConfig,
    RTIState,
    rti_init,
    rti_reset,
    rti_step,
)

__all__ = [
    "CmdVel",
    "ControllerSpec",
    "make_controller",
    "controller_init",
    "controller_reset",
    "controller_step",
]


class CmdVel(NamedTuple):
    """Geometry-agnostic command triple.

    diff:  (v, 0, w)           — ``NMPCNavControlDiff.cpp:162-165`` via inverse
                                  kinematics of the integrated wheel refs.
    omni4: (v, vn, w)          — ``NMPCNavControlOmni4.cpp:165-167``.
    tric:  (v_ref, 0, alpha_ref) — ``NMPCNavControlTric.cpp:172-176`` outputs
                                  the refs directly, no kinematic map.
    """

    v: jnp.ndarray
    vn: jnp.ndarray
    w: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ControllerSpec:
    """Static controller description (hashable; close over in jit)."""

    geometry: str            # 'diff' | 'omni4' | 'tric'
    rti: RTIConfig

    @property
    def dims(self) -> OCPDims:
        return self.rti.dims


def make_controller(
    geometry: str,
    dt: float,
    N: int,
    *,
    # physical parameters (geometry-dependent subset used)
    dist_b: float | None = None,        # diff wheel separation
    l1_plus_l2: float | None = None,    # omni4 wheel-distance sum
    dist_d: float | None = None,        # tric steering-to-rear distance
    tau_v: float = 0.1,
    tau_a: float = 0.5,
    v_max: float = 1.0,
    a_max: float = 1.0,
    alpha_min: float | None = None,     # radians
    alpha_max: float | None = None,     # radians
    dalpha_max: float | None = None,    # radians/s
    q_diag: Sequence[float] = (),
    r_diag: Sequence[float] = (),
    qn_diag: Sequence[float] | None = None,
    ipm_iters: int = 8,
    tric_bug_compat: bool = False,
    dtype=jnp.float32,
) -> tuple[ControllerSpec, OCPData]:
    """Build a (static spec, numeric data) controller pair.

    Argument set mirrors the reference constructors
    (``NMPCNavControlROS.cpp:145,210,293``); angle arguments are radians (the
    reference converts deg->rad at param read, ``NMPCNavControlROS.cpp:243-245``).
    """
    if geometry == "diff":
        assert dist_b is not None
        model = diff.SPEC
        p = jnp.array([dist_b, tau_v], dtype)
        lbx = jnp.array([-v_max, -v_max], dtype)
        ubx = jnp.array([v_max, v_max], dtype)
        lbu = jnp.array([-a_max, -a_max], dtype)
        ubu = jnp.array([a_max, a_max], dtype)
        adaptive = True   # the x100 terminal hack is active for diff only
    elif geometry == "omni4":
        assert l1_plus_l2 is not None
        model = omni4.SPEC
        p = jnp.array([l1_plus_l2, tau_v], dtype)
        lbx = jnp.full((4,), -v_max, dtype)
        ubx = jnp.full((4,), v_max, dtype)
        lbu = jnp.full((4,), -a_max, dtype)
        ubu = jnp.full((4,), a_max, dtype)
        adaptive = False
    elif geometry == "tric":
        assert dist_d is not None and alpha_min is not None
        assert alpha_max is not None and dalpha_max is not None
        model = tric.SPEC_BUG_COMPAT if tric_bug_compat else tric.SPEC
        p = jnp.array([dist_d, tau_v, tau_a], dtype)
        lbx = jnp.array([-v_max, alpha_min], dtype)
        ubx = jnp.array([v_max, alpha_max], dtype)
        lbu = jnp.array([-a_max, -dalpha_max], dtype)
        ubu = jnp.array([a_max, dalpha_max], dtype)
        adaptive = False  # present but commented out in the reference
    else:
        raise ValueError(f"unknown steering geometry: {geometry!r}")

    nx, nu = model.nx, model.nu
    q = jnp.asarray(q_diag, dtype)
    r = jnp.asarray(r_diag, dtype)
    assert q.shape == (nx,), f"q_diag must have {nx} entries"
    assert r.shape == (nu,), f"r_diag must have {nu} entries"
    # Terminal weight: the reference *runtime* overrides W_e with the runtime
    # Q diagonal (``NMPCNavControlDiff.cpp:34-42``); a distinct QN_diag exists
    # only in the offline codegen schema (``scripts/*/common.py``) — honored
    # here when given so offline-style builds match the generated solvers.
    qe = q if qn_diag is None else jnp.asarray(qn_diag, dtype)
    assert qe.shape == (nx,), f"qn_diag must have {nx} entries"

    dims = OCPDims(model=model, N=N, dt=dt)
    # Static structural sparsity of the RK4 stage Jacobians (p is concrete
    # here) — exploited by the fused TPU IPM kernels; diff/tric: 23/49 A
    # entries, omni4: 41/121.
    from nmpc_nav_control_tpu.ocp.sparsity import detect_jacobian_sparsity

    spars = detect_jacobian_sparsity(model.f, dt, nx, nu, p)
    spec = ControllerSpec(
        geometry=geometry,
        rti=RTIConfig(
            dims=dims,
            ipm_iters=ipm_iters,
            adaptive_terminal_weight=adaptive,
            spars=spars,
        ),
    )
    data = OCPData(
        p=p, lbx=lbx, ubx=ubx, lbu=lbu, ubu=ubu,
        q_diag=q, r_diag=r,
        qe_diag=qe,
    )
    return spec, data


def controller_init(spec: ControllerSpec, dtype=jnp.float32) -> RTIState:
    return rti_init(spec.dims, dtype)


def controller_reset(state: RTIState) -> RTIState:
    """New goal/path received: reset solver memory, keep integrated refs
    (``NMPCNavControlROS.cpp:309,316,326`` -> ``acados_reset``)."""
    return rti_reset(state)


def _compose_x0(spec: ControllerSpec, data: OCPData, state: RTIState,
                pose, vel, steer_angle):
    """Pack the solver initial state from measurements + carried refs."""
    g = spec.geometry
    carry = state.x0_carry
    if g == "diff":
        # (x, y, theta, vl, vr) measured; (vl_ref, vr_ref) carried.
        vl, vr = diff.direct_kinematics(vel[0], vel[2], data.p[diff.P_DIST_B])
        meas = jnp.stack([pose[0], pose[1], pose[2], vl, vr])
        return carry.at[:5].set(meas.astype(carry.dtype))
    if g == "omni4":
        v1, v2, v3, v4 = omni4.direct_kinematics(
            vel[0], vel[1], vel[2], data.p[omni4.P_L1_PLUS_L2]
        )
        meas = jnp.stack([pose[0], pose[1], pose[2], v1, v2, v3, v4])
        return carry.at[:7].set(meas.astype(carry.dtype))
    # tric: (x, y, theta, v, alpha) measured — alpha from the steering-wheel
    # TF frame (``NMPCNavControlTric.cpp:94-99`` + setSteeringWheelAngle).
    meas = jnp.stack([pose[0], pose[1], pose[2], vel[0], steer_angle])
    return carry.at[:5].set(meas.astype(carry.dtype))


def _cmd_of(spec: ControllerSpec, data: OCPData, refs) -> CmdVel:
    g = spec.geometry
    zero = jnp.zeros_like(refs[0])
    if g == "diff":
        v, w = diff.inverse_kinematics(refs[0], refs[1], data.p[diff.P_DIST_B])
        return CmdVel(v=v, vn=zero, w=w)
    if g == "omni4":
        v, vn, w = omni4.inverse_kinematics(
            refs[0], refs[1], refs[2], refs[3], data.p[omni4.P_L1_PLUS_L2]
        )
        return CmdVel(v=v, vn=vn, w=w)
    # tric: (v_ref, alpha_ref) output directly in (v, w) slots.
    return CmdVel(v=refs[0], vn=zero, w=refs[1])


def controller_step(
    spec: ControllerSpec,
    data: OCPData,
    state: RTIState,
    pose,
    vel,
    traj_xy_theta,
    n_valid,
    steer_angle=None,
):
    """One controller tick: the functional ``run()`` (``NMPCNavControlDiff.cpp:82-175``).

    Args:
      pose: [3] (x, y, theta) measured robot pose.
      vel:  [3] (v, vn, w) measured body velocity.
      traj_xy_theta: [N+1, 3] reference poses; n_valid rows used.
      steer_angle: measured steering-wheel angle (tric only).

    Returns (new_state, CmdVel, RTIStats).
    """
    if steer_angle is None:
        # Match the carry dtype: a default-dtype zero would be f64 under x64
        # and turn the x0 scatter into an unsafe-cast (FutureWarning, soon an
        # error in JAX).
        steer_angle = jnp.zeros((), state.x0_carry.dtype)
    x0 = _compose_x0(spec, data, state, pose, vel, steer_angle)
    new_state, u0, stats = rti_step(
        spec.rti, data, state, x0, traj_xy_theta, n_valid
    )
    idxbx = jnp.asarray(spec.dims.model.idxbx)
    refs = x0[idxbx] + u0 * spec.dims.dt
    cmd = _cmd_of(spec, data, refs)
    return new_state, cmd, stats
