"""Differential-drive AMR model ('diff2amr').

State/input/parameter orderings follow the reference exactly:
  x = (x, y, theta, vl, vr, vl_ref, vr_ref)          nx = 7
  u = (dvl_ref, dvr_ref)                             nu = 2
  p = (dist_b, tau_v)                                npar = 2
Reference: ``scripts/diff/diff_amr_model.py:8-60`` and the state maps in
``include/nmpc_nav_control/NMPCNavControlDiff.h:19-30``.

Dynamics (``diff_amr_model.py:42-60``; the dead ``vl_dot = dvl_ref``
assignments at ``:51-52`` are immediately overwritten and are not replicated):
  x_dot      = v cos(theta),            v = (vr + vl)/2
  y_dot      = v sin(theta)
  theta_dot  = (vr - vl)/dist_b
  vl_dot     = (vl_ref - vl)/tau_v      (first-order wheel-velocity lag)
  vr_dot     = (vr_ref - vr)/tau_v
  vl_ref_dot = dvl_ref                  (integrator states driven by u)
  vr_ref_dot = dvr_ref

Box bounds: idxbx = (5, 6) i.e. (vl_ref, vr_ref) in [-v_max, v_max] at stages
1..N and terminal; idxbu = (0, 1) i.e. u in [-a_max, a_max]
(``scripts/diff/generate_c_code.py:45-55``).
"""
from __future__ import annotations

import jax.numpy as jnp

from nmpc_nav_control_tpu.models.base import ModelSpec

__all__ = ["SPEC", "f", "direct_kinematics", "inverse_kinematics", "make_params"]

# State index map (NMPCNavControlDiff.h:19-24)
X, Y, THETA, VL, VR, VL_REF, VR_REF = range(7)
# Input index map (NMPCNavControlDiff.h:25-27)
DVL_REF, DVR_REF = range(2)
# Parameter index map (NMPCNavControlDiff.h:28-30)
P_DIST_B, P_TAU_V = range(2)


def f(x, u, p):
    """Continuous-time dynamics xdot = f(x, u, p)."""
    dist_b = p[P_DIST_B]
    tau_v = p[P_TAU_V]
    theta = x[THETA]
    vl, vr = x[VL], x[VR]
    v = 0.5 * (vr + vl)
    return jnp.stack(
        [
            v * jnp.cos(theta),
            v * jnp.sin(theta),
            (vr - vl) / dist_b,
            (x[VL_REF] - vl) / tau_v,
            (x[VR_REF] - vr) / tau_v,
            u[DVL_REF],
            u[DVR_REF],
        ]
    )


def direct_kinematics(v, w, dist_b):
    """Body (v, w) -> wheel (vl, vr). Reference ``NMPCNavControlDiff.cpp:183-187``."""
    vl = v - 0.5 * dist_b * w
    vr = v + 0.5 * dist_b * w
    return vl, vr


def inverse_kinematics(vl, vr, dist_b):
    """Wheel (vl, vr) -> body (v, w). Reference ``NMPCNavControlDiff.cpp:189-193``."""
    v = 0.5 * (vr + vl)
    w = (vr - vl) / dist_b
    return v, w


def make_params(dist_b: float, tau_v: float):
    return jnp.array([dist_b, tau_v])


SPEC = ModelSpec(
    name="diff",
    nx=7,
    nu=2,
    npar=2,
    idxbx=(VL_REF, VR_REF),
    idxbu=(DVL_REF, DVR_REF),
    f=f,
)
