"""Tricycle AMR model ('tric3amr').

State/input/parameter orderings follow the reference exactly:
  x = (x, y, theta, v, alpha, v_ref, alpha_ref)      nx = 7
  u = (dv_ref, dalpha_ref)                           nu = 2
  p = (dist_d, tau_v, tau_a)                         npar = 3
Reference: ``scripts/tric/tric_amr_model.py:8-55`` and
``include/nmpc_nav_control/NMPCNavControlTric.h:19-31``.

Intended tricycle kinematics (``tric_amr_model.py:49-51``):
  x_dot     = v cos(theta) cos(alpha)
  y_dot     = v sin(theta) cos(alpha)
  theta_dot = (v / dist_d) sin(alpha)
plus first-order lags on (v, alpha) and integrator states (v_ref, alpha_ref).

KNOWN REFERENCE BUG (``tric_amr_model.py:45``): the reference assigns
``cos_alpha = ca.sin(alpha)``, so its generated solver uses sin(alpha) in
x_dot / y_dot where cos(alpha) is clearly intended.  Policy (SURVEY.md §7):
this module implements the *intended* cos(alpha) by default and exposes a
``bug_compat`` variant (``f_bug_compat`` / ``SPEC_BUG_COMPAT``) that
reproduces the reference's as-generated behavior for parity runs.

Box bounds: idxbx = (5, 6) i.e. (v_ref, alpha_ref) with asymmetric alpha
bounds [alpha_min, alpha_max]; idxbu = (0, 1) i.e. (dv_ref, dalpha_ref) in
([-a_max, a_max], [-dalpha_max, dalpha_max])
(``scripts/tric/generate_c_code.py:47-57``; deg->rad conversions in
``scripts/tric/common.py:17-19``).
"""
from __future__ import annotations

import jax.numpy as jnp

from nmpc_nav_control_tpu.models.base import ModelSpec

__all__ = [
    "SPEC",
    "SPEC_BUG_COMPAT",
    "f",
    "f_bug_compat",
    "make_params",
]

# State index map (NMPCNavControlTric.h:19-26)
X, Y, THETA, V, ALPHA, V_REF, ALPHA_REF = range(7)
# Input index map
DV_REF, DALPHA_REF = range(2)
# Parameter index map (NMPCNavControlTric.h:27-31)
P_DIST_D, P_TAU_V, P_TAU_A = range(3)


def _f(x, u, p, cos_alpha_fn):
    dist_d = p[P_DIST_D]
    tau_v = p[P_TAU_V]
    tau_a = p[P_TAU_A]
    theta = x[THETA]
    v = x[V]
    alpha = x[ALPHA]
    ca_ = cos_alpha_fn(alpha)
    sa = jnp.sin(alpha)
    return jnp.stack(
        [
            v * jnp.cos(theta) * ca_,
            v * jnp.sin(theta) * ca_,
            v / dist_d * sa,
            (x[V_REF] - v) / tau_v,
            (x[ALPHA_REF] - alpha) / tau_a,
            u[DV_REF],
            u[DALPHA_REF],
        ]
    )


def f(x, u, p):
    """Intended tricycle dynamics (cos(alpha) in the position rates)."""
    return _f(x, u, p, jnp.cos)


def f_bug_compat(x, u, p):
    """Reference-as-generated dynamics: sin(alpha) where cos(alpha) is
    intended (``tric_amr_model.py:45``), for parity runs only."""
    return _f(x, u, p, jnp.sin)


def make_params(dist_d: float, tau_v: float, tau_a: float):
    return jnp.array([dist_d, tau_v, tau_a])


SPEC = ModelSpec(
    name="tric",
    nx=7,
    nu=2,
    npar=3,
    idxbx=(V_REF, ALPHA_REF),
    idxbu=(DV_REF, DALPHA_REF),
    f=f,
)

SPEC_BUG_COMPAT = ModelSpec(
    name="tric_bug_compat",
    nx=7,
    nu=2,
    npar=3,
    idxbx=(V_REF, ALPHA_REF),
    idxbu=(DV_REF, DALPHA_REF),
    f=f_bug_compat,
)
