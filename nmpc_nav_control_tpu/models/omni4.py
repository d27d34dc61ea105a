"""4-wheel omnidirectional AMR model ('omni4amr').

State/input/parameter orderings follow the reference exactly:
  x = (x, y, theta, v1..v4, v1_ref..v4_ref)          nx = 11
  u = (dv1_ref..dv4_ref)                             nu = 4
  p = (l1_plus_l2, tau_v)                            npar = 2
Reference: ``scripts/omni4/omni4_amr_model.py:8-69`` and
``include/nmpc_nav_control/NMPCNavControlOmni4.h:19-30``.

Body-velocity map (``omni4_amr_model.py:54-56``):
  v  = ( v1 - v2 + v3 - v4)/4
  vn = (-v1 - v2 + v3 + v4)/4
  w  = -(v1 + v2 + v3 + v4)/(2 (l1+l2))
World-frame kinematics (``:59-61``), per-wheel first-order lags and
reference-velocity integrator states (``:62-69``).

Box bounds: idxbx = (7, 8, 9, 10) (wheel reference velocities) in
[-v_max, v_max]; idxbu = (0..3) in [-a_max, a_max]
(``scripts/omni4/generate_c_code.py:45-55``).
"""
from __future__ import annotations

import jax.numpy as jnp

from nmpc_nav_control_tpu.models.base import ModelSpec

__all__ = ["SPEC", "f", "direct_kinematics", "inverse_kinematics", "make_params"]

# State index map (NMPCNavControlOmni4.h:19-26)
X, Y, THETA, V1, V2, V3, V4, V1_REF, V2_REF, V3_REF, V4_REF = range(11)
# Input index map
DV1_REF, DV2_REF, DV3_REF, DV4_REF = range(4)
# Parameter index map
P_L1_PLUS_L2, P_TAU_V = range(2)


def f(x, u, p):
    """Continuous-time dynamics xdot = f(x, u, p)."""
    l12 = p[P_L1_PLUS_L2]
    tau_v = p[P_TAU_V]
    theta = x[THETA]
    v1, v2, v3, v4 = x[V1], x[V2], x[V3], x[V4]
    v = (v1 - v2 + v3 - v4) / 4.0
    vn = (-v1 - v2 + v3 + v4) / 4.0
    w = -(v1 + v2 + v3 + v4) / (2.0 * l12)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    lag = (x[V1_REF:V4_REF + 1] - x[V1:V4 + 1]) / tau_v
    return jnp.concatenate(
        [
            jnp.stack([v * ct - vn * st, v * st + vn * ct, w]),
            lag,
            u,
        ]
    )


def direct_kinematics(v, vn, w, l1_plus_l2):
    """Body (v, vn, w) -> wheel velocities. Reference ``NMPCNavControlOmni4.cpp:185-192``."""
    half_lw = 0.5 * l1_plus_l2 * w
    v1 = v - vn - half_lw
    v2 = -v - vn - half_lw
    v3 = v + vn - half_lw
    v4 = -v + vn - half_lw
    return v1, v2, v3, v4


def inverse_kinematics(v1, v2, v3, v4, l1_plus_l2):
    """Wheel velocities -> body (v, vn, w). Reference ``NMPCNavControlOmni4.cpp:194-200``."""
    v = (v1 - v2 + v3 - v4) / 4.0
    vn = (-v1 - v2 + v3 + v4) / 4.0
    w = -(v1 + v2 + v3 + v4) / (2.0 * l1_plus_l2)
    return v, vn, w


def make_params(l1_plus_l2: float, tau_v: float):
    return jnp.array([l1_plus_l2, tau_v])


SPEC = ModelSpec(
    name="omni4",
    nx=11,
    nu=4,
    npar=2,
    idxbx=(V1_REF, V2_REF, V3_REF, V4_REF),
    idxbu=(DV1_REF, DV2_REF, DV3_REF, DV4_REF),
    f=f,
)
