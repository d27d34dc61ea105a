"""Angle / distance helpers (pure JAX).

Behavioral parity with the reference C++ helpers:
  - ``norm_ang_rad``  — reference ``include/nmpc_nav_control/utils.h:33-47``
  - ``norm_ang_deg``  — reference ``include/nmpc_nav_control/utils.h:17-31``
  - ``unwrap_angle``  — reference ``src/nmpc_nav_control/NMPCNavControl.cpp:25-31``
  - ``dist``          — reference ``include/nmpc_nav_control/utils.h:8-14``

All functions are elementwise and jit/vmap-safe.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["norm_ang_rad", "norm_ang_deg", "unwrap_angle", "dist"]


def norm_ang_rad(angle):
    """Normalize an angle to the interval [-pi, pi).

    Matches the C ``fmod(angle + pi, 2 pi)`` + negative-correction idiom of
    the reference (``utils.h:33-47``): ``jnp.mod`` already returns a result
    with the sign of the divisor, which is exactly the corrected value.
    """
    return jnp.mod(angle + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def norm_ang_deg(angle):
    """Normalize an angle in degrees to [-180, 180). Reference ``utils.h:17-31``."""
    return jnp.mod(angle + 180.0, 360.0) - 180.0


def unwrap_angle(current, previous):
    """Single-step angle unwrap: shift ``current`` by +/- 2 pi if it jumps by
    more than pi relative to ``previous``.

    Exactly one correction is applied (an ``if/else if``, not a loop), matching
    reference ``NMPCNavControl.cpp:25-31``.
    """
    delta = current - previous
    current = jnp.where(delta > jnp.pi, current - 2.0 * jnp.pi, current)
    current = jnp.where(delta < -jnp.pi, current + 2.0 * jnp.pi, current)
    return current


def dist(x1, y1, x2, y2):
    """Euclidean distance. Reference ``utils.h:8-14``."""
    return jnp.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2)
