"""Nearest-point projection onto a path list.

Replaces ``parametric_trajectories_common::TPathProcessMinDist(10, 0.01)``
(used at ``NMPCNavControlROS.cpp:597-601``): given the robot position, find
the fractional global parameter u* minimizing the distance to the path, and
return the nearest pose (x, y, theta, theta_holonomic).

TPU-native scheme (fixed work, no data-dependent loops):
  1. coarse grid: GRID samples per segment across the full capacity, masked by
     segment validity — one vectorized argmin;
  2. NEWTON_ITERS damped Newton steps on g(u) = |P(u) - r|^2 within the
     winning segment, clamped to [0, 1] (the reference runs 10 iterations at
     0.01 tolerance; we run the same fixed count).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nmpc_nav_control_tpu.paths.pathlist import PathList, path_capacity
from nmpc_nav_control_tpu.paths.segment import (
    poly_deriv_eval,
    poly_eval,
    seg_theta,
    seg_theta_holonomic,
)

__all__ = ["MinDistResult", "project_to_path"]

GRID = 32
NEWTON_ITERS = 10


class MinDistResult(NamedTuple):
    u: jnp.ndarray                # [] fractional global parameter
    x: jnp.ndarray                # [] nearest point
    y: jnp.ndarray
    theta: jnp.ndarray            # [] tangent heading (no reverse correction)
    theta_holonomic: jnp.ndarray  # [] holonomic heading


def _poly_second_deriv(c, u):
    DEG = c.shape[-1]
    out = c[..., -1] * (DEG - 1) * (DEG - 2)
    for i in range(DEG - 2, 1, -1):
        out = out * u + c[..., i] * i * (i - 1)
    return out


def project_to_path(plist: PathList, rx, ry) -> MinDistResult:
    """GetMinDist analog. Returns the global fractional u and nearest pose.

    Matches the reference contract: u is relative to the *current* path list
    (segment index + local u); the caller pops completed segments
    (``NMPCNavControlROS.cpp:603-609``).
    """
    M = path_capacity(plist)
    dtype = plist.segs.cx.dtype
    rx = jnp.asarray(rx, dtype)
    ry = jnp.asarray(ry, dtype)

    # --- Coarse pass: [M, GRID] distance grid, masked by validity. ---
    ugrid = jnp.linspace(0.0, 1.0, GRID, dtype=dtype)          # [G]
    xg = jax.vmap(lambda cu: jax.vmap(lambda u: poly_eval(cu, u))(ugrid))(plist.segs.cx)
    yg = jax.vmap(lambda cu: jax.vmap(lambda u: poly_eval(cu, u))(ugrid))(plist.segs.cy)
    d2 = (xg - rx) ** 2 + (yg - ry) ** 2                        # [M, G]
    seg_valid = jnp.arange(M) < plist.count
    d2 = jnp.where(seg_valid[:, None], d2, jnp.inf)
    flat = jnp.argmin(d2)
    seg_idx = flat // GRID
    u0 = (flat % GRID).astype(dtype) / (GRID - 1)   # == ugrid[flat % GRID]

    from nmpc_nav_control_tpu.paths.windowing import select_rows

    seg = select_rows(plist.segs, seg_idx)   # one-hot, not a gather (TPU)

    # --- Newton refinement on g(u) = |P(u) - r|^2 / 2. ---
    def newton(u, _):
        px = poly_eval(seg.cx, u) - rx
        py = poly_eval(seg.cy, u) - ry
        dx = poly_deriv_eval(seg.cx, u)
        dy = poly_deriv_eval(seg.cy, u)
        ddx = _poly_second_deriv(seg.cx, u)
        ddy = _poly_second_deriv(seg.cy, u)
        g1 = px * dx + py * dy
        g2 = dx * dx + dy * dy + px * ddx + py * ddy
        # Guard indefinite curvature: fall back to gradient descent scale.
        g2 = jnp.where(g2 > 1e-9, g2, dx * dx + dy * dy + 1e-9)
        u = jnp.clip(u - g1 / g2, 0.0, 1.0)
        return u, None

    u_star, _ = jax.lax.scan(newton, u0, None, length=NEWTON_ITERS,
                             unroll=True)   # 10 tiny steps: loop overhead
                                            # exceeds the math

    return MinDistResult(
        u=seg_idx.astype(dtype) + u_star,
        x=poly_eval(seg.cx, u_star),
        y=poly_eval(seg.cy, u_star),
        theta=seg_theta(seg, u_star),
        theta_holonomic=seg_theta_holonomic(seg, u_star),
    )
