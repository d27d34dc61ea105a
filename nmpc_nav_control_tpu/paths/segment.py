"""Parametric path segments — the TPath contract, TPU-native.

The reference consumes parametric curves from the external package
``parametric_trajectories_common`` whose behavioral contract (SURVEY.md §2.3)
is: per-segment parameter u in [0, 1]; evaluators GetX/GetY/GetTheta/
GetThetaHolomonic/GetDX/GetDY; signed nominal GetVelocity(); GetPathLength()/
SetPathLength(n); and a frame id (used at
``PathDiscretizer.cpp:76-102`` and ``NMPCNavControlROS.cpp:563-595``).

Here a segment is a pair of fixed-degree polynomials x(u), y(u) plus an
optional holonomic-heading polynomial — this covers the common line / cubic /
quintic parametric trajectories.  Everything is a fixed-shape pytree:

  - a ``PathSegment`` batches naturally (leading axes = segment list and/or
    scenario batch);
  - a path *list* is a ``PathSegment`` with a leading [M] axis plus a count
    (fixed capacity + mask — no dynamic shapes anywhere).

Orientation semantics (``PathDiscretizer.cpp:76-90``):
  theta(u)           = atan2(y'(u), x'(u))     (+ pi when velocity < 0,
                                                applied by the *caller*)
  theta_holonomic(u) = dedicated polynomial.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "DEG",
    "PathSegment",
    "make_line_segment",
    "make_cubic_segment",
    "poly_eval",
    "poly_deriv_eval",
    "seg_xy",
    "seg_dxy",
    "seg_theta",
    "seg_theta_holonomic",
    "seg_arc_length",
]

# Polynomial coefficient count (degree DEG-1). 8 coefficients covers
# quintic trajectories with headroom; static everywhere.
DEG = 8
# Samples for numeric arc length. The reference calls SetPathLength(1000)
# on ingest (``NMPCNavControlROS.cpp:571``); 256 chord samples give
# <0.01% error for the smooth curves this system uses.
ARC_SAMPLES = 256


class PathSegment(NamedTuple):
    """One parametric curve. All leaves are arrays -> vmap/shard-friendly.

    cx, cy: [DEG] polynomial coefficients, p(u) = sum_i c[i] u^i.
    ch:     [DEG] holonomic-heading polynomial coefficients.
    velocity: [] signed nominal velocity along the segment (GetVelocity()).
    frame_id: [] int32 frame code; 0 means empty/invalid (the reference skips
              segments with an empty frame string, ``NMPCNavControlROS.cpp:569``).
    length: [] precomputed arc length (GetPathLength()).
    """

    cx: jnp.ndarray
    cy: jnp.ndarray
    ch: jnp.ndarray
    velocity: jnp.ndarray
    frame_id: jnp.ndarray
    length: jnp.ndarray


def poly_eval(c, u):
    """Horner evaluation of p(u) = sum_i c[i] u^i; c: [..., DEG]."""
    out = c[..., -1]
    for i in range(DEG - 2, -1, -1):
        out = out * u + c[..., i]
    return out


def poly_deriv_eval(c, u):
    """Evaluate p'(u)."""
    out = c[..., -1] * (DEG - 1)
    for i in range(DEG - 2, 0, -1):
        out = out * u + c[..., i] * i
    return out


def seg_xy(seg: PathSegment, u):
    return poly_eval(seg.cx, u), poly_eval(seg.cy, u)


def seg_dxy(seg: PathSegment, u):
    return poly_deriv_eval(seg.cx, u), poly_deriv_eval(seg.cy, u)


def seg_theta(seg: PathSegment, u):
    """Tangent heading: GetTheta(u) = atan2(y', x')."""
    dx, dy = seg_dxy(seg, u)
    return jnp.arctan2(dy, dx)


def seg_theta_holonomic(seg: PathSegment, u):
    """GetThetaHolomonic(u): independent heading profile."""
    return poly_eval(seg.ch, u)


def seg_arc_length(cx, cy, samples: int = ARC_SAMPLES):
    """Chord-sum arc length over u in [0, 1] (SetPathLength analog)."""
    u = jnp.linspace(0.0, 1.0, samples + 1)
    xs = jax.vmap(lambda uu: poly_eval(cx, uu))(u)
    ys = jax.vmap(lambda uu: poly_eval(cy, uu))(u)
    return jnp.sum(jnp.sqrt(jnp.diff(xs) ** 2 + jnp.diff(ys) ** 2))


def _pad_coeffs(coeffs):
    c = jnp.zeros(DEG, jnp.result_type(float)).at[: len(coeffs)].set(jnp.asarray(coeffs))
    return c


def make_line_segment(p0, p1, velocity=1.0, frame_id=1, theta_holonomic=0.0):
    """Straight segment from p0 to p1."""
    p0 = jnp.asarray(p0, jnp.result_type(float))
    p1 = jnp.asarray(p1, jnp.result_type(float))
    cx = _pad_coeffs([p0[0], p1[0] - p0[0]])
    cy = _pad_coeffs([p0[1], p1[1] - p0[1]])
    ch = _pad_coeffs([theta_holonomic])
    return PathSegment(
        cx=cx, cy=cy, ch=ch,
        velocity=jnp.asarray(velocity, cx.dtype),
        frame_id=jnp.asarray(frame_id, jnp.int32),
        length=seg_arc_length(cx, cy),
    )


def make_cubic_segment(cx_coeffs, cy_coeffs, velocity=1.0, frame_id=1,
                       ch_coeffs=(0.0,)):
    """Segment from explicit polynomial coefficients (low order first)."""
    cx = _pad_coeffs(cx_coeffs)
    cy = _pad_coeffs(cy_coeffs)
    ch = _pad_coeffs(ch_coeffs)
    return PathSegment(
        cx=cx, cy=cy, ch=ch,
        velocity=jnp.asarray(velocity, cx.dtype),
        frame_id=jnp.asarray(frame_id, jnp.int32),
        length=seg_arc_length(cx, cy),
    )
