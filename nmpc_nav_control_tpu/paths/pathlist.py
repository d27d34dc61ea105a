"""Fixed-capacity path lists and pose/velocity sampling.

Replaces the reference's ``std::list<TPath>`` + the sampling helpers of
``PathDiscretizer`` (``PathDiscretizer.cpp:66-102``): a global parameter
``u in [0, count]`` indexes segment ``floor(u)`` at local parameter
``u - floor(u)``, clamped to the first/last segment outside the range.

A ``PathList`` is a ``PathSegment`` pytree with a leading capacity axis [M]
plus a ``count`` — fixed shapes, mask semantics, so path operations batch and
jit without recompiles as paths change.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nmpc_nav_control_tpu.paths.segment import (
    PathSegment,
    seg_dxy,
    seg_theta,
    seg_theta_holonomic,
    seg_xy,
)

__all__ = ["PathList", "make_path_list", "pose_sample", "vel_sample", "path_capacity"]


class PathList(NamedTuple):
    segs: PathSegment      # every leaf has leading [M]
    count: jnp.ndarray     # [] int32 number of valid segments


def path_capacity(plist: PathList) -> int:
    return plist.segs.cx.shape[0]


def make_path_list(segments, capacity: int) -> PathList:
    """Stack a Python list of PathSegment into a fixed-capacity PathList."""
    n = len(segments)
    assert n <= capacity, f"{n} segments > capacity {capacity}"
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *segments)
    pad = capacity - n

    def pad_leaf(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    segs = jax.tree_util.tree_map(pad_leaf, stacked)
    return PathList(segs=segs, count=jnp.asarray(n, jnp.int32))


def _locate(plist: PathList, sample_u):
    """Global u -> (segment, local u) with the reference clamping
    (``PathDiscretizer.cpp:68-75``).

    Segment selection is a one-hot contraction, NOT a gather: the
    discretizer's arc-length march samples the path hundreds of times per
    tick, and a dynamic-index gather in that loop breaks XLA's elementwise
    fusion into thousands of tiny dispatches (measured ~20x slowdown of the
    whole FollowPath tick under a fleet vmap).  The one-hot form costs
    M*DEG extra FMAs but keeps the entire march fusable; values are exact.
    """
    path_num = jnp.floor(sample_u).astype(jnp.int32)
    u = sample_u - path_num.astype(sample_u.dtype)
    over = path_num >= plist.count
    under = path_num < 0
    path_num = jnp.clip(path_num, 0, plist.count - 1)
    u = jnp.where(over, jnp.ones_like(u), jnp.where(under, jnp.zeros_like(u), u))
    m = plist.segs.cx.shape[0]
    onehot = (jnp.arange(m) == path_num).astype(u.dtype)    # [M]

    # Per-leaf contractions ON PURPOSE: most call sites consume a subset of
    # the leaves, and XLA dead-code-eliminates the unused contractions.  A
    # variant packing all leaves into one [M, K] matmul was tried and
    # measured SLOWER on the fleet tick for exactly that reason (the pack
    # forces every leaf to be computed; see PERFORMANCE.md round-5 notes).
    def sel(leaf):
        w = onehot.astype(leaf.dtype) if leaf.dtype != onehot.dtype else onehot
        return jnp.tensordot(w, leaf, axes=1)

    seg = PathSegment(
        cx=sel(plist.segs.cx),
        cy=sel(plist.segs.cy),
        ch=sel(plist.segs.ch),
        velocity=sel(plist.segs.velocity),
        frame_id=jnp.sum(
            (jnp.arange(m) == path_num) * plist.segs.frame_id, axis=0),
        length=sel(plist.segs.length),
    )
    return seg, u


def pose_sample(plist: PathList, sample_u, is_holonomic: bool):
    """(x, y, theta) at global u — ``PathDiscretizer::getPoseSample``
    (``PathDiscretizer.cpp:66-90``): non-holonomic theta is the tangent
    heading, +pi when the segment's nominal velocity is negative (reverse
    driving); holonomic theta uses the dedicated heading profile."""
    seg, u = _locate(plist, sample_u)
    x, y = seg_xy(seg, u)
    if is_holonomic:
        theta = seg_theta_holonomic(seg, u)
    else:
        theta = seg_theta(seg, u)
        theta = jnp.where(seg.velocity >= 0, theta, theta + jnp.pi)
    return jnp.stack([x, y, theta])


def vel_sample(plist: PathList, sample_u):
    """(dx/du, dy/du) at global u — ``PathDiscretizer::getVelSample``
    (``PathDiscretizer.cpp:92-102``)."""
    seg, u = _locate(plist, sample_u)
    dx, dy = seg_dxy(seg, u)
    return jnp.stack([dx, dy])
