"""Active/upcoming path-buffer windowing.

Replaces the reference's ``active_path_`` / ``upcoming_path_`` list logic
(``NMPCNavControlROS.h:77-81``, ``NMPCNavControlROS.cpp:555-610,682-694``)
with fixed-capacity masked arrays:

  - ``ingest``: new path set received -> all valid segments become upcoming,
    buffers cleared, then top-up (``processPathReceived``, ``:555-574``).
  - ``top_up``: move upcoming segments into the active window until its arc
    length reaches ``max_active_path_length`` (default 5 m), stopping at a
    velocity-sign change or frame-id change between the active tail and the
    upcoming head (``processPathBuffers``, ``:576-595``).
  - ``pop_completed``: drop ``floor(u)`` fully-passed segments from the front
    and rebase u (``processNearestPoint``, ``:603-609``).
  - ``rotate_end_of_curve``: end-of-trajectory with upcoming segments left:
    drop the front active segment and append the next upcoming one
    (``processFollowPath``, ``:687-689``).

State layout: one flat segment store ``segs`` [CAP] plus three cursors
  head          — index of the first active segment,
  active_count  — number of active segments,
  total_count   — number of stored segments from ``head`` on (active +
                  upcoming); upcoming = segs[head+active : head+total].
Segments before ``head`` are dead (the store is consumed left to right; a new
ingest resets it).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nmpc_nav_control_tpu.paths.pathlist import PathList
from nmpc_nav_control_tpu.paths.segment import PathSegment

__all__ = ["PathWindow", "window_init", "ingest", "top_up", "pop_completed",
           "rotate_end_of_curve", "active_path_list", "active_length",
           "path_remains", "select_rows"]


def select_rows(segs: PathSegment, idx) -> PathSegment:
    """Row-select ``segs[idx]`` (idx [] or [K]) as a one-hot contraction.

    A dynamic-index gather here sits on the per-tick hot path under a fleet
    ``vmap``, where XLA's batched-gather lowering serializes; the one-hot
    matmul form stays fused (same rationale as ``pathlist._locate``, where
    it was measured at ~20x).  int leaves (frame_id) ride an f32 dot and
    round-trip exactly (values are small ids)."""
    m = segs.frame_id.shape[0]
    onehot = (jnp.expand_dims(idx, -1) == jnp.arange(m)).astype(segs.cx.dtype)

    def sel(leaf):
        if leaf.dtype == segs.cx.dtype:
            return jnp.tensordot(onehot, leaf, axes=1)
        out = jnp.tensordot(onehot, leaf.astype(segs.cx.dtype), axes=1)
        return jnp.round(out).astype(leaf.dtype)

    return jax.tree_util.tree_map(sel, segs)


class PathWindow(NamedTuple):
    segs: PathSegment        # leaves with leading [CAP]
    head: jnp.ndarray        # [] int32
    active_count: jnp.ndarray
    total_count: jnp.ndarray # active + upcoming (counted from head)


def window_init(capacity: int, dtype=jnp.float32) -> PathWindow:
    from nmpc_nav_control_tpu.paths.segment import DEG

    z = jnp.zeros((capacity, DEG), dtype)
    segs = PathSegment(
        cx=z, cy=z, ch=z,
        velocity=jnp.zeros((capacity,), dtype),
        frame_id=jnp.zeros((capacity,), jnp.int32),
        length=jnp.zeros((capacity,), dtype),
    )
    zero = jnp.zeros((), jnp.int32)
    return PathWindow(segs=segs, head=zero, active_count=zero, total_count=zero)


def ingest(win: PathWindow, new_segs: PathSegment, n_new,
           max_active_path_length: float) -> PathWindow:
    """New path set: clear both buffers, keep only segments with a valid
    frame id, then top-up the active window (``:566-573``).

    ``new_segs`` leaves have leading [CAP] (pad arbitrarily); ``n_new`` is the
    number of candidate rows.  Rows with frame_id == 0 are dropped (the
    reference skips empty frame strings, ``:569``).
    """
    cap = win.segs.frame_id.shape[0]
    idx = jnp.arange(cap)
    valid = (idx < n_new) & (new_segs.frame_id != 0)
    # Compact valid segments to the front (stable order).
    order = jnp.argsort(~valid, stable=True)
    segs = jax.tree_util.tree_map(lambda leaf: leaf[order], new_segs)
    n_valid = jnp.sum(valid).astype(jnp.int32)
    win = PathWindow(
        segs=segs,
        head=jnp.zeros((), jnp.int32),
        active_count=jnp.zeros((), jnp.int32),
        total_count=n_valid,
    )
    return top_up(win, jnp.zeros(()), max_active_path_length)


def active_length(win: PathWindow, active_path_u) -> jnp.ndarray:
    """Arc length of the active window; the first segment contributes
    ``length * (1 - u_frac)`` (the reference's 'aproximation', ``:578-582``)."""
    cap = win.segs.frame_id.shape[0]
    idx = jnp.arange(cap)
    in_active = (idx >= win.head) & (idx < win.head + win.active_count)
    frac = jnp.where(idx == win.head, 1.0 - active_path_u, 1.0)
    return jnp.sum(jnp.where(in_active, win.segs.length * frac, 0.0))


def top_up(win: PathWindow, active_path_u, max_active_path_length: float) -> PathWindow:
    """Extend the active window to ~max_active_path_length meters, stopping
    at velocity-sign or frame-id barriers (``processPathBuffers``, ``:576-595``)."""
    cap = win.segs.frame_id.shape[0]
    length0 = active_length(win, active_path_u)

    iota = jnp.arange(cap)

    def pick(leaf, i):
        # masked-sum row select: scalar dynamic-index gathers in this
        # unrolled loop fragment the fused tick under a fleet vmap
        return jnp.sum(jnp.where(iota == i, leaf, jnp.zeros_like(leaf)))

    def body(carry, _):
        active_count, length = carry
        upcoming_left = win.total_count - active_count
        tail_idx = jnp.clip(win.head + active_count - 1, 0, cap - 1)
        head_up = jnp.clip(win.head + active_count, 0, cap - 1)
        sign_break = (pick(win.segs.velocity, tail_idx)
                      * pick(win.segs.velocity, head_up)) < 0.0
        frame_break = (pick(win.segs.frame_id, tail_idx)
                       != pick(win.segs.frame_id, head_up))
        barrier = (active_count > 0) & (sign_break | frame_break)
        take = (length < max_active_path_length) & (upcoming_left > 0) & ~barrier
        new_len = length + pick(win.segs.length, head_up)
        return (
            active_count + take.astype(jnp.int32),
            jnp.where(take, new_len, length),
        ), None

    (active_count, _), _ = jax.lax.scan(
        body, (win.active_count, length0), None, length=cap, unroll=True
    )   # capacity-bounded scalar loop: unrolled, loop overhead dominates
    return win._replace(active_count=active_count)


def pop_completed(win: PathWindow, active_path_u):
    """Drop floor(u) passed segments; rebase u (``processNearestPoint``,
    ``:603-609``).  Returns (window, rebased u)."""
    n_pop = jnp.floor(active_path_u).astype(jnp.int32)
    n_pop = jnp.clip(n_pop, 0, win.active_count)
    return (
        win._replace(
            head=win.head + n_pop,
            active_count=win.active_count - n_pop,
            total_count=win.total_count - n_pop,
        ),
        active_path_u - n_pop.astype(active_path_u.dtype),
    )


def rotate_end_of_curve(win: PathWindow) -> PathWindow:
    """End-of-trajectory with upcoming left: pop the front active segment and
    pull in the next upcoming one (``processFollowPath``, ``:687-689``)."""
    has_upcoming = win.total_count > win.active_count
    return win._replace(
        head=win.head + has_upcoming.astype(jnp.int32),
        total_count=win.total_count - has_upcoming.astype(jnp.int32),
        # active_count unchanged: one popped, one appended.
    )


def active_path_list(win: PathWindow, capacity: int) -> PathList:
    """View the active window as a PathList starting at index 0.

    ``capacity`` is the static output size (>= max active segments)."""
    idx = win.head + jnp.arange(capacity)
    idx = jnp.clip(idx, 0, win.segs.frame_id.shape[0] - 1)
    segs = select_rows(win.segs, idx)
    return PathList(segs=segs, count=jnp.minimum(win.active_count, capacity))


def path_remains(win: PathWindow, active_path_u):
    """The ``patch_remains`` status value: active + upcoming segment count
    minus the consumed fraction (``pubControlStatus``, ``:373-377``)."""
    total = win.total_count.astype(active_path_u.dtype)
    return jnp.where(total > 0, total - active_path_u, total)
