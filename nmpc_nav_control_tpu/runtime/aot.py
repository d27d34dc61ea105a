"""Ahead-of-time compiled tick artifacts (the generated-capsule analog).

The reference prepares its solvers OFFLINE: CasADi emits C, acados builds
``libacados_ocp_solver_{name}.so``, and the runtime only loads capsules
(``/root/reference/scripts/diff/generate_c_code.py:77-83``, linked at
``CMakeLists.txt:112-114``).  This module is the TPU-native equivalent of
that deployment artifact: ``jax.export`` serializes the FULL jitted control
tick (state machine + path window + discretizer + RTI + fused IPM) to a
portable StableHLO blob that a serving host loads and calls without
tracing, Python model code, or a compile step at start-up (XLA still
specializes the blob to the local chip on first call, hitting the
persistent compile cache).

Artifacts are self-describing: the blob is wrapped with a small JSON header
(geometry, horizon, dt, batch, framework version) so a loader can validate
compatibility before calling.

Not a replacement for the in-process path — ``runtime/node.py`` traces and
jits directly; use AOT artifacts when the serving host must not depend on
the model-definition code (or its exact version), mirroring how the
reference robot runs against pre-built ``.so`` capsules.
"""
from __future__ import annotations

import dataclasses
import io
import json
import struct
from typing import Optional

import jax
import jax.numpy as jnp

from nmpc_nav_control_tpu.control import make_controller
from nmpc_nav_control_tpu.control.state_machine import (
    Measurements,
    node_init,
    node_tick,
)
from nmpc_nav_control_tpu.runtime.config import RobotConfig

__all__ = ["export_tick", "save_tick", "load_tick", "AotTick"]

_MAGIC = b"NMPCAOT1"

_REGISTERED = False


def _register_pytrees() -> None:
    """Register the framework's NamedTuple pytree nodes with jax.export's
    serializer (idempotent; names are stable across versions — they are part
    of the artifact format)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jexport

    from nmpc_nav_control_tpu.control.controllers import CmdVel
    from nmpc_nav_control_tpu.control.state_machine import (
        NodeState,
        TickOutput,
    )
    from nmpc_nav_control_tpu.paths.segment import PathSegment
    from nmpc_nav_control_tpu.paths.windowing import PathWindow
    from nmpc_nav_control_tpu.rti.step import RTIState

    for cls in (NodeState, Measurements, TickOutput, CmdVel,
                PathSegment, PathWindow, RTIState):
        try:
            jexport.register_namedtuple_serialization(
                cls, serialized_name=f"nmpc_nav_control_tpu.{cls.__name__}")
        except ValueError:
            pass  # already registered (re-import, parallel test)
    _REGISTERED = True


def _tick_fn_and_examples(config: RobotConfig, batch: Optional[int],
                          dtype=jnp.float32):
    spec, data = make_controller(
        config.steering_geometry, config.dt, config.horizon,
        dtype=dtype, **config.controller_kwargs(),
    )
    cfg = config.nav

    def tick(state, meas):
        return node_tick(spec, data, cfg, state, meas)

    state0 = node_init(spec, cfg, dtype)
    meas0 = Measurements(
        pose=jnp.zeros(3, dtype),
        vel=jnp.zeros(3, dtype),
        steer_angle=jnp.zeros((), dtype),
        pose_valid=jnp.asarray(True),
        vel_valid=jnp.asarray(True),
        steer_valid=jnp.asarray(True),
    )
    if batch is not None:
        tick_b = jax.vmap(tick)
        state0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), state0)
        meas0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), meas0)
        return tick_b, state0, meas0
    return tick, state0, meas0


def export_tick(config: RobotConfig, batch: Optional[int] = None,
                platforms=("tpu", "cpu"), dtype=jnp.float32) -> bytes:
    """Serialize the jitted control tick for ``config`` to a portable blob.

    ``batch``: None exports the single-robot tick; an int exports the
    vmapped fleet tick over that many scenario lanes.  ``platforms``: the
    lowering targets baked into the artifact (a loader may call it on any
    of them).

    Returns bytes: magic | u32 header length | JSON header | jax.export blob.
    """
    from jax import export as jexport

    _register_pytrees()
    tick, state0, meas0 = _tick_fn_and_examples(config, batch, dtype)
    args = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        (state0, meas0),
    )
    exported = jexport.export(jax.jit(tick), platforms=list(platforms))(*args)
    blob = exported.serialize()
    header = json.dumps({
        "geometry": config.steering_geometry,
        "horizon": config.horizon,
        "dt": config.dt,
        "batch": batch,
        "dtype": jnp.dtype(dtype).name,
        "platforms": list(platforms),
    }).encode()
    out = io.BytesIO()
    out.write(_MAGIC)
    out.write(struct.pack("<I", len(header)))
    out.write(header)
    out.write(blob)
    return out.getvalue()


@dataclasses.dataclass(frozen=True)
class AotTick:
    """A loaded AOT tick: ``meta`` (the JSON header dict) + ``__call__``
    with the exported (state, measurements) -> (state, TickOutput)
    signature (pytrees, not flat lists)."""

    meta: dict
    _exported: object

    def __call__(self, state, meas):
        return self._exported.call(state, meas)


def load_tick(data: bytes) -> AotTick:
    """Deserialize an :func:`export_tick` artifact."""
    from jax import export as jexport

    _register_pytrees()
    if data[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not an nmpc_nav_control_tpu AOT artifact")
    off = len(_MAGIC)
    (hlen,) = struct.unpack_from("<I", data, off)
    off += 4
    meta = json.loads(data[off:off + hlen].decode())
    exported = jexport.deserialize(bytearray(data[off + hlen:]))
    return AotTick(meta=meta, _exported=exported)


def save_tick(config: RobotConfig, path: str,
              batch: Optional[int] = None, platforms=("tpu", "cpu")) -> dict:
    """Export and write the artifact; returns the header dict."""
    data = export_tick(config, batch=batch, platforms=platforms)
    with open(path, "wb") as f:
        f.write(data)
    return load_tick(data).meta
