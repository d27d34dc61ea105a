"""Fleet runner: batched mixed-geometry scenario sweeps on a device mesh.

The reference controls exactly one robot per process (SURVEY.md §2.4).  The
fleet runner drives thousands of simultaneous (robot, path, initial-pose)
scenarios per chip — the BASELINE.json config[4] workload: "batched
4096-scenario mixed-geometry sweep ... with ICI QP reductions".

Geometries have different state/input dimensions, so a mixed fleet is one
batched, sharded ``node_tick`` program per geometry (each jitted once; XLA
runs them back-to-back inside a tick).  Scenario batches shard over the
mesh's ``data`` axis; all collectives are XLA-inserted from the sharding
annotations.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nmpc_nav_control_tpu.control.state_machine import (
    Measurements,
    NavConfig,
    NodeState,
    node_init,
    node_tick,
)
from nmpc_nav_control_tpu.control.controllers import ControllerSpec
from nmpc_nav_control_tpu.ocp.spec import OCPData

__all__ = ["FleetGroup", "Fleet"]


@dataclasses.dataclass
class FleetGroup:
    """One geometry's scenario batch."""

    spec: ControllerSpec
    data: OCPData
    cfg: NavConfig
    batch: int

    def init_states(self, dtype=jnp.float32) -> NodeState:
        s0 = node_init(self.spec, self.cfg, dtype)
        return jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (self.batch,) + (1,) * x.ndim), s0
        )


class Fleet:
    """Mixed-geometry fleet of batched controllers on an optional mesh."""

    def __init__(self, groups: Dict[str, FleetGroup], mesh=None,
                 dtype=jnp.float32):
        self.groups = groups
        self.mesh = mesh
        self.dtype = dtype
        self.states: Dict[str, NodeState] = {}
        self._ticks = {}
        for name, g in groups.items():
            states = self._shard_in(g.init_states(dtype))
            fn = jax.vmap(
                lambda s, m, g=g: node_tick(g.spec, g.data, g.cfg, s, m)
            )
            if mesh is not None:
                shard = NamedSharding(mesh, P("data"))
                fn = jax.jit(fn, in_shardings=(shard, shard),
                             out_shardings=(shard, shard))
            else:
                fn = jax.jit(fn)
            self.states[name] = states
            self._ticks[name] = fn

    def _shard_in(self, tree):
        """Move host inputs onto the mesh's ``data`` axis.

        Single process: a plain sharded ``device_put``.  Multi-process
        (``jax.distributed``): each host contributes its LOCAL lanes
        (``FleetGroup.batch`` = lanes per host) and leaves are assembled
        into global arrays via ``make_array_from_process_local_data`` —
        the host-local ingest of ``parallel/multihost.py``.  Leaves that
        are already committed global arrays pass through untouched.
        """
        if self.mesh is None:
            return tree
        shard = NamedSharding(self.mesh, P("data"))
        multi = jax.process_count() > 1

        def one(x):
            if isinstance(x, jax.Array) and getattr(x, "sharding", None) == shard:
                return x
            if multi:
                from nmpc_nav_control_tpu.parallel.multihost import (
                    local_to_global,
                )
                return local_to_global(self.mesh, x)
            return jax.device_put(x, shard)

        return jax.tree_util.tree_map(one, tree)

    def set_states(self, name: str, states: NodeState) -> None:
        """Replace a group's state batch (e.g. after batched goal/path
        injection built with vmapped ``on_goal_pose`` / ``on_path_set``)."""
        self.states[name] = self._shard_in(states)

    def tick(self, measurements: Dict[str, Measurements]):
        """Advance every group one control cycle.  Returns {name: TickOutput}."""
        outs = {}
        for name, meas in measurements.items():
            self.states[name], outs[name] = self._ticks[name](
                self.states[name], self._shard_in(meas)
            )
        return outs

    @property
    def total_scenarios(self) -> int:
        return sum(g.batch for g in self.groups.values())
