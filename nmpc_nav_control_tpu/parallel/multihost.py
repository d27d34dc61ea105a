"""Multi-host fleet scaling: process launch, global meshes, host-local I/O.

The reference has no distributed story at all (one robot, one process —
SURVEY.md §2.4); this module is the new framework's multi-host axis, built
the JAX-native way (no NCCL/MPI analog; collectives are XLA-inserted):

  - every host runs the SAME program and calls :func:`init_distributed`
    (TPU pods auto-discover; elsewhere pass coordinator/process args or the
    standard ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID`` env vars);
  - :func:`global_data_mesh` builds a mesh over ALL chips in the slice with
    the ``data`` (scenario) axis laid out process-major, so each host's
    scenario lanes live on its directly-attached chips — per-tick state
    ingest and command egress stay host-local, and the data-parallel tick
    needs no DCN traffic at all (the ≥90% two-host scaling target in
    BASELINE.json follows from this layout: ticks are embarrassingly
    parallel across hosts; only program dispatch is synchronized);
  - :func:`local_to_global` / :func:`global_to_local` move each host's
    robots in and out of the global sharded arrays
    (``jax.make_array_from_process_local_data`` / addressable shards).

Typical two-host fleet loop (same script on both hosts)::

    init_distributed()                      # or TPU pod auto-detect
    mesh = global_data_mesh()
    fleet = Fleet(groups, mesh=mesh)        # parallel/fleet.py
    local_b = local_batch(global_batch)     # this host's lane count
    while running:
        meas = ingest_local_robots(local_b)             # host-local I/O
        gmeas = local_to_global(mesh, meas)             # no data movement
        outs = fleet.tick(gmeas)
        publish(global_to_local(outs))                  # host-local egress
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_distributed",
    "global_data_mesh",
    "local_batch",
    "local_to_global",
    "global_to_local",
]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX's distributed runtime (idempotent).

    On TPU pods with no arguments this auto-discovers the slice topology.
    Off-pod (or for tests), pass arguments or set ``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``.  Single-process runs (no
    coordinator configured, no pod metadata) are a no-op.
    """
    if jax._src.distributed.global_state.client is not None:  # already up
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if coordinator_address is None and num_processes is None:
        # Single process / no explicit cluster: nothing to initialize unless
        # we're on pod hardware where initialize() can auto-detect.
        try:
            jax.distributed.initialize()
        except Exception:  # not a pod; single-process run
            return
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_data_mesh(axis_name: str = "data", devices=None) -> Mesh:
    """1-D mesh over all global devices, ordered process-major.

    Process-major ordering makes each process's slice of the ``data`` axis
    land on its own local chips, keeping per-tick ingest/egress host-local
    (``jax.devices()`` is already process-major by construction; we sort
    defensively so the layout is guaranteed, not incidental).
    """
    if devices is None:
        devices = jax.devices()
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devices), (axis_name,))


def local_batch(global_batch: int) -> int:
    """This process's share of a scenario batch sharded over ``data``."""
    n = jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by {n} processes"
    )
    return global_batch // n


def local_to_global(mesh: Mesh, tree, axis_name: str = "data"):
    """Assemble per-host arrays into globally sharded arrays (no transfer
    beyond host->local-device).  Each leaf's leading axis is this host's
    lanes; the global leading axis is ``local * process_count``."""

    def one(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1))))
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(one, tree)


def global_to_local(tree):
    """Extract this host's lanes from globally sharded arrays as numpy.

    Shards are concatenated in global-index order, matching the
    process-major layout of :func:`global_data_mesh`.
    """

    def one(x):
        shards = sorted(
            x.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    return jax.tree_util.tree_map(one, tree)
