"""Mesh construction and scenario-batch sharding.

The reference is a single-threaded, single-robot process (SURVEY.md §2.4);
scale here comes from two first-class axes:

  - **data** — the scenario batch (robot x path-segment x initial-pose),
    sharded over chips with ``NamedSharding``; each lane is one robot.
  - **stage** — the horizon axis; the associative-scan Riccati
    (``qp/parallel_riccati.py``) lets XLA partition the stage reduction with
    ICI collectives instead of a serial O(N) loop.

Nothing here talks to NCCL/MPI — collectives are XLA-inserted from sharding
annotations (the scaling-book recipe: pick a mesh, annotate, let XLA insert
collectives).
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_leading_axis", "replicate"]


def make_mesh(axis_sizes: Sequence[int] = None, axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    ``make_mesh()`` -> 1D ("data",) mesh over all devices.
    ``make_mesh((4, 2), ("data", "stage"))`` -> 2D mesh.
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    n = int(np.prod(axis_sizes))
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def shard_leading_axis(tree, mesh: Mesh, axis: str = "data"):
    """Place every leaf with its leading axis sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))

    def put(leaf):
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, sharding), tree)
