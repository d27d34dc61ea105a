"""Checkpoint / resume for controller state.

The reference has no on-disk checkpointing — its warm-start state lives
implicitly inside the acados capsule plus the controller's carried ``x0``
(SURVEY.md §5).  Here the entire navigation state (solver warm start, path
window, status machine) is one explicit pytree, so checkpointing is a flat
array dump: save mid-mission, restart the process, resume the same mission
with a warm solver.

Format: ``.npz`` with flattened leaf arrays + a structure descriptor.  No
orbax dependency (works in minimal deployments); arrays load back with the
dtypes they were saved with.
"""
from __future__ import annotations

import json

import jax
import numpy as np

__all__ = ["save_state", "load_state"]


def save_state(path: str, state) -> None:
    """Save any pytree of arrays (NodeState, RTIState, batched fleets...)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_state(path: str, like):
    """Load a checkpoint into the structure of ``like`` (a template pytree
    with the same treedef, e.g. a freshly ``node_init``-ed state).

    Shapes and dtypes must match the template; a mismatch raises.
    """
    import jax.numpy as jnp

    with np.load(path) as data:
        leaves_t, treedef = jax.tree_util.tree_flatten(like)
        if "__treedef__" in data.files:
            saved_td = json.loads(bytes(data["__treedef__"]).decode())
            if saved_td != str(treedef):
                raise ValueError(
                    "checkpoint pytree structure does not match the template:\n"
                    f"  checkpoint: {saved_td}\n"
                    f"  template:   {treedef}"
                )
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        if n != len(leaves_t):
            raise ValueError(
                f"checkpoint has {n} leaves, template has {len(leaves_t)}"
            )
        leaves = []
        for i, tmpl in enumerate(leaves_t):
            arr = data[f"leaf_{i}"]
            if tuple(arr.shape) != tuple(np.shape(tmpl)):
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != template "
                    f"shape {np.shape(tmpl)}"
                )
            leaves.append(jnp.asarray(arr, dtype=tmpl.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)
