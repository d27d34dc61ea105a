"""One-program (batch x stage) 2-D mesh solve of the full box-IPM.

SURVEY.md §2.4 names a combined mesh: the scenario batch on a ``data`` axis
AND the horizon on a ``stage`` axis, in ONE jitted program.  This module
provides exactly that: every per-stage leaf of the batched QP is annotated
[data, stage, ...], every Newton step runs through the log-depth
associative-scan Riccati (``qp/parallel_riccati.plqr_solve``) whose scan
XLA partitions over the stage axis with ICI collectives, and the
slack/multiplier algebra is elementwise (trivially partitioned on both
axes).  No manual collectives: pick the mesh, annotate the shardings, let
XLA insert them (the scaling-book recipe).

Use when the scenario fleet is too big for one chip's lanes AND the horizon
is too long for one core's serial sweep — e.g. N=512 look-ahead studies.
For production N<=80 control the 1-D data mesh + fused serial-sweep kernels
(``qp/ipm_tiled.py``) are faster per solve; this path trades per-solve
efficiency for horizon scalability.

The reference has no distributed analog (single process, SURVEY.md §2.4).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["solve_box_qp_2d", "qp_2d_shardings"]


def qp_2d_shardings(mesh: Mesh, data_axis: str = "data",
                    stage_axis: str = "stage"):
    """Per-leaf NamedShardings for a batched BoxQP on a (data, stage) mesh.

    Leaves shaped [B, N, ...] shard (data, stage); the [B, N+1, ...] cost
    leaves (``Qd``, ``qx``) and ``dx0`` shard on data only — N+1 rows do not
    tile evenly over the stage axis, and those tensors are a vanishing
    fraction of the QP's footprint.
    """
    from nmpc_nav_control_tpu.qp.ipm import BoxQP

    ds = lambda ndim: NamedSharding(                      # noqa: E731
        mesh, P(data_axis, stage_axis, *([None] * (ndim - 2)))
    )
    d_only = lambda ndim: NamedSharding(                  # noqa: E731
        mesh, P(data_axis, *([None] * (ndim - 1)))
    )
    return BoxQP(
        A=ds(4), B=ds(4), c=ds(3), Qd=d_only(3), qx=d_only(3),
        Rd=ds(3), qu=ds(3),
        dx0=d_only(2),
        lbx=ds(3), ubx=ds(3), lbu=ds(3), ubu=ds(3),
    )


def solve_box_qp_2d(
    qp,
    idxbx,
    idxbu,
    mesh: Mesh,
    iters: int = 8,
    data_axis: str = "data",
    stage_axis: str = "stage",
    **kw,
):
    """Solve a BATCHED BoxQP with batch sharded on ``data_axis`` and the
    horizon on ``stage_axis`` of ``mesh``, as one jitted program.

    Numerically identical to ``vmap(solve_box_qp(..., stage_parallel=True))``
    (a CPU-mesh test asserts this); sharding only changes placement.
    Returns an ``IPMSolution`` with leading batch axes, sharded like the
    inputs.
    """
    from nmpc_nav_control_tpu.qp.ipm import solve_box_qp

    idxbx = tuple(int(i) for i in idxbx)
    idxbu = tuple(int(i) for i in idxbu)
    in_shardings = qp_2d_shardings(mesh, data_axis, stage_axis)

    fn = jax.jit(
        jax.vmap(
            lambda q: solve_box_qp(
                q, idxbx, idxbu, iters=iters, stage_parallel=True, **kw
            )
        ),
        in_shardings=(in_shardings,),
    )
    return fn(qp)
