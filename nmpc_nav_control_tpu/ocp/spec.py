"""OCP specification: static dimensions + traced numeric data.

Mirrors what the reference bakes into each generated acados capsule and then
overrides at runtime:

  - horizon N = ceil(tf_ini * freq), dt = 1/freq
    (``scripts/diff/common.py:5-10``; defaults tf_ini=2.0 s, freq=40 -> N=80)
  - NONLINEAR_LS cost with y = (x, u), W = blkdiag(diag(Q), diag(R)),
    terminal y_e = x with diagonal W_e
    (``scripts/diff/generate_c_code.py:29-39``)
  - box bounds on selected state indices at stages 1..N + terminal and on all
    inputs at stages 0..N-1 (``generate_c_code.py:44-57``)
  - at runtime the controller ctor overwrites W with the YAML (Q, R) diagonals
    and sets W_e to the *Q* part of the same runtime diagonal — i.e. the
    baked-in QN from the codegen YAML is replaced by Q
    (``NMPCNavControlDiff.cpp:24-43`` writes W_e[i,i] = W_diag[i]).

``OCPDims`` is hashable/static; ``OCPData`` is a pytree of arrays that can be
traced, vmapped over a scenario batch, and sharded.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from nmpc_nav_control_tpu.models.base import ModelSpec

__all__ = ["OCPDims", "OCPData"]


@dataclasses.dataclass(frozen=True)
class OCPDims:
    """Static OCP dimensions: model, horizon length, sample time."""

    model: ModelSpec
    N: int
    dt: float

    @staticmethod
    def from_freq(model: ModelSpec, tf_ini: float = 2.0, freq: int = 40) -> "OCPDims":
        """N = ceil(tf_ini / dt) as in the reference (``scripts/*/common.py:5-10``)."""
        import math

        dt = 1.0 / float(freq)
        N = int(math.ceil(tf_ini / dt))
        return OCPDims(model=model, N=N, dt=dt)


class OCPData(NamedTuple):
    """Per-problem numeric OCP data (a pytree; leading batch axes allowed).

    Attributes:
      p:      [npar] model parameters (dist_b/tau_v etc., pushed per stage via
              ``update_params`` in the reference, ``NMPCNavControlDiff.cpp:44-46``;
              stage-constant here).
      lbx/ubx:[nbx] bounds on x[idxbx] at stages 1..N and terminal.
      lbu/ubu:[nbu] bounds on u[idxbu] at stages 0..N-1.
      q_diag: [nx] stage state-cost diagonal (runtime Q).
      r_diag: [nu] stage input-cost diagonal (runtime R).
      qe_diag:[nx] terminal cost diagonal (runtime W_e; equals q_diag at
              construction per the reference runtime override, and is scaled
              adaptively per solve for the diff geometry).
    """

    p: jnp.ndarray
    lbx: jnp.ndarray
    ubx: jnp.ndarray
    lbu: jnp.ndarray
    ubu: jnp.ndarray
    q_diag: jnp.ndarray
    r_diag: jnp.ndarray
    qe_diag: jnp.ndarray
