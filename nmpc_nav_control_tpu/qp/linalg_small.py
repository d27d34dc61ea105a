"""Tiny-matrix linear algebra, unrolled for TPU batching.

The stage blocks of this problem family are minuscule (nu in {2, 4},
nx in {7, 11}) — far below MXU tile size.  BLASFEO solves this on CPU with
panel-major micro-kernels; the TPU-native equivalent is to keep the matrix
dimensions *unrolled as static scalar index arithmetic* and let the scenario
batch fill the VPU lanes: every operation below is elementwise over arbitrary
leading batch dimensions, so ``vmap``/sharding over thousands of scenarios
maps each lane to one robot.  (Replaces the role of BLASFEO dense kernels,
reference ``cmake/FindACADOS.cmake:48``, ``NMPCNavControl.h:16-17``.)

All functions take arrays shaped [..., n, n] / [..., n, m] with n known at
trace time and small (<= ~12).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cholesky_small", "cho_solve_small", "solve_spd_small"]


def cholesky_small(M):
    """Unrolled lower Cholesky of an SPD matrix. M: [..., n, n] -> L: [..., n, n]."""
    n = M.shape[-1]
    # Work with scalar slices; build rows as lists then stack once.
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    zero = jnp.zeros_like(M[..., 0, 0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def cho_solve_small(L, rhs):
    """Solve (L L^T) X = rhs given lower Cholesky L.

    L: [..., n, n]; rhs: [..., n] or [..., n, m].
    """
    vec = rhs.ndim == L.ndim - 1
    if vec:
        rhs = rhs[..., None]
    n = L.shape[-1]
    # Forward substitution: L y = rhs
    y = [None] * n
    for i in range(n):
        s = rhs[..., i, :]
        for k in range(i):
            s = s - L[..., i, k][..., None] * y[k]
        y[i] = s / L[..., i, i][..., None]
    # Back substitution: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i][..., None] * x[k]
        x[i] = s / L[..., i, i][..., None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def solve_spd_small(M, rhs, reg: float = 0.0):
    """Solve M X = rhs for SPD M (optionally Tikhonov-regularized)."""
    if reg:
        n = M.shape[-1]
        M = M + reg * jnp.eye(n, dtype=M.dtype)
    return cho_solve_small(cholesky_small(M), rhs)
