"""Fused Pallas Riccati kernels vs the XLA reference path.

On CPU CI these run through the Pallas interpreter
(``NMPC_TPU_PALLAS_INTERPRET=1`` — same program, no Mosaic); on a
TPU-attached session they exercise the compiled kernels directly:

    JAX_PLATFORMS=tpu pytest tests/test_pallas_riccati.py
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _on_tpu():
    plat = jax.devices()[0].platform.lower()
    return "tpu" in plat or "axon" in plat


@pytest.fixture(autouse=True)
def _interpret_on_cpu(monkeypatch):
    if not _on_tpu():
        monkeypatch.setenv("NMPC_TPU_PALLAS_INTERPRET", "1")


@pytest.mark.parametrize("nx,nu", [(7, 2), (11, 4)])
def test_pallas_factor_and_solve_match_xla(nx, nu):
    from nmpc_nav_control_tpu.ops.pallas_riccati import (
        BT,
        riccati_factor_batched,
        riccati_solve_batched,
    )
    from nmpc_nav_control_tpu.qp.riccati import riccati_factor, riccati_solve

    B, N = BT, 12
    dtype = jnp.float32
    rng = np.random.default_rng(nx)
    A = jnp.asarray(rng.normal(size=(B, N, nx, nx)) * 0.1 + np.eye(nx), dtype)
    Bm = jnp.asarray(rng.normal(size=(B, N, nx, nu)) * 0.3, dtype)
    Qd = jnp.abs(jnp.asarray(rng.normal(size=(B, N + 1, nx)), dtype)) + 0.1
    Rd = jnp.ones((B, N, nu), dtype)
    qx = jnp.asarray(rng.normal(size=(B, N + 1, nx)), dtype)
    qu = jnp.asarray(rng.normal(size=(B, N, nu)), dtype)
    c = jnp.asarray(rng.normal(size=(B, N, nx)) * 0.1, dtype)
    dx0 = jnp.asarray(rng.normal(size=(B, nx)) * 0.1, dtype)

    ref = jax.jit(jax.vmap(riccati_factor))(A, Bm, Qd, Rd)
    Ps, Ks, Ls = jax.jit(riccati_factor_batched)(A, Bm, Qd, Rd)
    # Full Ps contract including row 0 (the final backward carry P_0).
    np.testing.assert_allclose(np.asarray(Ps), np.asarray(ref.Ps),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Ks), np.asarray(ref.Ks),
                               atol=5e-5, rtol=1e-4)

    dxs_r, dus_r = jax.jit(jax.vmap(riccati_solve))(ref, A, Bm, qx, qu, c, dx0)
    dxs_p, dus_p = jax.jit(riccati_solve_batched)(Ps, Ks, Ls, A, Bm, qx, qu, c, dx0)
    np.testing.assert_allclose(np.asarray(dxs_p), np.asarray(dxs_r), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dus_p), np.asarray(dus_r), atol=5e-5)
