"""Parallel (associative-scan) Riccati vs the serial implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmpc_nav_control_tpu.qp.parallel_riccati import plqr_solve
from nmpc_nav_control_tpu.qp.riccati import lqr_solve


def _rand_problem(rng, N, nx, nu):
    A = rng.normal(size=(N, nx, nx)) * 0.3 + np.eye(nx) * 0.9
    B = rng.normal(size=(N, nx, nu)) * 0.5
    c = rng.normal(size=(N, nx)) * 0.1
    Qd = rng.uniform(0.1, 2.0, size=(N + 1, nx))
    Rd = rng.uniform(0.5, 2.0, size=(N, nu))
    qx = rng.normal(size=(N + 1, nx))
    qu = rng.normal(size=(N, nu))
    dx0 = rng.normal(size=(nx,))
    return tuple(jnp.asarray(a) for a in (A, B, Qd, Rd, qx, qu, c, dx0))


@pytest.mark.parametrize("N,nx,nu", [(8, 4, 2), (40, 7, 2), (80, 7, 2), (40, 11, 4)])
def test_parallel_matches_serial(N, nx, nu):
    rng = np.random.default_rng(N + nx)
    prob = _rand_problem(rng, N, nx, nu)
    dxs_s, dus_s = lqr_solve(*prob)
    dxs_p, dus_p = plqr_solve(*prob)
    np.testing.assert_allclose(np.asarray(dxs_p), np.asarray(dxs_s), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dus_p), np.asarray(dus_s), rtol=1e-7, atol=1e-8)


def test_parallel_zero_state_weights():
    """Zero Q entries (the reference's velocity states carry zero weight) must
    not break the element composition (no Q^{-1} anywhere)."""
    rng = np.random.default_rng(0)
    N, nx, nu = 20, 7, 2
    A, B, Qd, Rd, qx, qu, c, dx0 = _rand_problem(rng, N, nx, nu)
    Qd = Qd.at[:, 3:].set(0.0)
    dxs_s, dus_s = lqr_solve(A, B, Qd, Rd, qx, qu, c, dx0)
    dxs_p, dus_p = plqr_solve(A, B, Qd, Rd, qx, qu, c, dx0)
    np.testing.assert_allclose(np.asarray(dus_p), np.asarray(dus_s), rtol=1e-7, atol=1e-8)


def test_parallel_vmaps_over_batch():
    rng = np.random.default_rng(3)
    N, nx, nu, Bt = 16, 5, 2, 6
    probs = [_rand_problem(rng, N, nx, nu) for _ in range(Bt)]
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *probs)
    dxs_b, dus_b = jax.vmap(plqr_solve)(*batched)
    dxs_1, dus_1 = plqr_solve(*probs[2])
    np.testing.assert_allclose(np.asarray(dxs_b[2]), np.asarray(dxs_1), rtol=1e-9)
