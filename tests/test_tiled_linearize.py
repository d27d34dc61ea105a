"""Parity of the tiled packed linearization vs the dense jacfwd path.

``ops/tiled_linearize.linearize_packed_tiled`` must produce exactly the
tiles that [dense ``linearize_trajectory`` -> ``pack_sparse`` ->
``to_tiles``] produces — it is the same math in a fusion-friendly layout
(see the module docstring for the XLA fusion-ceiling story it fixes).
Pure XLA, so it runs on the CPU mesh as-is.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmpc_nav_control_tpu.models import diff, omni4, tric
from nmpc_nav_control_tpu.ocp.integrator import linearize_trajectory
from nmpc_nav_control_tpu.ocp.sparsity import detect_jacobian_sparsity
from nmpc_nav_control_tpu.ops.pallas_ipm import pack_sparse
from nmpc_nav_control_tpu.ops.pallas_riccati import to_tiles
from nmpc_nav_control_tpu.ops.tiled_linearize import linearize_packed_tiled

DT = 0.025
CASES = [
    ("diff", diff.f, 7, 2, [0.27, 0.1]),
    ("omni4", omni4.f, 11, 4, [0.535, 0.1]),
    ("tric", tric.f, 7, 2, [1.05, 0.1, 0.1]),
]


@pytest.mark.parametrize("name,f,nx,nu,p", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("N", [40, 81])  # incl. a non-multiple of the chunk
def test_matches_dense_pack_tile(name, f, nx, nu, p, N):
    B = 1024
    dtype = jnp.float32
    pj = jnp.asarray(p, dtype)
    spars = detect_jacobian_sparsity(f, DT, nx, nu, pj)
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.normal(size=(B, N + 1, nx)) * 0.2, dtype)
    us = jnp.asarray(rng.normal(size=(B, N, nu)) * 0.2, dtype)

    At, Bt, xnt = jax.jit(
        lambda a, b: linearize_packed_tiled(f, DT, a, b, pj, *spars)
    )(xs, us)

    xn_d, A_d, B_d = jax.jit(jax.vmap(
        lambda x, u: linearize_trajectory(f, DT, x, u, pj)))(xs, us)
    asp, bsp = spars
    nnzA = sum(sum(r) for r in asp)
    nnzB = sum(sum(r) for r in bsp)
    np.testing.assert_allclose(np.asarray(At),
                               np.asarray(to_tiles(pack_sparse(A_d, asp),
                                                   (nnzA,))),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(Bt),
                               np.asarray(to_tiles(pack_sparse(B_d, bsp),
                                                   (nnzB,))),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(xnt),
                               np.asarray(to_tiles(xn_d, (nx,))),
                               rtol=2e-5, atol=2e-6)


def test_batched_params():
    """Per-scenario model parameters ([B, npar]) flow through the
    batch-minor layout correctly."""
    B, N = 1024, 12
    dtype = jnp.float32
    rng = np.random.default_rng(5)
    p_b = jnp.asarray(np.stack([rng.uniform(0.2, 0.4, B),
                                rng.uniform(0.05, 0.2, B)], -1), dtype)
    spars = detect_jacobian_sparsity(diff.f, DT, 7, 2,
                                     jnp.asarray([0.27, 0.1], dtype))
    xs = jnp.asarray(rng.normal(size=(B, N + 1, 7)) * 0.2, dtype)
    us = jnp.asarray(rng.normal(size=(B, N, 2)) * 0.2, dtype)
    At, Bt, xnt = jax.jit(
        lambda a, b, pp: linearize_packed_tiled(diff.f, DT, a, b, pp, *spars)
    )(xs, us, p_b)
    xn_d, A_d, B_d = jax.jit(jax.vmap(
        lambda x, u, pp: linearize_trajectory(diff.f, DT, x, u, pp)))(
            xs, us, p_b)
    asp, bsp = spars
    nnzA = sum(sum(r) for r in asp)
    np.testing.assert_allclose(
        np.asarray(At),
        np.asarray(to_tiles(pack_sparse(A_d, asp), (nnzA,))),
        rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(xnt),
                               np.asarray(to_tiles(xn_d, (7,))),
                               rtol=2e-5, atol=2e-6)
