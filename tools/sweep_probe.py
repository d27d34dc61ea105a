"""Per-sweep timing of the 4 fused IPM Pallas kernels on the real TPU.

Chains each sweep with a data dependence (one output tile perturbs one
input) and reports the marginal per-call time.  Usage:
  python tools/sweep_probe.py [geometry] [N] [B]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench
from nmpc_nav_control_tpu.ops.pallas_ipm import (
    ipm_bwd_fused, ipm_fwd_affine, ipm_bwd_corr, ipm_fwd_corr, pack_sparse)
from nmpc_nav_control_tpu.ops.pallas_riccati import to_tiles

GEOM = sys.argv[1] if len(sys.argv) > 1 else "diff"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 40
B = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
REPS = int(os.environ.get("BENCH_REPS", "10"))
K_LO = int(os.environ.get("K_LO", "64"))
K_HI = int(os.environ.get("K_HI", "512"))

spec, data = bench._build(jnp, GEOM, N)
m = spec.dims.model
nx, nu = m.nx, m.nu
idxbx, idxbu = tuple(m.idxbx), tuple(m.idxbu)
nbx, nbu = len(idxbx), len(idxbu)
asp, bsp = spec.rti.spars
dtype = jnp.float32
rng = np.random.default_rng(0)


def t5(shape_entries, rows):
    return jnp.asarray(rng.normal(size=(B, rows, shape_entries)) * 0.1, dtype)


A = t5(nx * nx, N).reshape(B, N, nx, nx) * 0.1 + jnp.eye(nx)[None, None] * 0.9
Bm = t5(nx * nu, N).reshape(B, N, nx, nu) * 0.05
At = to_tiles(pack_sparse(A, asp), (sum(sum(r) for r in asp),))
Bt = to_tiles(pack_sparse(Bm, bsp), (sum(sum(r) for r in bsp),))
Qdt = to_tiles(jnp.abs(t5(nx, N + 1)) + 0.5, (nx,))
Rdt = to_tiles(jnp.abs(t5(nu, N)) + 0.5, (nu,))
qxt = to_tiles(t5(nx, N + 1), (nx,))
qut = to_tiles(t5(nu, N), (nu,))
ct = to_tiles(t5(nx, N), (nx,))
dxs = to_tiles(t5(nx, N + 1), (nx,))
dus = to_tiles(t5(nu, N), (nu,))
dx0t = to_tiles(t5(nx, 1), (nx,))


def pos(rows, e):
    return to_tiles(jnp.abs(t5(e, rows)) + 0.2, (e,))


s_xl, s_xu = pos(N, nbx), pos(N, nbx)
s_ul, s_uu = pos(N, nbu), pos(N, nbu)
l_xl, l_xu = pos(N, nbx), pos(N, nbx)
l_ul, l_uu = pos(N, nbu), pos(N, nbu)
lbxt, ubxt = -pos(N, nbx), pos(N, nbx)
lbut, ubut = -pos(N, nbu), pos(N, nbu)


def slope(make_run):
    outs = {}
    for k in (K_LO, K_HI):
        f = make_run(k)
        jax.block_until_ready(f())
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            times.append(time.perf_counter() - t0)
        outs[k] = float(np.min(times))
    return (outs[K_HI] - outs[K_LO]) / (K_HI - K_LO)


def emit(name, per):
    print(json.dumps({"sweep": name, "per_call_ms": round(per * 1e3, 4),
                      "per_solve_us_at_8iters": round(per / B * 8e6, 4),
                      "config": {"geometry": GEOM, "N": N, "batch": B}}),
          flush=True)


# sweep 1
def run1(k):
    @jax.jit
    def f():
        def body(carry, _):
            out = ipm_bwd_fused(
                At, Bt, Qdt, Rdt, qxt, qut, ct, carry, dus,
                s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
                lbxt, ubxt, lbut, ubut, idxbx, idxbu, nx, nu,
                reg=1e-8, d_cap=1e10, asp=asp, bsp=bsp)
            mus = out[9]
            return carry + 1e-12 * mus[:, :1, :1], None
        out, _ = jax.lax.scan(body, dxs, None, length=k)
        return out.sum()
    return f


# outputs of sweep 1 reused as fixed inputs for 2-4
o1 = ipm_bwd_fused(At, Bt, Qdt, Rdt, qxt, qut, ct, dxs, dus,
                   s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
                   lbxt, ubxt, lbut, ubut, idxbx, idxbu, nx, nu,
                   reg=1e-8, d_cap=1e10, asp=asp, bsp=bsp)
Kt, Lt, Pct, rdynt, kff_aff, rp_xl, rp_xu, rp_ul, rp_uu, musumt = [
    jax.block_until_ready(x) for x in o1[:10]]


def run2(k):
    @jax.jit
    def f():
        def body(carry, _):
            out = ipm_fwd_affine(
                At, Bt, Kt, carry, rdynt, dx0t,
                s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
                rp_xl, rp_xu, rp_ul, rp_uu,
                idxbx, idxbu, 0.995, nx, nu, asp=asp, bsp=bsp)
            a = out[4]
            return carry + 1e-12 * a[:, :1, :1], None
        out, _ = jax.lax.scan(body, kff_aff, None, length=k)
        return out.sum()
    return f


corr = ipm_fwd_affine(At, Bt, Kt, kff_aff, rdynt, dx0t,
                      s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
                      rp_xl, rp_xu, rp_ul, rp_uu,
                      idxbx, idxbu, 0.995, nx, nu, asp=asp, bsp=bsp)
corr_xl, corr_xu, corr_ul, corr_uu, a_afft, c12t = [
    jax.block_until_ready(x) for x in corr]
sigma_mu = jnp.abs(a_afft) * 1e-3


def run3(k):
    @jax.jit
    def f():
        def body(carry, _):
            kff_c = ipm_bwd_corr(
                At, Bt, Kt, Lt, Pct, Qdt, qxt, carry, Rdt, qut, dus,
                s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
                rp_xl, rp_xu, rp_ul, rp_uu,
                corr_xl, corr_xu, corr_ul, corr_uu, sigma_mu,
                idxbx, idxbu, nx, nu, asp=asp, bsp=bsp)
            return carry + 1e-12 * kff_c[:, :1, :1].sum(2, keepdims=True), None
        out, _ = jax.lax.scan(body, dxs, None, length=k)
        return out.sum()
    return f


kff_c = jax.block_until_ready(ipm_bwd_corr(
    At, Bt, Kt, Lt, Pct, Qdt, qxt, dxs, Rdt, qut, dus,
    s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
    rp_xl, rp_xu, rp_ul, rp_uu,
    corr_xl, corr_xu, corr_ul, corr_uu, sigma_mu,
    idxbx, idxbu, nx, nu, asp=asp, bsp=bsp))


def run4(k):
    @jax.jit
    def f():
        def body(carry, _):
            out = ipm_fwd_corr(
                At, Bt, Kt, carry, rdynt, dx0t,
                s_xl, s_xu, s_ul, s_uu, l_xl, l_xu, l_ul, l_uu,
                rp_xl, rp_xu, rp_ul, rp_uu,
                corr_xl, corr_xu, corr_ul, corr_uu, sigma_mu,
                idxbx, idxbu, 0.995, nx, nu, asp=asp, bsp=bsp)
            alpha = out[11]
            return carry + 1e-12 * alpha[:, :1, :1], None
        out, _ = jax.lax.scan(body, kff_c, None, length=k)
        return out.sum()
    return f


emit("1_bwd_fused", slope(run1))
emit("2_fwd_affine", slope(run2))
emit("3_bwd_corr", slope(run3))
emit("4_fwd_corr", slope(run4))
