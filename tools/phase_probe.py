"""Phase breakdown of one control tick on the real TPU.

Times, via the chained-slope method (see PERFORMANCE.md), the marginal cost
of: (1) the full controller tick, (2) the box-QP solve alone (tiled IPM incl.
to/from_tiles), (3) the RK4+jacfwd linearization alone, (4) the QP-data
tiling transposes alone.  Prints one JSON line per phase.

Usage: python tools/phase_probe.py [geometry] [N] [B]
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

GEOM = sys.argv[1] if len(sys.argv) > 1 else "diff"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 40
B = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
REPS = int(os.environ.get("BENCH_REPS", "10"))
K_LO, K_HI = 1, 33


def slope(run, args):
    outs = {}
    for k in (K_LO, K_HI):
        f = run(k)
        jax.block_until_ready(f(*args))   # compile + warm
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            times.append(time.perf_counter() - t0)
        outs[k] = float(np.min(times))
    return (outs[K_HI] - outs[K_LO]) / (K_HI - K_LO)


def emit(name, per_step):
    print(json.dumps({
        "phase": name, "per_batch_ms": round(per_step * 1e3, 4),
        "per_solve_us": round(per_step / B * 1e6, 4),
        "config": {"geometry": GEOM, "N": N, "batch": B},
    }), flush=True)


sys.path.insert(0, "/root/repo")
import bench

spec, data = bench._build(jnp, GEOM, N)
from nmpc_nav_control_tpu.control import controller_init, controller_step
from nmpc_nav_control_tpu.ocp.integrator import linearize_trajectory
from nmpc_nav_control_tpu.qp.ipm import BoxQP, solve_box_qp
from nmpc_nav_control_tpu.ops.pallas_riccati import to_tiles
from nmpc_nav_control_tpu.ops.pallas_ipm import pack_sparse

dtype = jnp.float32
m = spec.dims.model
nx, nu = m.nx, m.nu
rng = np.random.default_rng(0)

# ---------------- full tick ----------------
state0 = controller_init(spec, dtype)
states = jax.tree_util.tree_map(
    lambda x: jnp.tile(x[None], (B,) + (1,) * x.ndim), state0)
poses = jnp.asarray(rng.normal(size=(B, 3)) * 0.1, dtype)
vels = jnp.asarray(rng.normal(size=(B, 3)) * 0.1, dtype)
trajs = jnp.zeros((B, N + 1, 3), dtype).at[:, 0, 0].set(1.0)
n_valids = jnp.ones((B,), jnp.int32)


def tick_run(k):
    @jax.jit
    def f(states):
        def body(carry, _):
            st, cmd, stats = jax.vmap(
                lambda s, p, v, t, n: controller_step(spec, data, s, p, v, t, n)
            )(carry, poses, vels, trajs, n_valids)
            return st, stats.kkt_res
        st, kkts = jax.lax.scan(body, states, None, length=k)
        # consume EVERY per-tick output the production loop reads, or XLA
        # dead-code-eliminates real work (this is how the KKT-scan cost was
        # found — and hidden).
        return st.xs.sum() + kkts.sum()
    return f


emit("full_tick", slope(tick_run, (states,)))

# ---------------- shared QP data ----------------
xs = jnp.asarray(rng.normal(size=(B, N + 1, nx)) * 0.1, dtype)
us = jnp.asarray(rng.normal(size=(B, N, nu)) * 0.1, dtype)
ps = jnp.tile(data.p[None], (B, 1))

lin_v = jax.vmap(lambda x, u, p: linearize_trajectory(m.f, spec.dims.dt, x, u, p))
x_next, A, B_ = lin_v(xs, us, ps)
c = x_next - xs[:, 1:]
q = jnp.abs(jnp.asarray(rng.normal(size=(nx,)), dtype)) + 0.1
r = jnp.abs(jnp.asarray(rng.normal(size=(nu,)), dtype)) + 0.1
Qd = jnp.tile(q[None, None], (B, N + 1, 1))
Rd = jnp.tile(r[None, None], (B, N, 1))
qx = jnp.asarray(rng.normal(size=(B, N + 1, nx)) * 0.1, dtype)
qu = jnp.asarray(rng.normal(size=(B, N, nu)) * 0.1, dtype)
nbx, nbu = len(m.idxbx), len(m.idxbu)
lbx = -jnp.ones((B, N, nbx), dtype); ubx = jnp.ones((B, N, nbx), dtype)
lbu = -jnp.ones((B, N, nbu), dtype); ubu = jnp.ones((B, N, nbu), dtype)
dx0 = jnp.zeros((B, nx), dtype)
qp = BoxQP(A=A, B=B_, c=c, Qd=Qd, qx=qx, Rd=Rd, qu=qu, dx0=dx0,
           lbx=lbx, ubx=ubx, lbu=lbu, ubu=ubu)

# ---------------- QP solve only (chained through dx0) ----------------


def qp_run(k):
    @jax.jit
    def f(dx0):
        def body(carry, _):
            q2 = qp._replace(dx0=carry)
            sol = jax.vmap(
                lambda qq: solve_box_qp(qq, m.idxbx, m.idxbu,
                                        iters=spec.rti.ipm_iters,
                                        spars=spec.rti.spars)
            )(q2)
            return 0.01 * jnp.tanh(sol.dxs[:, 1]), sol.mu
        out, mus = jax.lax.scan(body, dx0, None, length=k)
        return out.sum()
    return f


emit("qp_solve", slope(qp_run, (dx0,)))

# ---------------- linearization only (chained through xs) ----------------


def lin_run(k):
    @jax.jit
    def f(xs):
        def body(carry, _):
            xn, A, Bm = lin_v(carry, us, ps)
            s = 1e-9 * (A.sum(axis=(1, 2, 3)) + Bm.sum(axis=(1, 2, 3)))
            new = carry.at[:, 1:].set(0.9 * carry[:, 1:] + 0.1 * xn + s[:, None, None])
            return new, None
        out, _ = jax.lax.scan(body, xs, None, length=k)
        return out.sum()
    return f


emit("linearize", slope(lin_run, (xs,)))

# ---------------- tiling transposes only ----------------
asp, bsp = spec.rti.spars
nnzA = sum(sum(r) for r in asp)
nnzB = sum(sum(r) for r in bsp)


def tile_run(k):
    @jax.jit
    def f(A, Bm):
        def body(carry, _):
            Aa, Bb = carry
            At = to_tiles(pack_sparse(Aa, asp), (nnzA,))
            Bt = to_tiles(pack_sparse(Bb, bsp), (nnzB,))
            Qt = to_tiles(Qd, (nx,))
            qxt = to_tiles(qx, (nx,))
            Rt = to_tiles(Rd, (nu,))
            qut = to_tiles(qu, (nu,))
            ct = to_tiles(c, (nx,))
            s = (At.sum() + Bt.sum() + Qt.sum() + qxt.sum() + Rt.sum()
                 + qut.sum() + ct.sum()) * 1e-9
            return (Aa + s, Bb + s), None
        (Aa, Bb), _ = jax.lax.scan(body, (A, Bm), None, length=k)
        return Aa.sum() + Bb.sum()
    return f


emit("tile_transpose", slope(tile_run, (A, B_)))

# ---------------- yref build only (chained through the seed) ----------------
from nmpc_nav_control_tpu.rti.step import build_yref

yref_v = jax.vmap(lambda th, t, n: build_yref(N, th, t, n))
thetas = jnp.asarray(rng.normal(size=(B,)) * 0.1, dtype)


def yref_run(k):
    @jax.jit
    def f(th):
        def body(carry, _):
            y = yref_v(carry, trajs, n_valids)
            return carry + 1e-9 * y.sum(axis=(1, 2)), None
        out, _ = jax.lax.scan(body, th, None, length=k)
        return out.sum()
    return f


emit("yref_build", slope(yref_run, (thetas,)))
