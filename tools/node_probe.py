"""Phase breakdown of the FULL navigation tick (node_tick) on the real TPU.

The fleet metric (``bench.py::_measure_fleet``) drives
``control.state_machine.node_tick`` — projection + windowing + discretizer +
safety/termination + the RTI solve.  This probe times, via the chained-slope
method (PERFORMANCE.md), the marginal per-batch cost of:

  1. full node_tick            (the fleet metric's unit)
  2. controller_step only      (the solve the headline metric measures)
  3. get_next_n_poses only     (arc-length discretizer march)
  4. project_to_path only      (nearest-point projection)
  5. windowing only            (pop_completed + top_up + rotate)

Usage: python tools/node_probe.py [geometry] [N] [B]
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

import bench


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
        "per_robot_us": round(per_step / B * 1e6, 4),
        "config": {"geometry": GEOM, "N": N, "batch": B},
    }), flush=True)


from nmpc_nav_control_tpu.control.state_machine import (
    Measurements, NavConfig, node_init, node_tick, on_path_set,
)
from nmpc_nav_control_tpu.control import controller_step
from nmpc_nav_control_tpu.paths import make_line_segment
from nmpc_nav_control_tpu.paths.discretizer import get_next_n_poses
from nmpc_nav_control_tpu.paths.pathlist import PathList
from nmpc_nav_control_tpu.paths.projection import project_to_path
from nmpc_nav_control_tpu.paths.windowing import (
    active_path_list, pop_completed, top_up,
)

dtype = jnp.float32
spec, data = bench._build(jnp, GEOM, N)
cfg = NavConfig()

seg = make_line_segment((0.0, 0.0), (50.0, 0.0), velocity=0.5)
segs = jax.tree_util.tree_map(
    lambda x: jnp.pad(jnp.asarray(x, dtype)[None],
                      [(0, cfg.path_capacity - 1)] + [(0, 0)] * x.ndim),
    seg,
)
state0 = on_path_set(node_init(spec, cfg, dtype), cfg, segs, 1, 1)
states = jax.tree_util.tree_map(
    lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), state0)
t = jnp.broadcast_to(jnp.asarray(True), (B,))
meas = Measurements(
    pose=jnp.zeros((B, 3), dtype), vel=jnp.zeros((B, 3), dtype),
    steer_angle=jnp.zeros((B,), dtype),
    pose_valid=t, vel_valid=t, steer_valid=t,
)

# ---------------- 1. full node_tick ----------------


def tick_run(k):
    @jax.jit
    def f(states):
        def body(carry, _):
            st, out = jax.vmap(
                lambda s, m: node_tick(spec, data, cfg, s, m)
            )(carry, meas)
            return st, (out.kkt_res, out.cmd.v)
        st, (kkts, vs) = jax.lax.scan(body, states, None, length=k)
        return st.rti.xs.sum() + kkts.sum() + vs.sum()
    return f


emit("node_tick", slope(tick_run, (states,)))

# ---------------- 2. controller_step only ----------------
rng = np.random.default_rng(0)
rtis = states.rti
poses_m = jnp.asarray(rng.normal(size=(B, 3)) * 0.1, dtype)
vels_m = jnp.asarray(rng.normal(size=(B, 3)) * 0.1, dtype)
trajs = jnp.zeros((B, N + 1, 3), dtype).at[:, 0, 0].set(1.0)
n_valids = jnp.full((B,), N + 1, jnp.int32)


def ctrl_run(k):
    @jax.jit
    def f(rtis):
        def body(carry, _):
            st, cmd, stats = jax.vmap(
                lambda s, p, v, t_, n: controller_step(spec, data, s, p, v, t_, n)
            )(carry, poses_m, vels_m, trajs, n_valids)
            return st, (stats.kkt_res, cmd.v)
        st, (kkts, vs) = jax.lax.scan(body, rtis, None, length=k)
        return st.xs.sum() + kkts.sum() + vs.sum()
    return f


emit("controller_step", slope(ctrl_run, (rtis,)))

# ---------------- shared path-batch data ----------------
windows = states.window
plists = jax.vmap(lambda w: active_path_list(w, cfg.path_capacity))(windows)
u0s = jnp.asarray(rng.uniform(0.0, 0.5, size=(B,)), dtype)

# ---------------- 3. discretizer only (march + fast) ----------------
from nmpc_nav_control_tpu.paths.discretizer import get_next_n_poses_fast


def disc_run_with(fn):
    def disc_run(k):
        @jax.jit
        def f(us):
            def body(carry, _):
                poses = jax.vmap(
                    lambda pl, u: fn(pl, u, spec.dims.dt, N + 1)
                )(plists, carry)
                nxt = carry + 1e-7 * jnp.tanh(poses.sum(axis=(1, 2)))
                return nxt, None
            out, _ = jax.lax.scan(body, us, None, length=k)
            return out.sum()
        return f
    return disc_run


if os.environ.get("NODE_PROBE_MARCH", "0") == "1":
    emit("discretizer_march", slope(disc_run_with(get_next_n_poses), (u0s,)))
emit("discretizer_fast", slope(disc_run_with(get_next_n_poses_fast), (u0s,)))

# ---------------- 4. projection only ----------------
rxy = jnp.asarray(rng.uniform(0.0, 2.0, size=(B, 2)), dtype)


def proj_run(k):
    @jax.jit
    def f(rxy):
        def body(carry, _):
            res = jax.vmap(lambda pl, r: project_to_path(pl, r[0], r[1]))(
                plists, carry)
            nxt = carry + 1e-7 * jnp.tanh(
                jnp.stack([res.x, res.y], axis=-1))
            return nxt, None
        out, _ = jax.lax.scan(body, rxy, None, length=k)
        return out.sum()
    return f


emit("projection", slope(proj_run, (rxy,)))

# ---------------- 5. windowing only ----------------


def win_run(k):
    @jax.jit
    def f(us):
        def body(carry, _):
            def one(w, u):
                w2, u2 = pop_completed(w, u)
                w3 = top_up(w2, u2, cfg.max_active_path_length)
                return u2 + 1e-7 * jnp.tanh(
                    w3.segs.cx.sum() + w3.active_count.astype(dtype))
            nxt = jax.vmap(one)(windows, carry)
            return nxt, None
        out, _ = jax.lax.scan(body, us, None, length=k)
        return out.sum()
    return f


emit("windowing", slope(win_run, (u0s,)))
