"""Headline benchmark: batched NMPC solves/s/chip at N=40 (diff geometry).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric counts FULL RTI solves — RK4 rollout + jacfwd linearization,
Gauss-Newton cost blocks, and the 12-iteration Mehrotra box-IPM (each
iteration = 1 Riccati factorization + 2 solves) — i.e. everything one
``{name}_acados_solve()`` call does in the reference, batched over scenarios
on one chip.

Baseline: the reference runs 1 robot x 40 solves/s on a CPU
(``NMPCNavControlROS.cpp:36-41``; BASELINE.md).  vs_baseline = value / 40.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from nmpc_nav_control_tpu.control import (
        controller_init,
        controller_step,
        make_controller,
    )

    # B=2048 is the single-chip throughput sweet spot for this program (the
    # per-solve cost rises past ~2 batch tile groups; see PERFORMANCE.md).
    B = int(os.environ.get("BENCH_BATCH", "2048"))
    N = int(os.environ.get("BENCH_HORIZON", "40"))
    REPS = int(os.environ.get("BENCH_REPS", "10"))
    GEOM = os.environ.get("BENCH_GEOMETRY", "diff")
    dtype = jnp.float32

    if GEOM == "diff":
        spec, data = make_controller(
            "diff", 1.0 / 40.0, N,
            dist_b=0.27, tau_v=0.1, v_max=1.0, a_max=2.0,
            q_diag=[10.0, 10.0, 5.0, 0, 0, 0, 0], r_diag=[1.0, 1.0],
            dtype=dtype,
        )
    elif GEOM == "omni4":
        spec, data = make_controller(
            "omni4", 1.0 / 40.0, N,
            l1_plus_l2=0.535, tau_v=0.1, v_max=1.0, a_max=1.0,
            q_diag=[10.0, 10.0, 5.0] + [0.0] * 8, r_diag=[1.0] * 4,
            dtype=dtype,
        )
    elif GEOM == "tric":
        import math

        spec, data = make_controller(
            "tric", 1.0 / 40.0, N,
            dist_d=1.05, tau_v=0.1, tau_a=0.1,
            v_max=1.0, a_max=2.0,
            alpha_min=-math.radians(60.0), alpha_max=math.radians(60.0),
            dalpha_max=math.radians(90.0),
            q_diag=[10.0, 10.0, 5.0, 0, 0, 0, 0], r_diag=[1.0, 1.0],
            dtype=dtype,
        )
    else:
        raise SystemExit(f"unknown BENCH_GEOMETRY={GEOM!r}")

    def one(state, pose, vel, traj, n_valid):
        new_state, cmd, stats = controller_step(
            spec, data, state, pose, vel, traj, n_valid
        )
        return new_state, jnp.stack([cmd.v, cmd.vn, cmd.w]), stats.kkt_res

    step = jax.jit(jax.vmap(one))

    state0 = controller_init(spec, dtype)
    states = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (B,) + (1,) * x.ndim), state0
    )
    rng = np.random.default_rng(0)
    poses = jnp.asarray(rng.normal(size=(B, 3)) * 0.1, dtype)
    vels = jnp.asarray(rng.normal(size=(B, 3)) * 0.1, dtype)
    trajs = jnp.zeros((B, N + 1, 3), dtype).at[:, 0, 0].set(
        jnp.asarray(rng.uniform(0.3, 1.5, size=(B,)), dtype)
    )
    n_valids = jnp.ones((B,), jnp.int32)

    # Steady-state throughput: chain K dependent control ticks inside one jit
    # (the production control loop is exactly this dependence chain — each
    # tick consumes the previous tick's warm state) and take the marginal
    # cost between two chain lengths.  This removes the per-dispatch network
    # latency of this container's axon tunnel (~30 ms round trip, absent on a
    # directly-attached TPU) from the per-solve figure, per the measurement
    # methodology in PERFORMANCE.md.
    # The K spread must make the slope signal (K_HI-K_LO steps) much larger
    # than the per-dispatch noise of the tunnel (a few ms), or the marginal
    # can even come out negative on a quiet step.  Min-of-reps timing for the
    # same reason.
    K_LO = int(os.environ.get("BENCH_CHAIN_LO", "1"))
    K_HI = int(os.environ.get("BENCH_CHAIN_HI", "33"))

    def chained(k):
        @jax.jit
        def run(states, poses, vels, trajs, n_valids):
            def body(carry, _):
                st, _, kkt = jax.vmap(one)(carry, poses, vels, trajs, n_valids)
                return st, kkt
            st, kkts = jax.lax.scan(body, states, None, length=k)
            return st.xs.sum(), jnp.all(jnp.isfinite(kkts))
        return run

    args = (states, poses, vels, trajs, n_valids)
    runs = {k: chained(k) for k in (K_LO, K_HI)}
    finite_ok = True
    for k, run in runs.items():  # warmup (compile + first exec)
        out = jax.block_until_ready(run(*args))
        finite_ok = finite_ok and bool(out[1])

    def measure():
        best = {}
        for k, run in runs.items():
            times = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(run(*args))
                times.append(time.perf_counter() - t0)
            best[k] = float(np.min(times))
        return (best[K_HI] - best[K_LO]) / (K_HI - K_LO)

    per_step = measure()
    if per_step <= 0:  # a noise spike on the short chain; once more
        per_step = measure()
    assert per_step > 0, "non-positive marginal step time (noisy chip?)"
    solves_per_s = B / per_step

    if not finite_ok:
        raise RuntimeError("non-finite KKT residuals in benchmark batch")

    suffix = "" if GEOM == "diff" else f"_{GEOM}"
    print(json.dumps({
        "metric": f"nmpc_solves_per_s_per_chip_N{N}{suffix}",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 40.0, 2),
    }))


if __name__ == "__main__":
    main()
