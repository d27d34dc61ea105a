"""Multi-chip data-parallel scaling benchmark.

Target: >=90% linear scaling of batched NMPC tick throughput with chip count
(BASELINE.md / BASELINE.json north star).  The data-parallel tick is
embarrassingly parallel — each chip owns its scenario lanes and the program
has no cross-chip collectives — so the measured efficiency mostly reflects
dispatch synchronization overhead.

Behavior:
  - >=2 devices: sweeps chip counts (1, 2, 4, ... up to all), measuring
    steady-state solves/s via the chained-slope method with the batch
    sharded over a 1-D ``data`` mesh; prints one JSON line per count and a
    final ``scaling_efficiency`` line (throughput_n / (n * throughput_1)).
  - 1 device (this dev rig has a single tunneled v5e chip): cleanly no-ops
    with a JSON line saying so — the harness is exercised on the virtual
    multi-device CPU mesh in CI (tests/test_scaling_bench.py).

Env: SCALING_BATCH_PER_CHIP (default 1024), SCALING_HORIZON (default 40),
SCALING_REPS, SCALING_CHAIN_LO/HI.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def measure_scaling(device_counts=None, batch_per_chip=None, N=None,
                    reps=None, k_lo=None, k_hi=None, emit=print):
    """Run the sweep; returns the list of per-count records."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nmpc_nav_control_tpu.control import (
        controller_init,
        controller_step,
        make_controller,
    )
    from nmpc_nav_control_tpu.parallel import make_mesh

    batch_per_chip = batch_per_chip or int(
        os.environ.get("SCALING_BATCH_PER_CHIP", "1024"))
    N = N or int(os.environ.get("SCALING_HORIZON", "40"))
    reps = reps or int(os.environ.get("SCALING_REPS", "5"))
    k_lo = k_lo or int(os.environ.get("SCALING_CHAIN_LO", "1"))
    k_hi = k_hi or int(os.environ.get("SCALING_CHAIN_HI", "9"))

    devices = jax.devices()
    if device_counts is None:
        device_counts = []
        n = 1
        while n <= len(devices):
            device_counts.append(n)
            n *= 2
        if device_counts[-1] != len(devices):
            device_counts.append(len(devices))

    dtype = jnp.float32
    spec, data = make_controller(
        "diff", 0.025, N, dist_b=0.27, tau_v=0.1, v_max=1.0, a_max=2.0,
        q_diag=[10.0, 10.0, 5.0, 0, 0, 0, 0], r_diag=[1.0, 1.0],
        dtype=dtype,
    )

    def one(state, pose, vel, traj, n_valid):
        new_state, cmd, stats = controller_step(
            spec, data, state, pose, vel, traj, n_valid
        )
        return new_state, stats.kkt_res

    records = []
    for n_dev in device_counts:
        B = batch_per_chip * n_dev
        mesh = make_mesh((n_dev,), ("data",), devices=devices[:n_dev])
        shard = NamedSharding(mesh, P("data"))

        state0 = controller_init(spec, dtype)
        states = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                jnp.tile(x[None], (B,) + (1,) * x.ndim), shard),
            state0,
        )
        rng = np.random.default_rng(0)
        poses = jax.device_put(
            jnp.asarray(rng.normal(size=(B, 3)) * 0.1, dtype), shard)
        vels = jax.device_put(jnp.zeros((B, 3), dtype), shard)
        trajs = jax.device_put(
            jnp.zeros((B, N + 1, 3), dtype).at[:, 0, 0].set(1.0), shard)
        n_valids = jax.device_put(jnp.ones((B,), jnp.int32), shard)

        def chained(k):
            @jax.jit
            def run(states, poses, vels, trajs, n_valids):
                def body(carry, _):
                    st, kkt = jax.vmap(one)(carry, poses, vels, trajs,
                                            n_valids)
                    return st, kkt
                st, kkts = jax.lax.scan(body, states, None, length=k)
                return st.xs.sum(), jnp.all(jnp.isfinite(kkts))
            return run

        args = (states, poses, vels, trajs, n_valids)
        runs = {k: chained(k) for k in (k_lo, k_hi)}
        for run in runs.values():
            out = jax.block_until_ready(run(*args))
            assert bool(out[1]), "non-finite solve in scaling sweep"

        best = {}
        for k, run in runs.items():
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(run(*args))
                times.append(time.perf_counter() - t0)
            best[k] = float(np.min(times))
        per_step = (best[k_hi] - best[k_lo]) / (k_hi - k_lo)
        assert per_step > 0
        thr = B / per_step
        rec = {"metric": "scaling_solves_per_s", "devices": n_dev,
               "batch": B, "value": round(thr, 1), "unit": "solves/s"}
        records.append(rec)
        emit(json.dumps(rec))

    base = records[0]["value"] / records[0]["devices"]
    last = records[-1]
    eff = (last["value"] / last["devices"]) / base
    emit(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 4),
        "unit": "fraction",
        "vs_baseline": round(eff / 0.9, 3),   # target >= 0.9
        "config": {"devices": last["devices"],
                   "batch_per_chip": batch_per_chip, "N": N},
    }))
    return records


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    devices = jax.devices()
    if len(devices) < 2:
        print(json.dumps({
            "metric": "scaling_efficiency",
            "skipped": True,
            "reason": f"only {len(devices)} device(s) attached; the sweep "
                      "needs >=2 chips (exercised on the virtual CPU mesh "
                      "in tests/test_scaling_bench.py)",
        }))
        return
    measure_scaling()


if __name__ == "__main__":
    main()
