"""True multi-process distributed test (SURVEY.md §2.4 multi-host row).

Spawns TWO real ``jax.distributed`` CPU processes (4 virtual devices each)
running ``distributed_worker.py`` — the documented two-host fleet loop of
``parallel/multihost.py``: ``init_distributed`` with an actual coordinator,
process-major ``global_data_mesh``, host-local robots assembled with
``local_to_global``, a sharded fleet tick, and per-host extraction with
``global_to_local`` — and asserts the cross-process results match a
single-process run of the same 16-robot fleet lane-for-lane.

This exercises the correctness half of the BASELINE ">= 90% two-host
scaling" target: the data-parallel tick partitions exactly, with each
host's lanes on its own devices (no cross-host math to diverge).
"""
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_fleet_matches_single_process(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    outs = [str(tmp_path / f"out_{pid}.npz") for pid in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_worker.py"),
             str(pid), "2", str(port), outs[pid]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    d0 = np.load(outs[0])
    d1 = np.load(outs[1])
    assert d0["v"].shape == (4, 8)  # 4 ticks x 8 local lanes per host
    v2 = np.concatenate([d0["v"], d1["v"]], axis=1)     # [T, 16]
    w2 = np.concatenate([d0["w"], d1["w"]], axis=1)
    status2 = np.concatenate([d0["status"], d1["status"]])

    # ---- Single-process reference: same 16 robots on the 8-device mesh. ----
    from nmpc_nav_control_tpu.control import make_controller
    from nmpc_nav_control_tpu.control.state_machine import (
        Measurements, NavConfig, node_init, on_goal_pose,
    )
    from nmpc_nav_control_tpu.parallel import make_mesh
    from nmpc_nav_control_tpu.parallel.fleet import Fleet, FleetGroup

    DTYPE = jnp.float64
    GLOBAL_B, N, DT = 16, 10, 0.025
    spec, data = make_controller(
        "diff", DT, N, dist_b=0.27, tau_v=0.1, v_max=1.0, a_max=2.0,
        q_diag=[10, 10, 5, 0, 0, 0, 0], r_diag=[1, 1], ipm_iters=6,
        dtype=DTYPE)
    cfg = NavConfig(path_capacity=4)
    mesh = make_mesh((8,), ("data",))
    fleet = Fleet({"diff": FleetGroup(spec=spec, data=data, cfg=cfg,
                                      batch=GLOBAL_B)}, mesh=mesh,
                  dtype=DTYPE)
    goals = np.stack(
        [np.linspace(0.2, 0.9, GLOBAL_B),
         np.linspace(-0.2, 0.2, GLOBAL_B),
         np.linspace(-0.5, 0.5, GLOBAL_B)], axis=-1)
    s0 = node_init(spec, cfg, DTYPE)
    states = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (GLOBAL_B,) + (1,) * x.ndim), s0)
    fleet.set_states("diff", jax.vmap(on_goal_pose)(
        states, jnp.asarray(goals, DTYPE)))
    meas = Measurements(
        pose=jnp.zeros((GLOBAL_B, 3), DTYPE),
        vel=jnp.zeros((GLOBAL_B, 3), DTYPE),
        steer_angle=jnp.zeros((GLOBAL_B,), DTYPE),
        pose_valid=jnp.ones((GLOBAL_B,), bool),
        vel_valid=jnp.ones((GLOBAL_B,), bool),
        steer_valid=jnp.ones((GLOBAL_B,), bool),
    )
    v1, w1 = [], []
    for _ in range(4):
        o = fleet.tick({"diff": meas})
        v1.append(np.asarray(o["diff"].cmd.v))
        w1.append(np.asarray(o["diff"].cmd.w))
        status1 = np.asarray(o["diff"].status_code)

    # Lane-exact agreement: the per-lane program is identical; only the
    # process/device partitioning differs.
    np.testing.assert_allclose(v2, np.stack(v1), rtol=0, atol=1e-12)
    np.testing.assert_allclose(w2, np.stack(w1), rtol=0, atol=1e-12)
    np.testing.assert_array_equal(status2, status1)
    assert (status2 == 1).all()  # every robot WORKING toward its goal
