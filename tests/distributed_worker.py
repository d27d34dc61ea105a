"""Worker program for the true multi-process distributed test.

Each process runs THIS script (the "every host runs the same program"
contract of ``parallel/multihost.py``): initialize the JAX distributed
runtime, build the process-major global data mesh, assemble host-local
robots into the global fleet, tick the fleet, and extract this host's lanes.

Usage: python distributed_worker.py <process_id> <num_processes> <port> <out.npz>
"""
import os
import sys

PID = int(sys.argv[1])
NPROCS = int(sys.argv[2])
PORT = sys.argv[3]
OUT = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    .replace("--xla_force_host_platform_device_count=8", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nmpc_nav_control_tpu.parallel.multihost import (  # noqa: E402
    global_data_mesh,
    global_to_local,
    init_distributed,
    local_batch,
)

init_distributed(f"127.0.0.1:{PORT}", NPROCS, PID)
assert jax.process_count() == NPROCS, jax.process_count()
assert jax.local_device_count() == 4
assert jax.device_count() == 4 * NPROCS

from nmpc_nav_control_tpu.control import make_controller  # noqa: E402
from nmpc_nav_control_tpu.control.state_machine import (  # noqa: E402
    Measurements,
    NavConfig,
    node_init,
    on_goal_pose,
)
from nmpc_nav_control_tpu.parallel.fleet import Fleet, FleetGroup  # noqa: E402

DTYPE = jnp.float64
GLOBAL_B = 16
N, DT = 10, 0.025

B = local_batch(GLOBAL_B)
spec, data = make_controller(
    "diff", DT, N, dist_b=0.27, tau_v=0.1, v_max=1.0, a_max=2.0,
    q_diag=[10, 10, 5, 0, 0, 0, 0], r_diag=[1, 1], ipm_iters=6, dtype=DTYPE)
cfg = NavConfig(path_capacity=4)
group = FleetGroup(spec=spec, data=data, cfg=cfg, batch=B)

mesh = global_data_mesh()
fleet = Fleet({"diff": group}, mesh=mesh, dtype=DTYPE)

# Per-robot goals by GLOBAL lane index; this host contributes its slice.
goals_g = np.stack(
    [np.linspace(0.2, 0.9, GLOBAL_B),
     np.linspace(-0.2, 0.2, GLOBAL_B),
     np.linspace(-0.5, 0.5, GLOBAL_B)], axis=-1)
goals_l = jnp.asarray(goals_g[PID * B:(PID + 1) * B], DTYPE)

s0 = node_init(spec, cfg, DTYPE)
states_l = jax.tree_util.tree_map(
    lambda x: jnp.tile(x[None], (B,) + (1,) * x.ndim), s0)
states_l = jax.vmap(on_goal_pose)(states_l, goals_l)
fleet.set_states("diff", states_l)

meas_l = Measurements(
    pose=jnp.zeros((B, 3), DTYPE),
    vel=jnp.zeros((B, 3), DTYPE),
    steer_angle=jnp.zeros((B,), DTYPE),
    pose_valid=jnp.ones((B,), bool),
    vel_valid=jnp.ones((B,), bool),
    steer_valid=jnp.ones((B,), bool),
)
vs, ws, kkts = [], [], []
for _ in range(4):
    outs = fleet.tick({"diff": meas_l})
    local = global_to_local({"v": outs["diff"].cmd.v,
                             "w": outs["diff"].cmd.w,
                             "kkt": outs["diff"].kkt_res,
                             "status": outs["diff"].status_code})
    vs.append(local["v"])
    ws.append(local["w"])
    kkts.append(local["kkt"])

np.savez(OUT, v=np.stack(vs), w=np.stack(ws), kkt=np.stack(kkts),
         status=local["status"])
print(f"[proc {PID}] wrote {OUT}", flush=True)
