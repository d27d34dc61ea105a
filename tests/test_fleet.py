"""Mixed-geometry fleet on a sharded CPU mesh."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from nmpc_nav_control_tpu.control import make_controller
from nmpc_nav_control_tpu.control.state_machine import (
    GO_TO_POSE,
    Measurements,
    NavConfig,
    on_goal_pose,
)
from nmpc_nav_control_tpu.parallel import make_mesh
from nmpc_nav_control_tpu.parallel.fleet import Fleet, FleetGroup

DTYPE = jnp.float64
N = 10
DT = 0.025


def _group(geometry, batch):
    if geometry == "diff":
        spec, data = make_controller(
            "diff", DT, N, dist_b=0.27, tau_v=0.1, v_max=1.0, a_max=2.0,
            q_diag=[10, 10, 5, 0, 0, 0, 0], r_diag=[1, 1],
            ipm_iters=6, dtype=DTYPE)
    else:
        spec, data = make_controller(
            "omni4", DT, N, l1_plus_l2=0.535, tau_v=0.1, v_max=1.0, a_max=1.0,
            q_diag=[10.0, 10.0, 10.0] + [0.0] * 8, r_diag=[1.0] * 4,
            ipm_iters=6, dtype=DTYPE)
    return FleetGroup(spec=spec, data=data, cfg=NavConfig(path_capacity=4),
                      batch=batch)


def _meas(batch):
    return Measurements(
        pose=jnp.zeros((batch, 3), DTYPE),
        vel=jnp.zeros((batch, 3), DTYPE),
        steer_angle=jnp.zeros((batch,), DTYPE),
        pose_valid=jnp.ones((batch,), bool),
        vel_valid=jnp.ones((batch,), bool),
        steer_valid=jnp.ones((batch,), bool),
    )


def test_mixed_geometry_fleet_on_mesh():
    mesh = make_mesh((8,), ("data",))
    fleet = Fleet(
        {"diff": _group("diff", 16), "omni4": _group("omni4", 16)},
        mesh=mesh, dtype=DTYPE,
    )
    assert fleet.total_scenarios == 32

    # Give every diff robot its own goal via vmapped on_goal_pose.
    goals = jnp.stack(
        [jnp.linspace(0.2, 0.6, 16), jnp.zeros(16), jnp.zeros(16)], axis=-1
    ).astype(DTYPE)
    states = jax.vmap(on_goal_pose)(fleet.states["diff"], goals)
    fleet.set_states("diff", states)
    assert int(states.status[0]) == GO_TO_POSE

    outs = fleet.tick({"diff": _meas(16), "omni4": _meas(16)})
    # diff lanes are working and commanding forward motion scaled with goal
    # distance; omni4 lanes are idle.
    v = np.asarray(outs["diff"].cmd.v)
    assert (np.asarray(outs["diff"].status_code) == 1).all()
    assert (v > 0).all() and v[-1] > v[0]
    assert (np.asarray(outs["omni4"].status_code) == 0).all()
    assert not np.asarray(outs["omni4"].publish_cmd).any()

    # Ticks advance state persistently.
    outs2 = fleet.tick({"diff": _meas(16), "omni4": _meas(16)})
    assert np.isfinite(np.asarray(outs2["diff"].kkt_res)).all()
