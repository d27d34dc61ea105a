"""AOT tick artifacts: export/load round trip equals the live jitted tick.

The deployment analog of the reference's pre-built solver capsules
(``generate_c_code.py:77-83``): the serialized blob must reproduce the live
path bit-for-bit on the same backend and carry a validating header.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmpc_nav_control_tpu.control import make_controller
from nmpc_nav_control_tpu.control.state_machine import (
    Measurements,
    node_init,
    node_tick,
    on_goal_pose,
)
from nmpc_nav_control_tpu.runtime.aot import export_tick, load_tick
from nmpc_nav_control_tpu.runtime.config import from_dict

RAW = {
    "steering_geometry": "diff",
    "control_freq": 40,
    "tf_ini": 0.25,  # N = 10: keep export/compile fast
    "rob_dist_between_wh": 0.27,
    "rob_wh_vel_time_const": 0.1,
    "rob_wh_max_vel": 1.0,
    "rob_wh_max_ace": 2.0,
    "cost_matrix_weights_state_diag": [10.0, 10.0, 5.0, 0, 0, 0, 0],
    "cost_matrix_weights_input_diag": [1.0, 1.0],
    "final_position_error": 0.03,
    "final_orientation_error": 3.0,
}


def _live(config, dtype=jnp.float32):
    spec, data = make_controller(
        config.steering_geometry, config.dt, config.horizon,
        dtype=dtype, **config.controller_kwargs(),
    )
    cfg = config.nav
    return spec, cfg, jax.jit(lambda s, m: node_tick(spec, data, cfg, s, m))


def _meas(dtype=jnp.float32):
    return Measurements(
        pose=jnp.asarray([0.1, -0.2, 0.3], dtype),
        vel=jnp.asarray([0.05, 0.0, -0.02], dtype),
        steer_angle=jnp.zeros((), dtype),
        pose_valid=jnp.asarray(True),
        vel_valid=jnp.asarray(True),
        steer_valid=jnp.asarray(True),
    )


def test_aot_roundtrip_matches_live_tick():
    config = from_dict(RAW)
    blob = export_tick(config, platforms=("cpu",))
    aot = load_tick(blob)
    assert aot.meta["geometry"] == "diff"
    assert aot.meta["horizon"] == config.horizon
    assert aot.meta["batch"] is None

    spec, cfg, live = _live(config)
    state = on_goal_pose(node_init(spec, cfg),
                         jnp.asarray([1.0, 0.5, 0.2], jnp.float32))
    meas = _meas()

    s_live, out_live = live(state, meas)
    s_aot, out_aot = aot(state, meas)

    # Same backend, same program -> identical results.
    np.testing.assert_array_equal(np.asarray(out_live.cmd.v),
                                  np.asarray(out_aot.cmd.v))
    np.testing.assert_array_equal(np.asarray(out_live.kkt_res),
                                  np.asarray(out_aot.kkt_res))
    np.testing.assert_array_equal(np.asarray(s_live.rti.us),
                                  np.asarray(s_aot.rti.us))
    assert int(out_aot.status_code) == int(out_live.status_code)

    # The artifact stays callable across ticks (warm-started chain).
    s2, out2 = aot(s_aot, meas)
    assert np.isfinite(float(out2.kkt_res))


def test_aot_batched_export():
    config = from_dict(RAW)
    B = 3
    blob = export_tick(config, batch=B, platforms=("cpu",))
    aot = load_tick(blob)
    assert aot.meta["batch"] == B

    spec, cfg, _ = _live(config)
    state0 = node_init(spec, cfg)
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), state0)
    goals = jnp.asarray([[1.0, 0.0, 0.0], [0.5, 0.5, 0.3], [-1.0, 0.2, 0.1]],
                        jnp.float32)
    states = jax.vmap(on_goal_pose)(states, goals)
    meas = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), _meas())

    s, out = aot(states, meas)
    assert out.cmd.v.shape == (B,)
    assert bool(jnp.all(jnp.isfinite(out.kkt_res)))
    # Lanes with different goals produce different commands.
    assert not np.allclose(np.asarray(out.cmd.v)[0], np.asarray(out.cmd.v)[2])


def test_aot_rejects_garbage():
    with pytest.raises(ValueError, match="AOT artifact"):
        load_tick(b"not an artifact at all")
