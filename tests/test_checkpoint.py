"""Checkpoint/resume: a mission interrupted mid-flight resumes identically."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from nmpc_nav_control_tpu.control import make_controller
from nmpc_nav_control_tpu.control.state_machine import (
    Measurements,
    NavConfig,
    node_init,
    node_tick,
    on_goal_pose,
)
from nmpc_nav_control_tpu.runtime.checkpoint import load_state, save_state

DTYPE = jnp.float64
N, DT = 10, 0.025


def _setup():
    spec, data = make_controller(
        "diff", DT, N, dist_b=0.27, tau_v=0.1, v_max=1.0, a_max=2.0,
        q_diag=[10, 10, 5, 0, 0, 0, 0], r_diag=[1, 1], ipm_iters=6,
        dtype=DTYPE)
    cfg = NavConfig(path_capacity=4)
    return spec, data, cfg


def _meas(x):
    return Measurements(
        pose=jnp.asarray([x, 0.0, 0.0], DTYPE),
        vel=jnp.zeros(3, DTYPE),
        steer_angle=jnp.zeros((), DTYPE),
        pose_valid=jnp.asarray(True),
        vel_valid=jnp.asarray(True),
        steer_valid=jnp.asarray(True),
    )


def test_checkpoint_roundtrip_resumes_identically():
    spec, data, cfg = _setup()
    tick = jax.jit(lambda s, m: node_tick(spec, data, cfg, s, m))

    state = on_goal_pose(node_init(spec, cfg, DTYPE), jnp.asarray([0.8, 0, 0], DTYPE))
    for i in range(5):
        state, out = tick(state, _meas(i * 0.01))

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_state(path, state)
        restored = load_state(path, node_init(spec, cfg, DTYPE))

    # Resumed run is bit-identical to the uninterrupted one.
    state_a, out_a = tick(state, _meas(0.06))
    state_b, out_b = tick(restored, _meas(0.06))
    np.testing.assert_array_equal(np.asarray(out_a.cmd.v), np.asarray(out_b.cmd.v))
    np.testing.assert_array_equal(
        np.asarray(state_a.rti.us), np.asarray(state_b.rti.us)
    )
    np.testing.assert_array_equal(
        np.asarray(state_a.window.segs.cx), np.asarray(state_b.window.segs.cx)
    )


def test_checkpoint_treedef_mismatch_raises():
    """A same-leaf-count but different-structure pytree must NOT load silently
    (the saved treedef descriptor is enforced, not just shapes)."""
    spec, data, cfg = _setup()
    state = node_init(spec, cfg, DTYPE)
    leaves, _ = jax.tree_util.tree_flatten(state)
    # Same leaves, different container structure (tuple vs NodeState).
    bad_template = tuple(leaves)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_state(path, state)
        try:
            load_state(path, bad_template)
            assert False, "expected treedef mismatch"
        except ValueError as e:
            assert "structure" in str(e)


def test_checkpoint_shape_mismatch_raises():
    spec, data, cfg = _setup()
    state = node_init(spec, cfg, DTYPE)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_state(path, state)
        bad_cfg = NavConfig(path_capacity=8)
        bad_template = node_init(spec, bad_cfg, DTYPE)
        try:
            load_state(path, bad_template)
            assert False, "expected shape mismatch"
        except ValueError:
            pass
