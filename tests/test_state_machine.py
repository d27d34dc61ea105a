"""State-machine + end-to-end path-following tests.

Exercises the full jitted tick — projection, windowing, discretization,
safety, termination, solver — against a simulated plant, mirroring the
behaviors of ``NMPCNavControlROS::mainCycle`` (``NMPCNavControlROS.cpp:516-720``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmpc_nav_control_tpu.control import make_controller
from nmpc_nav_control_tpu.control.state_machine import (
    BREAK,
    ERROR,
    FOLLOW_PATH,
    GO_TO_POSE,
    IDLE,
    Measurements,
    NavConfig,
    NodeState,
    STATUS_ERROR,
    STATUS_IDLE,
    STATUS_WORKING,
    node_init,
    node_tick,
    on_command,
    on_goal_pose,
    on_path_set,
)
from nmpc_nav_control_tpu.models import diff
from nmpc_nav_control_tpu.ocp.integrator import rk4_step
from nmpc_nav_control_tpu.paths import make_line_segment
from nmpc_nav_control_tpu.utils import dist, norm_ang_rad

DT = 0.025
N = 40
DTYPE = jnp.float64


def _make_diff():
    spec, data = make_controller(
        "diff", DT, N,
        dist_b=0.27, tau_v=0.1, v_max=1.0, a_max=2.0,
        q_diag=[10.0, 10.0, 5.0, 0, 0, 0, 0], r_diag=[1.0, 1.0],
        dtype=DTYPE,
    )
    cfg = NavConfig(final_position_error=0.03, final_orientation_error=np.deg2rad(3))
    return spec, data, cfg


def _segs_to_padded(segs, cap):
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *segs)
    return jax.tree_util.tree_map(
        lambda x: jnp.pad(x, [(0, cap - len(segs))] + [(0, 0)] * (x.ndim - 1)), stacked
    )


def _measure(plant, valid=True):
    vl, vr = plant[3], plant[4]
    t = jnp.asarray(valid)
    return Measurements(
        pose=plant[:3],
        vel=jnp.stack([(vl + vr) / 2, jnp.zeros((), DTYPE), (vr - vl) / 0.27]),
        steer_angle=jnp.zeros((), DTYPE),
        pose_valid=t, vel_valid=t, steer_valid=t,
    )


def _plant_step(plant, cmd):
    vl_ref, vr_ref = diff.direct_kinematics(cmd.v, cmd.w, 0.27)
    u = jnp.stack([vl_ref, vr_ref])

    def f(xp, u_, p):
        x, y, th, vl_, vr_ = xp
        vb = 0.5 * (vl_ + vr_)
        return jnp.stack([
            vb * jnp.cos(th), vb * jnp.sin(th), (vr_ - vl_) / 0.27,
            (u_[0] - vl_) / 0.1, (u_[1] - vr_) / 0.1,
        ])

    return rk4_step(f, plant, u, None, DT)


def test_idle_until_goal_then_working():
    spec, data, cfg = _make_diff()
    state = node_init(spec, cfg, DTYPE)
    plant = jnp.zeros(5, DTYPE)
    tick = jax.jit(lambda s, m: node_tick(spec, data, cfg, s, m))

    state, out = tick(state, _measure(plant))
    assert int(state.status) == IDLE
    assert int(out.status_code) == STATUS_IDLE
    assert not bool(out.publish_cmd)

    state = on_goal_pose(state, jnp.asarray([0.5, 0.0, 0.0], DTYPE))
    assert int(state.status) == GO_TO_POSE
    state, out = tick(state, _measure(plant))
    assert int(out.status_code) == STATUS_WORKING
    assert bool(out.publish_cmd)
    assert float(out.cmd.v) > 0  # drives toward the goal


def test_goal_too_far_aborts_to_idle():
    spec, data, cfg = _make_diff()
    state = node_init(spec, cfg, DTYPE)
    state = on_goal_pose(state, jnp.asarray([5.0, 0.0, 0.0], DTYPE))  # > 2 m
    state, out = node_tick(spec, data, cfg, state, _measure(jnp.zeros(5, DTYPE)))
    assert int(state.status) == IDLE
    assert bool(out.publish_cmd) and float(out.cmd.v) == 0.0  # stop command


def test_goal_reached_transitions_to_idle():
    spec, data, cfg = _make_diff()
    state = node_init(spec, cfg, DTYPE)
    state = on_goal_pose(state, jnp.asarray([1.0, 0.0, 0.0], DTYPE))
    tick = jax.jit(lambda s, m: node_tick(spec, data, cfg, s, m))
    plant = jnp.zeros(5, DTYPE)
    statuses = []
    for _ in range(500):
        state, out = tick(state, _measure(plant))
        plant = _plant_step(plant, out.cmd)
        statuses.append(int(state.status))
        if statuses[-1] == IDLE:
            break
    assert IDLE in statuses, "never reached the goal"
    p = np.asarray(plant)
    assert dist(p[0], p[1], 1.0, 0.0) < cfg.final_position_error + 0.02


def test_follow_path_tracks_and_finishes():
    spec, data, cfg = _make_diff()
    state = node_init(spec, cfg, DTYPE)
    segs = [
        make_line_segment((0, 0), (1.0, 0), velocity=0.5, frame_id=1),
        make_line_segment((1.0, 0), (2.0, 0.0), velocity=0.5, frame_id=1),
    ]
    new_segs = _segs_to_padded(segs, cfg.path_capacity)
    state = on_path_set(state, cfg, new_segs, 2, request_id=7)
    assert int(state.status) == FOLLOW_PATH
    assert int(state.request_id) == 7

    tick = jax.jit(lambda s, m: node_tick(spec, data, cfg, s, m))
    plant = jnp.zeros(5, DTYPE)
    max_cross_track = 0.0
    finished_at = None
    for t in range(1200):
        state, out = tick(state, _measure(plant))
        plant = _plant_step(plant, out.cmd)
        max_cross_track = max(max_cross_track, abs(float(plant[1])))
        if int(state.status) == IDLE:
            finished_at = t
            break
        assert int(state.status) == FOLLOW_PATH, f"unexpected status at t={t}"
    assert finished_at is not None, "path never finished"
    p = np.asarray(plant)
    assert dist(p[0], p[1], 2.0, 0.0) < 0.06
    assert max_cross_track < 0.03, f"cross-track error {max_cross_track}"
    # ~2 m at 0.5 m/s nominal -> ~4 s ideal; allow generous margin.
    assert finished_at * DT < 12.0


@pytest.mark.slow
def test_follow_path_march_discretizer_equivalent():
    """``NavConfig.discretizer="march"`` (the bit-faithful reference loop)
    stays wired through node_tick and closes the same loop the "fast"
    default does: path finished, same end pose within the fast-vs-march
    resampler tolerance (``get_next_n_poses_fast`` docstring)."""
    spec, data, cfg = _make_diff()
    segs = [make_line_segment((0, 0), (1.0, 0), velocity=0.5, frame_id=1)]
    new_segs = _segs_to_padded(segs, cfg.path_capacity)

    finals = {}
    for mode in ("march", "fast"):
        cfg_m = NavConfig(
            final_position_error=cfg.final_position_error,
            final_orientation_error=cfg.final_orientation_error,
            discretizer=mode,
        )
        state = on_path_set(node_init(spec, cfg_m, DTYPE), cfg_m, new_segs, 1)
        tick = jax.jit(lambda s, m, c=cfg_m: node_tick(spec, data, c, s, m))
        plant = jnp.zeros(5, DTYPE)
        for t in range(800):
            state, out = tick(state, _measure(plant))
            plant = _plant_step(plant, out.cmd)
            if int(state.status) == IDLE:
                break
        assert int(state.status) == IDLE, f"{mode}: path never finished"
        finals[mode] = np.asarray(plant)
    assert dist(finals["march"][0], finals["march"][1],
                finals["fast"][0], finals["fast"][1]) < 5e-3


def test_follow_path_safety_abort_to_error():
    spec, data, cfg = _make_diff()
    state = node_init(spec, cfg, DTYPE)
    segs = [make_line_segment((0, 0), (1.0, 0), velocity=0.5, frame_id=1)]
    state = on_path_set(state, cfg, _segs_to_padded(segs, cfg.path_capacity), 1)
    # Robot 1 m off the path (> max_pos_error_to_path = 0.5).
    plant = jnp.asarray([0.0, 1.0, 0.0, 0.0, 0.0], DTYPE)
    state, out = node_tick(spec, data, cfg, state, _measure(plant))
    assert int(state.status) == ERROR
    assert int(out.status_code) == STATUS_ERROR
    assert bool(out.publish_cmd) and float(out.cmd.v) == 0.0
    # Error is terminal: next tick does nothing.
    state, out = node_tick(spec, data, cfg, state, _measure(plant))
    assert int(state.status) == ERROR
    assert not bool(out.publish_cmd)


def test_break_command_stops_then_idles():
    spec, data, cfg = _make_diff()
    state = node_init(spec, cfg, DTYPE)
    state = on_goal_pose(state, jnp.asarray([1.0, 0.0, 0.0], DTYPE))
    state = on_command(state, "break")
    assert int(state.status) == BREAK
    state, out = node_tick(spec, data, cfg, state, _measure(jnp.zeros(5, DTYPE)))
    assert int(state.status) == IDLE
    assert bool(out.publish_cmd) and float(out.cmd.v) == 0.0


def test_invalid_input_goes_to_error():
    spec, data, cfg = _make_diff()
    state = node_init(spec, cfg, DTYPE)
    state = on_goal_pose(state, jnp.asarray([1.0, 0.0, 0.0], DTYPE))
    state, out = node_tick(
        spec, data, cfg, state, _measure(jnp.zeros(5, DTYPE), valid=False)
    )
    assert int(state.status) == ERROR


def test_empty_path_set_keeps_old_buffers():
    spec, data, cfg = _make_diff()
    state = node_init(spec, cfg, DTYPE)
    segs = [make_line_segment((0, 0), (1.0, 0), velocity=0.5, frame_id=1)]
    state = on_path_set(state, cfg, _segs_to_padded(segs, cfg.path_capacity), 1)
    assert int(state.window.total_count) == 1
    # Empty set: status stays FOLLOW_PATH, buffers untouched (ref quirk).
    state = on_path_set(state, cfg, _segs_to_padded(segs, cfg.path_capacity), 0)
    assert int(state.status) == FOLLOW_PATH
    assert int(state.window.total_count) == 1


def test_batched_mixed_status_ticks():
    """The whole tick vmaps: one robot idle, one going to a pose, one on a
    path — single compiled program, three lanes."""
    spec, data, cfg = _make_diff()
    s_idle = node_init(spec, cfg, DTYPE)
    s_goal = on_goal_pose(node_init(spec, cfg, DTYPE), jnp.asarray([0.5, 0, 0], DTYPE))
    segs = [make_line_segment((0, 0), (1.0, 0), velocity=0.5, frame_id=1)]
    s_path = on_path_set(
        node_init(spec, cfg, DTYPE), cfg, _segs_to_padded(segs, cfg.path_capacity), 1
    )
    batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), s_idle, s_goal, s_path
    )
    meas = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        _measure(jnp.zeros(5, DTYPE)),
        _measure(jnp.zeros(5, DTYPE)),
        _measure(jnp.zeros(5, DTYPE)),
    )
    tick = jax.jit(jax.vmap(lambda s, m: node_tick(spec, data, cfg, s, m)))
    new_batch, out = tick(batch, meas)
    assert [int(x) for x in new_batch.status] == [IDLE, GO_TO_POSE, FOLLOW_PATH]
    assert [int(x) for x in out.status_code] == [
        STATUS_IDLE, STATUS_WORKING, STATUS_WORKING,
    ]
    # Idle lane publishes nothing; the others publish.
    assert [bool(x) for x in out.publish_cmd] == [False, True, True]


def test_follow_path_reverse_driving():
    """A negative-velocity segment: theta references get +pi (reverse
    driving, ``PathDiscretizer.cpp:81-82`` + ``NMPCNavControlROS.cpp:655``)
    and the robot backs up along the path."""
    spec, data, cfg = _make_diff()
    state = node_init(spec, cfg, DTYPE)
    # Path heading points +x but nominal velocity is negative: robot (facing
    # +x at the path start's reversed heading pi... the reference convention:
    # the robot drives backwards along -x? No: segment from (0,0) to (-1,0)
    # traversed with negative velocity means the tangent heading is pi, the
    # reversed reference heading is 0 — the robot faces +x and backs up
    # toward (-1, 0).
    segs = [make_line_segment((0, 0), (-1.0, 0), velocity=-0.4, frame_id=1)]
    state = on_path_set(state, cfg, _segs_to_padded(segs, cfg.path_capacity), 1)

    tick = jax.jit(lambda s, m: node_tick(spec, data, cfg, s, m))
    plant = jnp.zeros(5, DTYPE)
    for t in range(700):
        state, out = tick(state, _measure(plant))
        plant = _plant_step(plant, out.cmd)
        if int(state.status) == IDLE:
            break
        assert int(state.status) == FOLLOW_PATH, f"status {int(state.status)} at {t}"
    p = np.asarray(plant)
    # Drove backwards (negative x), heading stayed near 0 (never flipped).
    assert p[0] < -0.8, f"did not back up: x={p[0]}"
    assert abs(float(norm_ang_rad(jnp.asarray(p[2])))) < 0.3


# --------------------------------------------------------------------------- #
# Randomized event-sequence property test: the jitted status machine vs a
# 30-line Python oracle of the reference's switch logic
# (``NMPCNavControlROS.cpp:516-538`` + callbacks ``:304-336``).
# --------------------------------------------------------------------------- #


def _oracle_step(state, event, valid):
    """Reference transition semantics for one event.

    States are the internal codes; returns (new_state, published_status).
    Continuous effects (termination, safety, solver failure) are excluded by
    test construction: pose far from the goal but within max_goal_pose_dist,
    path running through the pose with matching heading.
    """
    if event == "goal":
        return GO_TO_POSE, None            # callback only, no tick
    if event == "path":
        return FOLLOW_PATH, None           # FOLLOW_PATH even for empty sets
    if event == "break":
        return BREAK, None
    if event == "idle":
        return IDLE, None
    # event == "tick"
    if state in (GO_TO_POSE, FOLLOW_PATH, BREAK) and not valid:
        state = ERROR                      # any input failure (":552")
    elif state == BREAK:
        state = IDLE                       # stop published, then Idle
    published = (
        STATUS_IDLE if state in (IDLE, BREAK)
        else STATUS_ERROR if state == ERROR
        else STATUS_WORKING
    )
    return state, published


def test_random_event_sequences_match_reference_oracle():
    spec, data, cfg = _make_diff()
    tick = jax.jit(lambda s, m: node_tick(spec, data, cfg, s, m))
    seg = make_line_segment((-10.0, 0.0), (30.0, 0.0), velocity=0.5)
    segs = _segs_to_padded([seg], cfg.path_capacity)
    goal = jnp.asarray([0.5, 0.2, 0.0], DTYPE)
    plant = jnp.zeros(5, DTYPE)            # at the path, far from the goal

    rng = np.random.default_rng(7)
    for seed in range(4):
        state = node_init(spec, cfg, DTYPE)
        oracle = IDLE
        history = []
        for step in range(60):
            ev = rng.choice(["tick", "tick", "tick", "goal", "path",
                             "break", "idle"])
            valid = bool(rng.random() > 0.15)
            history.append((ev, valid))
            if ev == "goal":
                state = on_goal_pose(state, goal)
            elif ev == "path":
                state = on_path_set(state, cfg, segs, 1, request_id=step)
            elif ev in ("break", "idle"):
                state = on_command(state, ev)
            else:
                state, out = tick(state, _measure(plant, valid=valid))
            oracle, pub = _oracle_step(oracle, ev, valid)
            assert int(state.status) == oracle, (
                f"seed {seed} step {step}: internal status "
                f"{int(state.status)} != oracle {oracle}; {history[-6:]}"
            )
            if pub is not None:
                assert int(out.status_code) == pub, (
                    f"seed {seed} step {step}: published {int(out.status_code)}"
                    f" != oracle {pub}; {history[-6:]}"
                )
