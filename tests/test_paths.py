"""Path subsystem tests: sampling, projection, discretization, windowing.

Oracle: a straightforward numpy reimplementation of the reference's
``PathDiscretizer::getNextNPoses`` while-loop (``PathDiscretizer.cpp:14-63``)
run in float64.
"""
import jax
import jax.numpy as jnp
import numpy as np

from nmpc_nav_control_tpu.paths import (
    get_next_n_poses,
    ingest,
    make_cubic_segment,
    make_line_segment,
    make_path_list,
    path_remains,
    pop_completed,
    pose_sample,
    project_to_path,
    rotate_end_of_curve,
    top_up,
    window_init,
    active_path_list,
    active_length,
)
from nmpc_nav_control_tpu.paths.segment import poly_deriv_eval, poly_eval


def _np_poly(c, u):
    return sum(ci * u**i for i, ci in enumerate(np.asarray(c)))


def _np_discretizer(segs, nearest_u, dt, num_poses):
    """Reference getNextNPoses oracle (float64, data-dependent while loop)."""
    Nseg = len(segs)

    def speed(u):
        return abs(segs[min(int(np.floor(u)), Nseg - 1)]["vel"])

    def pose(su):
        pn = int(np.floor(su))
        u = su - pn
        if pn >= Nseg:
            pn, u = Nseg - 1, 1.0
        elif pn < 0:
            pn, u = 0, 0.0
        s = segs[pn]
        x = _np_poly(s["cx"], u)
        y = _np_poly(s["cy"], u)
        dx = _np_poly(np.polynomial.polynomial.polyder(s["cx"]), u)
        dy = _np_poly(np.polynomial.polynomial.polyder(s["cy"]), u)
        th = np.arctan2(dy, dx)
        if s["vel"] < 0:
            th += np.pi
        return np.array([x, y, th])

    def dpdu(su):
        pn = int(np.floor(su))
        u = su - pn
        if pn >= Nseg:
            pn, u = Nseg - 1, 1.0
        elif pn < 0:
            pn, u = 0, 0.0
        s = segs[pn]
        dx = _np_poly(np.polynomial.polynomial.polyder(s["cx"]), u)
        dy = _np_poly(np.polynomial.polynomial.polyder(s["cy"]), u)
        return np.hypot(dx, dy)

    n_cycle = 10
    vel = speed(nearest_u)
    goal = vel * dt
    rel = goal / n_cycle
    u = nearest_u
    old = pose(u)
    step = rel / dpdu(u)
    curr = 0.0
    out = []
    while u < Nseg:
        u = min(u + step, Nseg)
        new = pose(u)
        curr += np.hypot(new[0] - old[0], new[1] - old[1])
        if (goal - curr) <= 1e-2 * goal:
            out.append(new)
            vel = speed(u)
            goal = vel * dt
            rel = goal / n_cycle
            curr = 0.0
        if len(out) == num_poses:
            break
        step = rel / dpdu(u)
        old = new
    last = pose(Nseg)
    while len(out) < num_poses:
        out.append(last)
    return np.asarray(out)


def test_poly_eval_and_deriv():
    c = jnp.asarray([1.0, -2.0, 3.0, 0.5, 0, 0, 0, 0])
    for u in (0.0, 0.3, 1.0):
        want = 1 - 2 * u + 3 * u**2 + 0.5 * u**3
        dwant = -2 + 6 * u + 1.5 * u**2
        assert abs(float(poly_eval(c, jnp.asarray(u))) - want) < 1e-12
        assert abs(float(poly_deriv_eval(c, jnp.asarray(u))) - dwant) < 1e-12


def test_pose_sample_reverse_and_clamp():
    seg_fwd = make_line_segment((0, 0), (1, 0), velocity=0.5)
    seg_rev = make_line_segment((1, 0), (2, 0), velocity=-0.5)
    plist = make_path_list([seg_fwd, seg_rev], capacity=4)
    p0 = np.asarray(pose_sample(plist, jnp.asarray(0.5), False))
    assert abs(p0[2]) < 1e-9  # forward heading 0
    p1 = np.asarray(pose_sample(plist, jnp.asarray(1.5), False))
    assert abs(p1[2] - np.pi) < 1e-9  # reverse: theta + pi
    # Clamp beyond the end -> last segment at u=1.
    p_end = np.asarray(pose_sample(plist, jnp.asarray(7.0), False))
    np.testing.assert_allclose(p_end[:2], [2.0, 0.0], atol=1e-12)


def test_projection_on_two_segment_path():
    s1 = make_line_segment((0, 0), (1, 0))
    s2 = make_cubic_segment([1.0, 1.0, 0.0], [0.0, 0.0, 1.0])  # x=1+u, y=u^2
    plist = make_path_list([s1, s2], capacity=4)
    # Nearest to (0.4, 0.2) is on segment 0 at u=0.4.
    r = project_to_path(plist, 0.4, 0.2)
    assert abs(float(r.u) - 0.4) < 1e-6
    np.testing.assert_allclose([float(r.x), float(r.y)], [0.4, 0.0], atol=1e-6)
    # Nearest to (1.8, 0.5) is on segment 1.
    r2 = project_to_path(plist, 1.8, 0.5)
    assert 1.0 < float(r2.u) < 2.0
    # Verify stationarity: (P - r) . P' = 0 at the solution.
    u_loc = float(r2.u) - 1.0
    px = float(r2.x) - 1.8
    py = float(r2.y) - 0.5
    dx = 1.0
    dy = 2 * u_loc
    assert abs(px * dx + py * dy) < 1e-5


def test_discretizer_matches_reference_oracle():
    segs_np = [
        {"cx": [0.0, 1.0], "cy": [0.0, 0.0], "vel": 0.8},
        {"cx": [1.0, 1.0, 0.0], "cy": [0.0, 0.5, 0.5], "vel": 0.5},
    ]
    s1 = make_line_segment((0, 0), (1, 0), velocity=0.8)
    s2 = make_cubic_segment([1.0, 1.0, 0.0], [0.0, 0.5, 0.5], velocity=0.5)
    plist = make_path_list([s1, s2], capacity=4)

    for nearest_u, dt, num in [(0.0, 0.025, 41), (0.3, 0.025, 41), (0.9, 0.1, 21)]:
        ours = np.asarray(
            get_next_n_poses(plist, jnp.asarray(nearest_u, jnp.float64), dt, num)
        )
        oracle = _np_discretizer(segs_np, nearest_u, dt, num)
        np.testing.assert_allclose(ours, oracle, atol=1e-9, err_msg=f"u0={nearest_u}")


def test_discretizer_tail_padding():
    s1 = make_line_segment((0, 0), (0.05, 0), velocity=1.0)  # 5 cm path
    plist = make_path_list([s1], capacity=2)
    poses = np.asarray(get_next_n_poses(plist, jnp.asarray(0.0, jnp.float64), 0.025, 41))
    # 1 m/s * 0.025 s = 2.5 cm spacing -> ~2 real poses, rest padded with end.
    np.testing.assert_allclose(poses[-1], poses[-10], atol=1e-12)
    np.testing.assert_allclose(poses[-1][:2], [0.05, 0.0], atol=1e-9)


def _fast_march_cases():
    return {
        "line": [make_line_segment((0, 0), (1, 0), velocity=0.8)],
        "curvy": [
            make_cubic_segment([0.0, 2.0, -1.0, 0.3], [0.0, 0.1, 1.5, -0.6],
                               velocity=0.6),
            make_cubic_segment([1.3, 0.5, 0.2], [1.0, 1.2, -0.4],
                               velocity=0.3),
        ],
        "short": [make_line_segment((0, 0), (0.05, 0), velocity=1.0)],
        "reverse": [make_line_segment((0, 0), (2, 0), velocity=-0.5)],
    }


def test_fast_discretizer_matches_march():
    """The parallel chord-table resampler tracks the faithful march within
    ~1.5e-3 m everywhere its semantics are well-defined (the march itself
    has up to one ~10%-of-spacing late-emission bias, see
    ``get_next_n_poses_fast``'s docstring): line, multi-segment curvy,
    end-of-path padding, and reverse driving, over a u0 sweep."""
    from nmpc_nav_control_tpu.paths.discretizer import get_next_n_poses_fast

    dt, num = 0.025, 41
    march = jax.jit(lambda pl, u: get_next_n_poses(pl, u, dt, num))
    fast = jax.jit(lambda pl, u: get_next_n_poses_fast(pl, u, dt, num))
    for name, segs in _fast_march_cases().items():
        plist = make_path_list(segs, capacity=4)
        for u0 in (0.0, 0.3, 0.97):
            uu = jnp.asarray(u0, jnp.float64)
            a = np.asarray(march(plist, uu))
            b = np.asarray(fast(plist, uu))
            dpos = np.sqrt(((a[:, :2] - b[:, :2]) ** 2).sum(-1)).max()
            dth = np.abs(np.angle(np.exp(1j * (a[:, 2] - b[:, 2])))).max()
            assert dpos < 1.5e-3, f"{name} u0={u0}: dpos={dpos}"
            assert dth < 1e-2, f"{name} u0={u0}: dth={dth}"


def test_fast_discretizer_holonomic_heading():
    """omni4's holonomic mode samples the dedicated heading profile
    (``GetThetaHolomonic``, ``PathDiscretizer.cpp:83``); fast and march
    must agree on it too (the arc table ignores theta, so this pins that
    the final pose sampling still routes through the holonomic branch)."""
    from nmpc_nav_control_tpu.paths.discretizer import get_next_n_poses_fast

    dt, num = 0.025, 41
    plist = make_path_list(
        [make_cubic_segment([0.0, 1.0], [0.0, 0.4], velocity=0.6,
                            ch_coeffs=[0.2, 1.1, -0.5]),
         make_cubic_segment([1.0, 0.8, 0.2], [0.4, 0.7], velocity=0.4,
                            ch_coeffs=[0.8, -0.3])],
        capacity=4,
    )
    for u0 in (0.0, 0.4, 1.2):
        uu = jnp.asarray(u0, jnp.float64)
        a = np.asarray(get_next_n_poses(plist, uu, dt, num,
                                        is_holonomic=True))
        b = np.asarray(get_next_n_poses_fast(plist, uu, dt, num,
                                             is_holonomic=True))
        dpos = np.sqrt(((a[:, :2] - b[:, :2]) ** 2).sum(-1)).max()
        dth = np.abs(np.angle(np.exp(1j * (a[:, 2] - b[:, 2]))))
        assert dpos < 1.5e-3, f"u0={u0}: dpos={dpos}"
        # heading is continuous in u here, so no junction exemption needed
        assert dth.max() < 5e-3, f"u0={u0}: dth={dth.max()}"


def test_fast_discretizer_multi_speed_boundaries():
    """Short segments with contrasting speeds: the horizon crosses several
    speed boundaries, so each pose's spacing switches mid-horizon.  The
    exact per-segment solve must track the march through all of them (the
    rejected Jacobi formulation under-converged here by ~7 cm)."""
    from nmpc_nav_control_tpu.paths.discretizer import get_next_n_poses_fast

    dt, num = 0.025, 41
    plist = make_path_list(
        [make_line_segment((0, 0), (0.3, 0), velocity=0.9),
         make_line_segment((0.3, 0), (0.6, 0), velocity=0.3),
         make_line_segment((0.6, 0), (2.0, 0), velocity=0.7)],
        capacity=4,
    )
    march = jax.jit(lambda pl, u: get_next_n_poses(pl, u, dt, num))
    fast = jax.jit(lambda pl, u: get_next_n_poses_fast(pl, u, dt, num))
    for u0 in (0.0, 0.3, 0.97, 1.5):
        uu = jnp.asarray(u0, jnp.float64)
        a = np.asarray(march(plist, uu))
        b = np.asarray(fast(plist, uu))
        dpos = np.sqrt(((a[:, :2] - b[:, :2]) ** 2).sum(-1)).max()
        # worst case (u0 exactly on a boundary of a short fast segment) is
        # bounded by the march's own <=1-substep late-emission bias.
        assert dpos < 1e-2, f"u0={u0}: dpos={dpos}"


def test_fast_discretizer_junction_ambiguity_bounded():
    """At a heading-discontinuous segment junction the emission may land on
    either side (the march's overshoot-discard vs exact spacing), so theta
    can differ by the junction's heading jump for that ONE pose — but the
    position deviation stays sub-centimeter and every other pose agrees."""
    from nmpc_nav_control_tpu.paths.discretizer import get_next_n_poses_fast

    s1 = make_line_segment((0, 0), (1, 0), velocity=0.8)
    s2 = make_cubic_segment([1.0, 1.0, 0.0], [0.0, 0.5, 0.5], velocity=0.5)
    plist = make_path_list([s1, s2], capacity=4)
    uu = jnp.asarray(0.3, jnp.float64)
    a = np.asarray(get_next_n_poses(plist, uu, 0.025, 41))
    b = np.asarray(get_next_n_poses_fast(plist, uu, 0.025, 41))
    dpos = np.sqrt(((a[:, :2] - b[:, :2]) ** 2).sum(-1))
    assert dpos.max() < 1e-2
    dth = np.abs(np.angle(np.exp(1j * (a[:, 2] - b[:, 2]))))
    assert (dth > 1e-2).sum() <= 1          # at most the junction pose


def test_fast_discretizer_edge_cases():
    """Degenerate inputs that break naive resamplers: a zero-length segment
    mid-path (flat arc table), a speed change across a junction, u0 at/past
    the path end, and an empty path.  Must stay finite, keep the end-of-path
    padding contract, and stay near the march where it is defined."""
    from nmpc_nav_control_tpu.paths.discretizer import get_next_n_poses_fast

    dt, num = 0.025, 41
    # zero-length segment between two lines + speed change 0.8 -> 0.2
    degen = make_cubic_segment([1.0], [0.0], velocity=0.8)    # constant point
    plist = make_path_list(
        [make_line_segment((0, 0), (1, 0), velocity=0.8),
         degen,
         make_line_segment((1, 0), (2, 0), velocity=0.2)],
        capacity=4,
    )
    march = jax.jit(lambda pl, u: get_next_n_poses(pl, u, dt, num))
    fast = jax.jit(lambda pl, u: get_next_n_poses_fast(pl, u, dt, num))
    # Before the degenerate segment is reached, fast == march.
    a = np.asarray(march(plist, jnp.asarray(0.0, jnp.float64)))
    b = np.asarray(fast(plist, jnp.asarray(0.0, jnp.float64)))
    assert np.sqrt(((a[:, :2] - b[:, :2]) ** 2).sum(-1)).max() < 1.5e-3
    # ON/past the zero-tangent segment the behaviors deliberately diverge:
    # the march inherits the reference's du = rel/|dP/du| -> inf artifact
    # (jumps straight to the path end, ``PathDiscretizer.cpp:31,52``); the
    # fast resampler treats zero tangent as zero arc and keeps resampling
    # the remaining path.  Require the fast output to be sane: finite,
    # on-path, x monotone non-decreasing.
    for u0 in (0.9, 1.5):
        b = np.asarray(fast(plist, jnp.asarray(u0, jnp.float64)))
        assert np.isfinite(b).all(), f"u0={u0}"
        assert (np.abs(b[:, 1]) < 1e-9).all(), f"u0={u0}: off path"
        assert (np.diff(b[:, 0]) > -1e-9).all(), f"u0={u0}: non-monotone"
        assert b[:, 0].min() >= -1e-9 and b[:, 0].max() <= 2.0 + 1e-9

    # u0 at and past the end: all poses collapse to the end pose
    short = make_path_list([make_line_segment((0, 0), (1, 0))], capacity=2)
    for u0 in (1.0, 1.7):
        b = np.asarray(fast(short, jnp.asarray(u0, jnp.float64)))
        np.testing.assert_allclose(b, np.tile(b[-1], (num, 1)), atol=1e-9)
        np.testing.assert_allclose(b[-1][:2], [1.0, 0.0], atol=1e-9)

    # empty path list (count == 0): finite, matches the march's padding
    empty = make_path_list([make_line_segment((0, 0), (1, 0))], capacity=2)
    empty = empty._replace(count=jnp.asarray(0, jnp.int32))
    b = np.asarray(fast(empty, jnp.asarray(0.0, jnp.float64)))
    a = np.asarray(march(empty, jnp.asarray(0.0, jnp.float64)))
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_fast_discretizer_vmap_consistent():
    """Batched (vmap) fast discretization is lane-exact vs single calls."""
    from nmpc_nav_control_tpu.paths.discretizer import get_next_n_poses_fast

    segs = _fast_march_cases()["curvy"]
    plist = make_path_list(segs, capacity=4)
    u0s = jnp.asarray([0.0, 0.2, 0.8, 1.5], jnp.float64)
    batched = jax.jit(jax.vmap(
        lambda u: get_next_n_poses_fast(plist, u, 0.025, 41)))(u0s)
    for i, u0 in enumerate(u0s):
        single = get_next_n_poses_fast(plist, u0, 0.025, 41)
        np.testing.assert_allclose(batched[i], single, atol=1e-12)


def _three_seg_window(dtype=jnp.float64):
    segs = [
        make_line_segment((0, 0), (2, 0), velocity=1.0, frame_id=1),
        make_line_segment((2, 0), (4, 0), velocity=1.0, frame_id=1),
        make_line_segment((4, 0), (6, 0), velocity=1.0, frame_id=1),
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *segs)
    cap = 8

    def pad(x):
        return jnp.pad(x, [(0, cap - 3)] + [(0, 0)] * (x.ndim - 1))

    return jax.tree_util.tree_map(pad, stacked), cap


def test_select_rows_matches_indexing():
    """``windowing.select_rows`` (the gather-free one-hot row select used on
    the fleet hot path) is value-exact vs plain fancy indexing for both f
    and int leaves, scalar and vector indices, incl. under vmap."""
    from nmpc_nav_control_tpu.paths.windowing import select_rows

    segs = make_path_list(
        [make_line_segment((i, 0), (i + 1, 0), velocity=0.1 * (i + 1),
                           frame_id=i + 3) for i in range(3)],
        capacity=5,
    ).segs
    for idx in (jnp.asarray(2), jnp.asarray([0, 2, 1, 4])):
        got = select_rows(segs, idx)
        want = jax.tree_util.tree_map(lambda leaf: leaf[idx], segs)
        for g, w in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # batched indices over shared segs
    idxs = jnp.asarray([0, 1, 4])
    got = jax.vmap(lambda i: select_rows(segs, i))(idxs)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(lambda leaf: leaf[idxs], segs))):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_windowing_top_up_respects_length_cap():
    new_segs, cap = _three_seg_window()
    win = window_init(cap, jnp.float64)
    win = ingest(win, new_segs, 3, max_active_path_length=5.0)
    # Each segment is 2 m; greedy top-up takes until >= 5 m -> 3 segments
    # (2+2 < 5 so a third is pulled in).
    assert int(win.active_count) == 3
    assert float(active_length(win, 0.0)) == 6.0


def test_windowing_velocity_sign_barrier():
    segs = [
        make_line_segment((0, 0), (2, 0), velocity=1.0, frame_id=1),
        make_line_segment((2, 0), (4, 0), velocity=-1.0, frame_id=1),
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *segs)
    cap = 4
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.pad(x, [(0, cap - 2)] + [(0, 0)] * (x.ndim - 1)), stacked
    )
    win = window_init(cap, jnp.float64)
    win = ingest(win, stacked, 2, max_active_path_length=5.0)
    # Sign flip between seg 0 and 1 blocks the second segment.
    assert int(win.active_count) == 1
    assert int(win.total_count) == 2
    assert float(path_remains(win, jnp.asarray(0.25))) == 1.75


def test_windowing_pop_and_rotate():
    new_segs, cap = _three_seg_window()
    win = window_init(cap, jnp.float64)
    win = ingest(win, new_segs, 3, max_active_path_length=3.0)
    assert int(win.active_count) == 2  # 2 m + 2 m >= 3 m cap
    # Robot passed 1.4 curves -> pop 1, u rebased to 0.4.
    win, u = pop_completed(win, jnp.asarray(1.4, jnp.float64))
    assert int(win.active_count) == 1 and abs(float(u) - 0.4) < 1e-12
    assert int(win.total_count) == 2
    # Active list view starts at the second segment.
    pl = active_path_list(win, capacity=4)
    p = np.asarray(pose_sample(pl, jnp.asarray(0.0, jnp.float64), False))
    np.testing.assert_allclose(p[:2], [2.0, 0.0], atol=1e-12)
    # End-of-curve rotation pulls in the third segment.
    win = rotate_end_of_curve(win)
    assert int(win.active_count) == 1 and int(win.total_count) == 1
    pl = active_path_list(win, capacity=4)
    p = np.asarray(pose_sample(pl, jnp.asarray(0.0, jnp.float64), False))
    np.testing.assert_allclose(p[:2], [4.0, 0.0], atol=1e-12)


def test_ingest_drops_empty_frame_segments():
    segs = [
        make_line_segment((0, 0), (1, 0), frame_id=0),   # empty frame: dropped
        make_line_segment((1, 0), (2, 0), frame_id=1),
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *segs)
    cap = 4
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.pad(x, [(0, cap - 2)] + [(0, 0)] * (x.ndim - 1)), stacked
    )
    win = window_init(cap, jnp.float64)
    win = ingest(win, stacked, 2, max_active_path_length=5.0)
    assert int(win.total_count) == 1
    pl = active_path_list(win, capacity=4)
    p = np.asarray(pose_sample(pl, jnp.asarray(0.0, jnp.float64), False))
    np.testing.assert_allclose(p[:2], [1.0, 0.0], atol=1e-12)
