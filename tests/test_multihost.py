"""Multi-host helpers on the virtual 8-device CPU mesh.

A single pytest process plays one host; the host-local <-> global array
plumbing and the process-major mesh layout are exercised end-to-end through
a fleet tick.  True 2-host scaling is a hardware benchmark (BASELINE.json
north star), not a CI assertion.
"""
import jax
import jax.numpy as jnp
import numpy as np

from nmpc_nav_control_tpu.control import make_controller
from nmpc_nav_control_tpu.control.state_machine import Measurements, NavConfig
from nmpc_nav_control_tpu.parallel import (
    global_data_mesh,
    global_to_local,
    local_batch,
    local_to_global,
)
from nmpc_nav_control_tpu.parallel.fleet import Fleet, FleetGroup

DTYPE = jnp.float64


def test_global_data_mesh_layout():
    mesh = global_data_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == len(jax.devices())
    # Process-major: device process indices are non-decreasing along the axis.
    procs = [d.process_index for d in mesh.devices.ravel()]
    assert procs == sorted(procs)


def test_local_batch_divides():
    assert local_batch(32) == 32 // jax.process_count()


def test_local_global_roundtrip():
    mesh = global_data_mesh()
    tree = {
        "a": np.arange(16, dtype=np.float32).reshape(16, 1),
        "b": np.ones((16, 3, 2), np.float64),
    }
    g = local_to_global(mesh, tree)
    assert g["a"].sharding.spec == jax.sharding.PartitionSpec("data", None)
    back = global_to_local(g)
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["b"], tree["b"])


def test_2d_mesh_box_ipm_matches_1d():
    """One-program (batch x stage) mesh: the full box-IPM with the scenario
    batch on ``data`` and the horizon on ``stage`` must match the unsharded
    path lane for lane (sharding changes placement, not numerics).
    SURVEY.md §2.4 row 3; VERDICT r1 item 4."""
    from nmpc_nav_control_tpu.parallel import make_mesh, solve_box_qp_2d
    from nmpc_nav_control_tpu.qp.ipm import BoxQP, solve_box_qp

    mesh = make_mesh((2, 4), ("data", "stage"))
    B, N, nx, nu = 4, 16, 4, 2
    idxbx, idxbu = (1, 3), (0, 1)
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.normal(size=(B, N, nx, nx)) * 0.2 + np.eye(nx) * 0.9,
                    DTYPE)
    Bm = jnp.asarray(rng.normal(size=(B, N, nx, nu)) * 0.4, DTYPE)
    qp = BoxQP(
        A=A, B=Bm,
        c=jnp.asarray(rng.normal(size=(B, N, nx)) * 0.05, DTYPE),
        Qd=jnp.asarray(rng.uniform(0.5, 2.0, size=(B, N + 1, nx)), DTYPE),
        qx=jnp.asarray(rng.normal(size=(B, N + 1, nx)) * 0.5, DTYPE),
        Rd=jnp.asarray(rng.uniform(0.5, 2.0, size=(B, N, nu)), DTYPE),
        qu=jnp.asarray(rng.normal(size=(B, N, nu)) * 0.5, DTYPE),
        dx0=jnp.asarray(rng.normal(size=(B, nx)) * 0.1, DTYPE),
        lbx=jnp.full((B, N, 2), -1.0, DTYPE),
        ubx=jnp.full((B, N, 2), 1.0, DTYPE),
        lbu=jnp.full((B, N, 2), -2.0, DTYPE),
        ubu=jnp.full((B, N, 2), 2.0, DTYPE),
    )
    sol_2d = solve_box_qp_2d(qp, idxbx, idxbu, mesh, iters=12)
    # Sharded over both axes as annotated.
    assert sol_2d.dxs.shape == (B, N + 1, nx)

    sol_1d = jax.vmap(
        lambda q: solve_box_qp(q, idxbx, idxbu, iters=12, stage_parallel=True)
    )(qp)
    np.testing.assert_allclose(
        np.asarray(sol_2d.dxs), np.asarray(sol_1d.dxs), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sol_2d.dus), np.asarray(sol_1d.dus), atol=1e-10
    )
    assert float(np.max(np.asarray(sol_2d.mu))) < 1e-8


def test_fleet_tick_through_multihost_io():
    mesh = global_data_mesh()
    B = 16
    spec, data = make_controller(
        "diff", 0.025, 10, dist_b=0.27, tau_v=0.1, v_max=1.0, a_max=2.0,
        q_diag=[10, 10, 5, 0, 0, 0, 0], r_diag=[1, 1],
        ipm_iters=6, dtype=DTYPE)
    fleet = Fleet(
        {"diff": FleetGroup(spec=spec, data=data,
                            cfg=NavConfig(path_capacity=4), batch=B)},
        mesh=mesh, dtype=DTYPE,
    )
    lb = local_batch(B)
    meas_local = Measurements(
        pose=np.zeros((lb, 3)),
        vel=np.zeros((lb, 3)),
        steer_angle=np.zeros((lb,)),
        pose_valid=np.ones((lb,), bool),
        vel_valid=np.ones((lb,), bool),
        steer_valid=np.ones((lb,), bool),
    )
    gmeas = local_to_global(mesh, meas_local)
    outs = fleet.tick({"diff": gmeas})
    local_out = global_to_local(outs["diff"])
    assert local_out.cmd.v.shape[0] == lb
    assert np.isfinite(local_out.kkt_res).all()
