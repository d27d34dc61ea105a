"""CLI entry point, models-config loader, and simulated-robot backend.

Covers the analogs of the reference's executables: ``prepare`` vs
``scripts/generate_acados_libs.py`` (YAML -> solvers + smoke solve) and
``run`` vs ``src/main.cpp`` + launch (node + fixed-rate executor), with the
``SimulatedRobot`` plant standing in for ROS/TF I/O.
"""
import math

import pytest

from nmpc_nav_control_tpu.__main__ import main as cli_main
from nmpc_nav_control_tpu.runtime import (
    NmpcNavControlNode,
    PoseStamped,
    RealTimeExecutor,
    controller_from_models_params,
    from_dict,
    load_models_config,
    prepare_solvers,
)
from nmpc_nav_control_tpu.runtime.simulation import SimulatedRobot

# Tiny problem so CPU compiles stay fast: N = ceil(0.25 * 20) = 5.
_TINY_MODELS_YAML = """
diff_params:
  tf_ini: 0.25
  freq: 20
  dist_b: 0.270
  tau_v: 0.1
  v_max: 1.0
  a_max: 2.0
  Q_diag:  [10.0, 10.0, 5.0, 0.0, 0.0, 0.0, 0.0]
  R_diag:  [1.0, 1.0]
  QN_diag: [1000.0, 1000.0, 500.0, 0.0, 0.0, 0.0, 0.0]

tric_params:
  tf_ini: 0.25
  freq: 20
  dist_d: 0.270
  tau_v: 0.1
  tau_a: 0.5
  v_max: 1.0
  a_max: 1.0
  alpha_min: -30.0
  alpha_max: 30.0
  dalpha_max: 120.0
  Q_diag:  [10.0, 10.0, 5.0, 0.0, 0.0, 0.0, 0.0]
  R_diag:  [1.0, 1.0]
  QN_diag: [1000.0, 1000.0, 500.0, 0.0, 0.0, 0.0, 0.0]
"""

_TINY_RUNTIME_YAML = """
steering_geometry: diff
control_freq: 20
tf_ini: 0.5
final_position_error: 0.03
final_orientation_error: 5.0
rob_dist_between_wh: 0.270
rob_wh_vel_time_const: 0.1
rob_wh_max_vel: 1.0
rob_wh_max_ace: 2.0
cost_matrix_weights_state_diag: [10.0, 10.0, 5.0, 0.0, 0.0, 0.0, 0.0]
cost_matrix_weights_input_diag: [1.0, 1.0]
"""


@pytest.fixture(scope="module")
def models_yaml(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "models.yaml"
    p.write_text(_TINY_MODELS_YAML)
    return str(p)


def test_load_models_config(models_yaml):
    sections = load_models_config(models_yaml)
    assert set(sections) == {"diff", "tric"}
    assert sections["diff"]["dist_b"] == 0.270


def test_load_models_config_missing_key(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("diff_params:\n  tf_ini: 1.0\n")
    with pytest.raises(ValueError, match="diff_params is missing"):
        load_models_config(str(p))


def test_load_models_config_empty(tmp_path):
    p = tmp_path / "empty.yaml"
    p.write_text("unrelated: 1\n")
    with pytest.raises(ValueError, match="no \\*_params"):
        load_models_config(str(p))


def test_models_params_horizon_and_deg_conversion(models_yaml):
    sections = load_models_config(models_yaml)
    spec, data = controller_from_models_params("tric", sections["tric"])
    # N = ceil(tf_ini * freq) (scripts/*/common.py:5-10)
    assert spec.dims.N == 5
    # alpha bounds deg->rad (scripts/tric/common.py:17-19)
    assert float(data.ubx[1]) == pytest.approx(math.radians(30.0), rel=1e-6)
    # QN_diag (not Q_diag) is the terminal weight in offline-style builds.
    assert float(data.qe_diag[0]) == pytest.approx(1000.0)
    assert float(data.q_diag[0]) == pytest.approx(10.0)


def test_prepare_solvers_smoke(models_yaml):
    built = prepare_solvers(models_yaml, log=lambda *_: None)
    assert set(built) == {"diff", "tric"}


def test_prepare_solvers_geometry_filter(models_yaml):
    built = prepare_solvers(models_yaml, geometries=["diff"],
                            log=lambda *_: None)
    assert set(built) == {"diff"}


def test_cli_prepare(models_yaml, capsys):
    assert cli_main(["prepare", models_yaml, "--geometry", "diff"]) == 0
    out = capsys.readouterr().out
    assert "smoke solve OK" in out


def test_cli_prepare_bad_file(tmp_path, capsys):
    p = tmp_path / "bad.yaml"
    p.write_text("nothing: here\n")
    assert cli_main(["prepare", str(p)]) == 1


def test_cli_run_pose_goal(tmp_path, capsys):
    cfg = tmp_path / "runtime.yaml"
    cfg.write_text(_TINY_RUNTIME_YAML)
    rc = cli_main([
        "run", "--config", str(cfg), "--ticks", "120", "--no-rt",
        "--goal", "0.4", "0.0", "0.0",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "GoToPose" in out


def test_cli_export_roundtrip(tmp_path, capsys):
    """``export`` writes a loadable AOT artifact (capsule analog)."""
    cfg = tmp_path / "runtime.yaml"
    cfg.write_text(_TINY_RUNTIME_YAML)
    out = tmp_path / "tick.nmpcaot"
    rc = cli_main(["export", "--config", str(cfg), "-o", str(out),
                   "--platform", "cpu"])
    assert rc == 0
    assert "exported diff tick" in capsys.readouterr().out

    from nmpc_nav_control_tpu.runtime.aot import load_tick
    aot = load_tick(out.read_bytes())
    assert aot.meta["geometry"] == "diff"
    assert aot.meta["horizon"] == 10


def test_simulated_robot_converges_to_goal():
    node = NmpcNavControlNode(from_dict({
        "steering_geometry": "diff",
        "control_freq": 20, "tf_ini": 0.5,
        "rob_dist_between_wh": 0.27, "rob_wh_vel_time_const": 0.1,
        "rob_wh_max_vel": 1.0, "rob_wh_max_ace": 2.0,
        "cost_matrix_weights_state_diag": [10, 10, 5, 0, 0, 0, 0],
        "cost_matrix_weights_input_diag": [1, 1],
        "final_position_error": 0.05, "final_orientation_error": 10.0,
    }))
    robot = SimulatedRobot(node)
    node.on_pose_goal(PoseStamped(frame_id="map", x=0.5, y=0.1, theta=0.0))
    executor = RealTimeExecutor(node, robot, robot, use_native_timer=False)
    for _ in range(30):
        executor.run(10)
        st = robot.last_status
        if st is not None and st.status == 0:
            break
    err = math.hypot(robot.pose[0] - 0.5, robot.pose[1] - 0.1)
    assert err < 0.1, f"robot did not approach goal: err={err:.3f}"
