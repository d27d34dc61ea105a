"""Structured logging + metrics layer (utils/telemetry.py).

The reference's observability contract is named ROS log channels
(``ROS_DEBUG_NAMED("main_cycle"/"nmpc_solver")``,
``NMPCNavControlROS.cpp:513,715``) plus warnings/errors at failure sites;
here that surface is structured JSON-lines records and a metrics registry,
verified end-to-end through a real node tick.
"""
import io
import json
import logging

import jax.numpy as jnp
import pytest

from nmpc_nav_control_tpu.utils import telemetry


@pytest.fixture
def log_stream():
    """Route the package logger into a buffer for the duration of a test."""
    stream = io.StringIO()
    telemetry.configure(level=logging.DEBUG, stream=stream, force=True)
    yield stream
    telemetry.configure(level=logging.INFO, force=True)


def _records(stream):
    return [json.loads(line) for line in stream.getvalue().splitlines()]


class TestChannels:
    def test_json_lines_records(self, log_stream):
        ch = telemetry.channel("main_cycle")
        ch.debug("tick", cycle_ms=1.25, budget_ms=25.0)
        ch.warning("cycle_overrun", late_ms=3.0)
        recs = _records(log_stream)
        assert recs[0]["channel"] == "main_cycle"
        assert recs[0]["event"] == "tick"
        assert recs[0]["cycle_ms"] == 1.25
        assert recs[0]["level"] == "debug"
        assert recs[1]["level"] == "warning"
        assert "ts" in recs[0]

    def test_level_filtering(self, log_stream):
        telemetry.configure(level=logging.WARNING, stream=log_stream,
                            force=True)
        ch = telemetry.channel("nmpc_solver")
        ch.debug("solve", kkt_res=1e-6)
        ch.error("solver_failure", status=2)
        recs = _records(log_stream)
        assert [r["event"] for r in recs] == ["solver_failure"]

    def test_channel_cache(self):
        assert telemetry.channel("x") is telemetry.channel("x")

    def test_non_serializable_field_stringified(self, log_stream):
        telemetry.channel("node").info("evt", arr=jnp.zeros(2))
        (rec,) = _records(log_stream)
        assert isinstance(rec["arr"], str)


class TestMetrics:
    def test_counters_and_gauges(self):
        reg = telemetry.MetricsRegistry()
        reg.counter("ticks").inc()
        reg.counter("ticks").inc(4)
        reg.gauge("kkt").set(1.5e-7)
        snap = reg.snapshot()
        assert snap["ticks"] == 5
        assert snap["kkt"] == 1.5e-7
        assert snap["uptime_s"] >= 0
        reg.reset()
        assert "ticks" not in reg.snapshot()

    def test_default_registry_singleton(self):
        assert telemetry.metrics() is telemetry.metrics()


class TestNodeIntegration:
    """A real node tick must feed both the channels and the registry."""

    @pytest.fixture(scope="class")
    def node(self):
        from nmpc_nav_control_tpu.runtime import NmpcNavControlNode, from_dict

        cfg = from_dict({
            "steering_geometry": "diff",
            "control_freq": 40,
            "tf_ini": 0.2,  # N = 8 to keep the test quick
            "rob_dist_between_wh": 0.27,
            "rob_wh_vel_time_const": 0.1,
            "rob_wh_max_vel": 1.0,
            "rob_wh_max_ace": 2.0,
            "cost_matrix_weights_state_diag": [10.0, 10.0, 5.0, 0, 0, 0, 0],
            "cost_matrix_weights_input_diag": [1.0, 1.0],
            "final_position_error": 0.03,
            "final_orientation_error": 3.0,
        })
        return NmpcNavControlNode(cfg, dtype=jnp.float64)

    def test_tick_metrics_and_logs(self, node, log_stream):
        from nmpc_nav_control_tpu.runtime.messages import PoseStamped

        telemetry.metrics().reset()
        node.on_pose_goal(PoseStamped(frame_id="map", x=1.0, y=0.0,
                                      theta=0.0))
        node.tick((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
        snap = telemetry.metrics().snapshot()
        assert snap["node.ticks"] == 1
        assert "node.kkt_res" in snap and "node.cycle_ms" in snap
        events = {(r["channel"], r["event"]) for r in _records(log_stream)}
        assert ("main_cycle", "tick") in events
        assert ("nmpc_solver", "solve") in events
        # first tick logs the initial status
        assert ("node", "status_change") in events

    def test_invalid_command_logged(self, node, log_stream):
        assert node.on_control_command("bogus") is False
        recs = _records(log_stream)
        assert any(r["event"] == "invalid_control_command"
                   and r["level"] == "error" for r in recs)

    def test_overrun_counted(self, log_stream):
        from nmpc_nav_control_tpu.runtime.executor import RealTimeExecutor

        telemetry.metrics().reset()
        ex = RealTimeExecutor.__new__(RealTimeExecutor)
        ex.overruns = 0
        ex.period = 0.025
        ex.on_overrun = None
        ex._note_overrun(0.003)
        assert telemetry.metrics().snapshot()["executor.overruns"] == 1
        (rec,) = _records(log_stream)
        assert rec["event"] == "cycle_overrun" and rec["late_ms"] == 3.0
