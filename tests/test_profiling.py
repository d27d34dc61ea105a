"""Profiling utilities: latency stats, chained-slope measurement, executor wiring."""
import jax.numpy as jnp
import numpy as np

from nmpc_nav_control_tpu.utils.profiling import (
    LatencyStats,
    steady_state_seconds_per_step,
)


def test_latency_stats_percentiles_and_budget():
    st = LatencyStats(budget_s=0.025)
    for ms in range(1, 101):  # 1..100 ms
        st.record(ms * 1e-3)
    s = st.summary()
    assert s["count"] == 100
    assert abs(s["p50_ms"] - 50.5) < 1.5
    assert s["p99_ms"] > 98.0
    assert s["max_ms"] == 100.0
    assert s["violations"] == 75  # 26..100 ms exceed the 25 ms budget
    assert s["budget_ms"] == 25.0


def test_latency_stats_ring_buffer():
    st = LatencyStats(max_samples=10)
    for i in range(25):
        st.record(float(i))
    s = st.summary()
    assert s["count"] == 25
    # Ring holds the last 10 samples (15..24).
    assert s["max_ms"] == 24e3
    assert s["p50_ms"] >= 15e3


def test_latency_stats_measure_context():
    st = LatencyStats()
    with st.measure():
        pass
    assert st.count == 1
    assert st.summary()["max_ms"] >= 0.0


def test_steady_state_seconds_per_step_runs():
    def step(c):
        return c * 1.0000001 + 0.1

    per_step = steady_state_seconds_per_step(
        step, jnp.ones((64,)), k_lo=1, k_hi=5, reps=2
    )
    assert np.isfinite(per_step)
    # Marginal slope of a trivial step must be tiny (well under a second);
    # it can be slightly negative from timer noise.
    assert per_step < 0.5


def test_executor_latency_accounting():
    from nmpc_nav_control_tpu.runtime import (
        NmpcNavControlNode,
        from_dict,
    )
    from nmpc_nav_control_tpu.runtime.executor import RealTimeExecutor

    node = NmpcNavControlNode(from_dict({
        "steering_geometry": "diff",
        "control_freq": 200, "tf_ini": 0.05,
        "rob_dist_between_wh": 0.27, "rob_wh_vel_time_const": 0.1,
        "rob_wh_max_vel": 1.0, "rob_wh_max_ace": 2.0,
        "cost_matrix_weights_state_diag": [10, 10, 5, 0, 0, 0, 0],
        "cost_matrix_weights_input_diag": [1, 1],
    }))

    class Provider:
        def get_state(self):
            return (0.0, 0.0, 0.0), (0.0, 0.0, 0.0), True

    class Sink:
        def publish_cmd_vel(self, twist):
            pass

        def publish_status(self, status):
            pass

    ex = RealTimeExecutor(node, Provider(), Sink(), use_native_timer=False)
    ex.run(cycles=3)
    s = ex.latency_stats()
    assert s["count"] == 3
    assert "p99_ms" in s and "budget_ms" in s
