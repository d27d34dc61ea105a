from nmpc_nav_control_tpu.utils.angles import (
    dist,
    norm_ang_deg,
    norm_ang_rad,
    unwrap_angle,
)
from nmpc_nav_control_tpu.utils.profiling import (
    LatencyStats,
    device_trace,
    steady_state_seconds_per_step,
)
from nmpc_nav_control_tpu.utils.telemetry import (
    MetricsRegistry,
    channel,
    configure,
    metrics,
)

__all__ = [
    "MetricsRegistry",
    "channel",
    "configure",
    "metrics",
    "dist",
    "norm_ang_deg",
    "norm_ang_rad",
    "unwrap_angle",
    "LatencyStats",
    "device_trace",
    "steady_state_seconds_per_step",
]
