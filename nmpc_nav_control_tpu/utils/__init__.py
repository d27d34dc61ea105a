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

__all__ = [
    "dist",
    "norm_ang_deg",
    "norm_ang_rad",
    "unwrap_angle",
    "LatencyStats",
    "device_trace",
    "steady_state_seconds_per_step",
]
