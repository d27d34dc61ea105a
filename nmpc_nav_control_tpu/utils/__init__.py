from nmpc_nav_control_tpu.utils.angles import (
    dist,
    norm_ang_deg,
    norm_ang_rad,
    unwrap_angle,
)

__all__ = ["dist", "norm_ang_deg", "norm_ang_rad", "unwrap_angle"]
