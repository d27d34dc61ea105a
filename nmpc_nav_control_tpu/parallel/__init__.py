from nmpc_nav_control_tpu.parallel.sharding import (
    make_mesh,
    replicate,
    shard_leading_axis,
)

__all__ = ["make_mesh", "replicate", "shard_leading_axis"]
