from nmpc_nav_control_tpu.runtime.config import RobotConfig, from_dict, load_config
from nmpc_nav_control_tpu.runtime.executor import RealTimeExecutor
from nmpc_nav_control_tpu.runtime.messages import (
    ControlStatus,
    FrameTable,
    ParametricPath,
    ParametricPathSet,
    ParametricPathSet2,
    PoseStamped,
    PosePath,
    Twist,
    decode_path_set,
)
from nmpc_nav_control_tpu.runtime.models_config import (
    controller_from_models_params,
    load_models_config,
    prepare_solvers,
)
from nmpc_nav_control_tpu.runtime.node import NmpcNavControlNode

__all__ = [
    "ControlStatus",
    "FrameTable",
    "NmpcNavControlNode",
    "ParametricPath",
    "ParametricPathSet",
    "ParametricPathSet2",
    "PoseStamped",
    "PosePath",
    "RealTimeExecutor",
    "RobotConfig",
    "Twist",
    "controller_from_models_params",
    "decode_path_set",
    "from_dict",
    "load_config",
    "load_models_config",
    "prepare_solvers",
]
