from nmpc_nav_control_tpu.qp.ipm import BoxQP, IPMSolution, solve_box_qp
from nmpc_nav_control_tpu.qp.riccati import (
    RiccatiFactors,
    lqr_solve,
    riccati_factor,
    riccati_solve,
)

__all__ = [
    "BoxQP",
    "IPMSolution",
    "RiccatiFactors",
    "lqr_solve",
    "riccati_factor",
    "riccati_solve",
    "solve_box_qp",
]
