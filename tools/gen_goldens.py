"""Generate golden u-trajectories from the NumPy f64 reference-RTI oracle.

Runs the independent oracle (``tests/oracle/numpy_rti.py`` — complex-step
RK4 sensitivities + dense condensed box-QP via OSQP-style ADMM plus an
exact active-set KKT polish, float64, JAX-free) through closed-loop
scenarios covering all three steering
geometries at both reference horizons (N=40 per BASELINE.json's metric,
N=80 per the reference default config ``scripts/diff/common.py:5-9``),
including the tricycle as-generated model bug
(``scripts/tric/tric_amr_model.py:45``), bound-saturating instances, and a
theta-wrapping arc-following case, and commits the resulting u-trajectories
to ``tests/goldens/*.npz``.

``tests/test_rti_oracle.py`` asserts the f32 production path tracks these
goldens within stated tolerances — the "u-traj parity vs acados RTI"
north-star check (BASELINE.md), with the oracle standing in for acados
exactly the way ``casadi_sim_diff.py`` stands in for it in the reference.

Usage:  python tools/gen_goldens.py [name ...]   (default: all)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oracle.numpy_rti import Scenario, closed_loop  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

Q_DIFF = (10.0, 10.0, 5.0, 0.0, 0.0, 0.0, 0.0)
Q_OMNI = (10.0, 10.0, 5.0) + (0.0,) * 8
R2 = (1.0, 1.0)
R4 = (1.0, 1.0, 1.0, 1.0)
DT = 0.025
T = 80  # 2 s of closed loop at 40 Hz

DEG = np.pi / 180.0

# The scenario suite. Bounds/params mirror config/nmpc_nav_control.yaml
# magnitudes; goals are chosen to exercise theta unwrap (|dtheta| > pi),
# input/state bound saturation, and the diff adaptive terminal hack
# (pose-goal mode always fires it: refs identical).
SCENARIOS = [
    Scenario(name="diff_pose_N40", geometry="diff", N=40, dt=DT, T=T,
             p=(0.27, 0.1), lbx=(-1.0, -1.0), ubx=(1.0, 1.0),
             lbu=(-2.0, -2.0), ubu=(2.0, 2.0), q=Q_DIFF, r=R2,
             mode="pose_goal", goal=(1.0, 0.4, 2.9)),
    Scenario(name="diff_pose_N80", geometry="diff", N=80, dt=DT, T=T,
             p=(0.27, 0.1), lbx=(-1.0, -1.0), ubx=(1.0, 1.0),
             lbu=(-2.0, -2.0), ubu=(2.0, 2.0), q=Q_DIFF, r=R2,
             mode="pose_goal", goal=(1.0, 0.4, 2.9)),
    Scenario(name="diff_tight_N40", geometry="diff", N=40, dt=DT, T=T,
             p=(0.27, 0.1), lbx=(-0.3, -0.3), ubx=(0.3, 0.3),
             lbu=(-1.0, -1.0), ubu=(1.0, 1.0), q=Q_DIFF, r=R2,
             mode="pose_goal", goal=(1.5, 0.0, 0.0)),
    Scenario(name="diff_arc_N40", geometry="diff", N=40, dt=DT, T=T,
             p=(0.27, 0.1), lbx=(-1.0, -1.0), ubx=(1.0, 1.0),
             lbu=(-2.0, -2.0), ubu=(2.0, 2.0), q=Q_DIFF, r=R2,
             mode="arc", x_init=(2.0, 0.0, np.pi / 2),
             arc_radius=2.0, arc_speed=0.5, arc_phi0=0.0),
    Scenario(name="omni4_pose_N40", geometry="omni4", N=40, dt=DT, T=T,
             p=(0.535, 0.1), lbx=(-1.0,) * 4, ubx=(1.0,) * 4,
             lbu=(-1.0,) * 4, ubu=(1.0,) * 4, q=Q_OMNI, r=R4,
             mode="pose_goal", goal=(0.8, 0.5, 1.2)),
    Scenario(name="omni4_pose_N80", geometry="omni4", N=80, dt=DT, T=T,
             p=(0.535, 0.1), lbx=(-1.0,) * 4, ubx=(1.0,) * 4,
             lbu=(-1.0,) * 4, ubu=(1.0,) * 4, q=Q_OMNI, r=R4,
             mode="pose_goal", goal=(0.8, 0.5, 1.2)),
    Scenario(name="tric_pose_N40", geometry="tric", N=40, dt=DT, T=T,
             p=(1.05, 0.1, 0.1), lbx=(-1.0, -60.0 * DEG),
             ubx=(1.0, 75.0 * DEG), lbu=(-2.0, -90.0 * DEG),
             ubu=(2.0, 90.0 * DEG), q=Q_DIFF, r=R2,
             mode="pose_goal", goal=(1.2, -0.4, -0.8),
             x_init=(0.0, 0.0, 0.0, 0.3, 0.1)),
    Scenario(name="tric_pose_N80", geometry="tric", N=80, dt=DT, T=T,
             p=(1.05, 0.1, 0.1), lbx=(-1.0, -60.0 * DEG),
             ubx=(1.0, 75.0 * DEG), lbu=(-2.0, -90.0 * DEG),
             ubu=(2.0, 90.0 * DEG), q=Q_DIFF, r=R2,
             mode="pose_goal", goal=(1.2, -0.4, -0.8),
             x_init=(0.0, 0.0, 0.0, 0.3, 0.1)),
    # bug-compat: nonzero (v, alpha) start — the origin is an uncontrollable
    # stationary point of the as-generated sin(alpha) dynamics.
    Scenario(name="tric_bug_pose_N40", geometry="tric_bug", N=40, dt=DT, T=T,
             p=(1.05, 0.1, 0.1), lbx=(-1.0, -60.0 * DEG),
             ubx=(1.0, 75.0 * DEG), lbu=(-2.0, -90.0 * DEG),
             ubu=(2.0, 90.0 * DEG), q=Q_DIFF, r=R2,
             mode="pose_goal", goal=(0.5, -0.15, -0.2),
             x_init=(0.0, 0.0, 0.0, 0.3, 0.2, 0.3, 0.2)),
]


def main(names=None):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for sc in SCENARIOS:
        if names and sc.name not in names:
            continue
        t0 = time.time()
        out = closed_loop(sc)
        meta = json.dumps({k: (list(v) if isinstance(v, tuple) else v)
                           for k, v in sc.__dict__.items()})
        path = os.path.join(GOLDEN_DIR, f"{sc.name}.npz")
        np.savez_compressed(path, us=out["us"], cmds=out["cmds"],
                            xs_plant=out["xs_plant"],
                            meta=np.frombuffer(meta.encode(), np.uint8))
        print(f"{sc.name}: T={sc.T} N={sc.N} "
              f"|u|max={np.abs(out['us']).max():.3f} "
              f"final_pose_err={np.linalg.norm(out['xs_plant'][-1, :2] - np.asarray(sc.goal[:2]) if sc.mode == 'pose_goal' else 0):.4f} "
              f"({time.time() - t0:.1f}s) -> {path}")


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)
