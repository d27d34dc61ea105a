"""Closed-loop pose-goal simulation demo.

The assertion-free analog of the reference's standalone simulation scripts
(``scripts/test_scripts/acados_sim_diff.py`` etc.): a noisy plant driven by
the controller at 40 Hz, with an optional matplotlib trajectory plot.

Usage:
  python examples/sim_pose_goal.py [diff|omni4|tric] [--noise 0.05] [--plot]
"""
from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

from nmpc_nav_control_tpu.control import (
    controller_init,
    controller_step,
    make_controller,
)
from nmpc_nav_control_tpu.models import diff, omni4
from nmpc_nav_control_tpu.ocp.integrator import rk4_step

DT = 0.025
# Reference default horizon is N = 80 (tf_ini = 2 s at 40 Hz); N = 40 keeps
# first-compile latency low on the tunneled dev chip — pass --horizon 80 for
# the reference configuration.
N = 40


def build(geometry: str, dtype, N):
    if geometry == "diff":
        return make_controller(
            "diff", DT, N, dist_b=0.27, tau_v=0.1, v_max=1.0, a_max=2.0,
            q_diag=[10.0, 10.0, 5.0, 0, 0, 0, 0], r_diag=[1.0, 1.0], dtype=dtype)
    if geometry == "omni4":
        return make_controller(
            "omni4", DT, N, l1_plus_l2=0.535, tau_v=0.1, v_max=1.0, a_max=1.0,
            q_diag=[10.0, 10.0, 10.0] + [0.0] * 8, r_diag=[1.0] * 4, dtype=dtype)
    return make_controller(
        "tric", DT, N, dist_d=0.27, tau_v=0.1, tau_a=0.5, v_max=1.0, a_max=1.0,
        alpha_min=-math.radians(30), alpha_max=math.radians(30),
        dalpha_max=math.radians(120),
        q_diag=[10.0, 10.0, 5.0, 0, 0, 0, 0], r_diag=[1.0, 1.0], dtype=dtype)


def main():
    global N
    ap = argparse.ArgumentParser()
    ap.add_argument("geometry", nargs="?", default="diff",
                    choices=["diff", "omni4", "tric"])
    ap.add_argument("--goal", nargs=3, type=float, default=[1.0, 0.3, 0.5])
    ap.add_argument("--noise", type=float, default=0.05,
                    help="actuation noise sigma (acados_sim_diff.py:148-159)")
    ap.add_argument("--ticks", type=int, default=600)
    ap.add_argument("--horizon", type=int, default=N)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    N = args.horizon
    dtype = jnp.float32
    spec, data = build(args.geometry, dtype, N)
    state = controller_init(spec, dtype)
    traj = jnp.zeros((N + 1, 3), dtype).at[0].set(jnp.asarray(args.goal, dtype))
    key = jax.random.PRNGKey(0)

    geom = args.geometry
    nxp = 7 if geom == "omni4" else 5
    plant = jnp.zeros(nxp, dtype)

    @jax.jit
    def tick(state, plant, key):
        pose = plant[:3]
        if geom == "diff":
            vl, vr = plant[3], plant[4]
            vel = jnp.stack([(vl + vr) / 2, jnp.zeros((), dtype), (vr - vl) / 0.27])
            steer = jnp.zeros((), dtype)
        elif geom == "omni4":
            v, vn, w = omni4.inverse_kinematics(plant[3], plant[4], plant[5], plant[6], 0.535)
            vel = jnp.stack([v, vn, w])
            steer = jnp.zeros((), dtype)
        else:
            vel = jnp.stack([plant[3], jnp.zeros((), dtype), jnp.zeros((), dtype)])
            steer = plant[4]
        state, cmd, stats = controller_step(
            spec, data, state, pose, vel, traj, 1, steer_angle=steer)
        key, sub = jax.random.split(key)
        if geom == "diff":
            refs = jnp.stack(diff.direct_kinematics(cmd.v, cmd.w, 0.27))

            def f(xp, u, p):
                x, y, th, vl_, vr_ = xp
                vb = 0.5 * (vl_ + vr_)
                return jnp.stack([vb * jnp.cos(th), vb * jnp.sin(th),
                                  (vr_ - vl_) / 0.27,
                                  (u[0] - vl_) / 0.1, (u[1] - vr_) / 0.1])
        elif geom == "omni4":
            refs = jnp.stack(omni4.direct_kinematics(cmd.v, cmd.vn, cmd.w, 0.535))

            def f(xp, u, p):
                th = xp[2]
                wv = xp[3:7]
                v_, vn_, w_ = omni4.inverse_kinematics(wv[0], wv[1], wv[2], wv[3], 0.535)
                ct, st = jnp.cos(th), jnp.sin(th)
                return jnp.concatenate([
                    jnp.stack([v_ * ct - vn_ * st, v_ * st + vn_ * ct, w_]),
                    (u - wv) / 0.1])
        else:
            refs = jnp.stack([cmd.v, cmd.w])  # (v_ref, alpha_ref)

            def f(xp, u, p):
                x, y, th, v_, al = xp
                return jnp.stack([v_ * jnp.cos(th) * jnp.cos(al),
                                  v_ * jnp.sin(th) * jnp.cos(al),
                                  v_ / 0.27 * jnp.sin(al),
                                  (u[0] - v_) / 0.1, (u[1] - al) / 0.5])

        refs = refs + args.noise * jax.random.normal(sub, refs.shape, dtype)
        plant = rk4_step(f, plant, refs, None, DT)
        return state, plant, key, stats

    xs, ys = [], []
    for t in range(args.ticks):
        state, plant, key, stats = tick(state, plant, key)
        xs.append(float(plant[0]))
        ys.append(float(plant[1]))
        if t % 80 == 0:
            p = np.asarray(plant)
            print(f"t={t * DT:5.2f}s pos=({p[0]:+.3f},{p[1]:+.3f}) "
                  f"theta={p[2]:+.3f} kkt={float(stats.kkt_res):.2e}")

    p = np.asarray(plant)
    err = math.hypot(p[0] - args.goal[0], p[1] - args.goal[1])
    print(f"final position error: {err * 100:.1f} cm (noise sigma={args.noise})")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.plot(xs, ys, "-")
        plt.plot([args.goal[0]], [args.goal[1]], "r*", markersize=12)
        plt.axis("equal")
        plt.savefig("sim_pose_goal.png", dpi=120)
        print("saved sim_pose_goal.png")


if __name__ == "__main__":
    main()
