"""Command-line entry point: ``python -m nmpc_nav_control_tpu <cmd>``.

The analog of the reference's executables and launch files:

  prepare   — offline solver preparation from a models YAML; the
              ``scripts/generate_acados_libs.py`` +
              ``launch/run_nmpc_nav_control_generate_libs.launch`` analog
              (compiles into the persistent JAX cache instead of emitting
              ``.so`` files, then smoke-solves each geometry).
  run       — construct the node from a runtime YAML and drive it with the
              fixed-rate executor against a simulated robot; the
              ``src/main.cpp`` + ``launch/run_nmpc_nav_control.launch``
              analog (with the simulated plant standing in for ROS/TF I/O).
  bench     — the headline throughput benchmark (same as ``python bench.py``).
  export    — serialize the jitted control tick to a portable AOT artifact
              (jax.export / StableHLO); the closest analog of the
              reference's generated ``libacados_ocp_solver_*.so`` capsules —
              a serving host loads it without the model-definition code.
"""
from __future__ import annotations

import argparse
import math
import os
import sys


def _enable_persistent_cache() -> None:
    import jax

    cache = os.environ.get(
        "NMPC_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                     ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def cmd_prepare(args) -> int:
    _enable_persistent_cache()
    from nmpc_nav_control_tpu.runtime.models_config import prepare_solvers

    try:
        built = prepare_solvers(args.models_config, geometries=args.geometry)
    except (ValueError, RuntimeError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    print(f"prepared {len(built)} solver(s): {', '.join(sorted(built))}")
    return 0


def cmd_run(args) -> int:
    _enable_persistent_cache()
    import logging

    from nmpc_nav_control_tpu.utils.telemetry import configure, metrics

    # Structured JSON-lines logs to stderr (the host opts in; the library
    # never configures logging on import).  --log-level debug turns on the
    # per-tick main_cycle/nmpc_solver channels.
    configure(level=getattr(logging, args.log_level.upper()))
    from nmpc_nav_control_tpu.runtime import (
        NmpcNavControlNode,
        ParametricPath,
        ParametricPathSet2,
        PoseStamped,
        RealTimeExecutor,
        load_config,
    )
    from nmpc_nav_control_tpu.runtime.simulation import SimulatedRobot

    config = load_config(args.config)
    node = NmpcNavControlNode(config)
    robot = SimulatedRobot(node, noise_sigma=args.noise,
                           start_pose=tuple(args.start))

    if args.path is not None:
        # --path x0 y0 x1 y1 ... : piecewise-linear segments at --path-vel.
        pts = [tuple(args.path[i:i + 2]) for i in range(0, len(args.path), 2)]
        paths = [
            ParametricPath(
                frame_id=config.global_frame_id,
                cx=[p0[0], p1[0] - p0[0]],
                cy=[p0[1], p1[1] - p0[1]],
                velocity=args.path_vel,
            )
            for p0, p1 in zip(pts[:-1], pts[1:])
        ]
        node.on_path_no_stack_up_2(ParametricPathSet2(paths=paths, request_id=1))
        mode = f"FollowPath ({len(paths)} segments)"
    else:
        goal = args.goal
        node.on_pose_goal(PoseStamped(frame_id=config.global_frame_id,
                                      x=goal[0], y=goal[1], theta=goal[2]))
        mode = f"GoToPose ({goal[0]}, {goal[1]}, {goal[2]})"

    print(f"{config.steering_geometry} node @ {config.control_freq} Hz, "
          f"N={config.horizon}: {mode}")
    executor = RealTimeExecutor(node, robot, robot,
                                use_native_timer=not args.no_rt)
    report_every = max(1, int(args.ticks / 10))
    ran = 0
    for start in range(0, args.ticks, report_every):
        n = min(report_every, args.ticks - start)
        executor.run(n)
        ran += n
        p = robot.pose
        st = robot.last_status
        print(f"t={ran * config.dt:6.2f}s pose=({p[0]:+.3f},{p[1]:+.3f},"
              f"{p[2]:+.3f}) status={st.status if st else '?'}")
        if st is not None and st.status == 0 and ran * config.dt > 0.5:
            print("goal reached -> Idle")
            break

    stats = node.timing_stats()
    if stats:
        print(f"cycles={stats['cycles']} p50={stats['p50_ms']:.1f}ms "
              f"p99={stats['p99_ms']:.1f}ms budget={stats['budget_ms']:.0f}ms "
              f"overruns={executor.overruns}")
    if args.metrics:
        import json

        print("metrics: " + json.dumps(metrics().snapshot()))
    if args.goal is not None and args.path is None:
        err = math.hypot(robot.pose[0] - args.goal[0],
                         robot.pose[1] - args.goal[1])
        print(f"final position error: {err * 100:.2f} cm")
    return 0


def cmd_export(args) -> int:
    _enable_persistent_cache()
    from nmpc_nav_control_tpu.runtime.aot import save_tick
    from nmpc_nav_control_tpu.runtime.config import load_config

    config = load_config(args.config)
    platforms = tuple(args.platform) if args.platform else ("tpu", "cpu")
    meta = save_tick(config, args.output, batch=args.batch,
                     platforms=platforms)
    print(f"exported {meta['geometry']} tick (N={meta['horizon']}, "
          f"batch={meta['batch']}, platforms={meta['platforms']}) "
          f"-> {args.output}")
    return 0


def cmd_bench(args) -> int:
    import runpy

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
    runpy.run_path(os.path.join(root, "bench.py"), run_name="__main__")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m nmpc_nav_control_tpu",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("prepare", help="compile + smoke-test solvers from a "
                                       "models YAML (codegen analog)")
    p.add_argument("models_config", help="models YAML path "
                                         "(the *_params schema)")
    p.add_argument("--geometry", action="append",
                   choices=["diff", "omni4", "tric"],
                   help="restrict to specific geometries (repeatable)")
    p.set_defaults(fn=cmd_prepare)

    p = sub.add_parser("run", help="run the node against a simulated robot")
    p.add_argument("--config", required=True, help="runtime YAML path")
    p.add_argument("--ticks", type=int, default=400)
    p.add_argument("--goal", nargs=3, type=float, default=[1.0, 0.3, 0.5],
                   metavar=("X", "Y", "THETA"))
    p.add_argument("--path", nargs="+", type=float, default=None,
                   metavar="XY", help="waypoints x0 y0 x1 y1 ... (overrides "
                                      "--goal; piecewise-linear path)")
    p.add_argument("--path-vel", type=float, default=0.5)
    p.add_argument("--start", nargs=3, type=float, default=[0.0, 0.0, 0.0])
    p.add_argument("--noise", type=float, default=0.0,
                   help="actuation noise sigma")
    p.add_argument("--no-rt", action="store_true",
                   help="Python timer instead of the native RT timer")
    p.add_argument("--log-level", default="info",
                   choices=["debug", "info", "warning", "error"],
                   help="structured-log level (debug enables the per-tick "
                        "main_cycle/nmpc_solver channels)")
    p.add_argument("--metrics", action="store_true",
                   help="dump the metrics-registry snapshot at exit")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("export", help="serialize the jitted tick to an AOT "
                                      "artifact (capsule analog)")
    p.add_argument("--config", required=True, help="runtime YAML path")
    p.add_argument("-o", "--output", required=True, help="artifact path")
    p.add_argument("--batch", type=int, default=None,
                   help="export the vmapped fleet tick over this many lanes")
    p.add_argument("--platform", action="append", default=None,
                   help="lowering platform (repeatable; default tpu+cpu)")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("bench", help="headline throughput benchmark")
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    if args.cmd == "run" and args.path is not None and len(args.path) % 2:
        ap.error("--path needs an even number of values (x y pairs)")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
