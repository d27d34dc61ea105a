"""Offline solver-preparation config: the codegen-toolchain analog.

The reference generates per-model C solvers offline from a models YAML
(``scripts/generate_acados_libs.py:24-51`` reading
``config/nmpc_nav_control_acados_models.yaml``, with per-geometry parameter
loaders in ``scripts/{diff,omni4,tric}/common.py``).  This framework has no
codegen — models are plain JAX functions and the solver specializes on shapes
at trace time — so the equivalent "generation" step is:

  1. parse the same ``{geom}_params`` schema (tf_ini/freq, robot constants,
     Q/R/QN diagonals, deg->rad for the tric steering bounds);
  2. build the controller (spec, data) pair;
  3. jit-compile one controller tick into JAX's persistent compilation cache
     (the ``.so`` analog: later node startups hit the cache and skip the
     multi-second first compile);
  4. run a smoke solve and fail on non-finite output (the reference's
     post-generation ``solve()`` check, ``scripts/diff/generate_c_code.py:79-83``).
"""
from __future__ import annotations

import math
from typing import Any, Mapping, Sequence

__all__ = [
    "GEOMETRIES",
    "load_models_config",
    "controller_from_models_params",
    "prepare_solvers",
]

GEOMETRIES = ("omni4", "diff", "tric")

_REQUIRED = {
    "diff": ("tf_ini", "freq", "dist_b", "tau_v", "v_max", "a_max",
             "Q_diag", "R_diag", "QN_diag"),
    "omni4": ("tf_ini", "freq", "l1_plus_l2", "tau_v", "v_max", "a_max",
              "Q_diag", "R_diag", "QN_diag"),
    "tric": ("tf_ini", "freq", "dist_d", "tau_v", "tau_a", "v_max", "a_max",
             "alpha_min", "alpha_max", "dalpha_max",
             "Q_diag", "R_diag", "QN_diag"),
}


def load_models_config(path: str) -> dict:
    """Parse a models YAML into ``{geometry: params}``.

    Accepts the reference schema verbatim: top-level ``omni4_params`` /
    ``diff_params`` / ``tric_params`` sections, each validated against the
    keys its ``scripts/<geom>/common.py`` loader reads.
    """
    import yaml

    with open(path) as fh:
        raw = yaml.safe_load(fh) or {}
    out = {}
    for geom in GEOMETRIES:
        section = raw.get(f"{geom}_params")
        if section is None:
            continue
        missing = [k for k in _REQUIRED[geom] if k not in section]
        if missing:
            raise ValueError(
                f"{geom}_params is missing: {', '.join(missing)}"
            )
        out[geom] = dict(section)
    if not out:
        raise ValueError(
            f"no *_params sections found in {path} "
            f"(expected one of: {', '.join(f'{g}_params' for g in GEOMETRIES)})"
        )
    return out


def controller_from_models_params(
    geometry: str,
    params: Mapping[str, Any],
    *,
    dtype=None,
    ipm_iters: int = 8,
    tric_bug_compat: bool = False,
):
    """Build (spec, data) from one ``{geom}_params`` section.

    Mirrors ``scripts/<geom>/common.py``: N = ceil(tf_ini * freq), tric
    steering bounds converted deg->rad (``scripts/tric/common.py:17-19``),
    and — unlike the runtime ctor path — the terminal weight comes from
    QN_diag, matching the offline-generated solvers.
    """
    import jax.numpy as jnp

    from nmpc_nav_control_tpu.control import make_controller

    if dtype is None:
        dtype = jnp.float32
    dt = 1.0 / float(params["freq"])
    N = int(math.ceil(float(params["tf_ini"]) / dt))
    common = dict(
        tau_v=float(params["tau_v"]),
        v_max=float(params["v_max"]),
        a_max=float(params["a_max"]),
        q_diag=[float(v) for v in params["Q_diag"]],
        r_diag=[float(v) for v in params["R_diag"]],
        qn_diag=[float(v) for v in params["QN_diag"]],
        ipm_iters=ipm_iters,
        dtype=dtype,
    )
    deg = math.pi / 180.0
    if geometry == "diff":
        return make_controller(
            "diff", dt, N, dist_b=float(params["dist_b"]), **common)
    if geometry == "omni4":
        return make_controller(
            "omni4", dt, N, l1_plus_l2=float(params["l1_plus_l2"]), **common)
    if geometry == "tric":
        return make_controller(
            "tric", dt, N,
            dist_d=float(params["dist_d"]),
            tau_a=float(params["tau_a"]),
            alpha_min=float(params["alpha_min"]) * deg,
            alpha_max=float(params["alpha_max"]) * deg,
            dalpha_max=float(params["dalpha_max"]) * deg,
            tric_bug_compat=tric_bug_compat,
            **common,
        )
    raise ValueError(f"unknown steering geometry: {geometry!r}")


def prepare_solvers(
    path: str,
    geometries: Sequence[str] | None = None,
    *,
    dtype=None,
    log=print,
) -> dict:
    """Compile + smoke-test every solver in a models YAML.

    The ``generate_acados_libs.py`` analog: for each ``{geom}_params``
    section, build the controller, jit one tick (populating the persistent
    compilation cache when ``jax_compilation_cache_dir`` is set), run a smoke
    solve, and raise on non-finite results.  Returns
    ``{geometry: (spec, data)}`` for direct reuse.
    """
    import jax
    import jax.numpy as jnp

    from nmpc_nav_control_tpu.control import controller_init, controller_step

    sections = load_models_config(path)
    built = {}
    for geom, params in sections.items():
        if geometries is not None and geom not in geometries:
            continue
        spec, data = controller_from_models_params(geom, params, dtype=dtype)
        dt = spec.dims.dt
        N = spec.dims.N
        log(f"[{geom}] building solver: N={N} dt={dt:.4f}s "
            f"nx={spec.dims.model.nx} nu={spec.dims.model.nu}")
        step = jax.jit(
            lambda state, pose, vel, traj, *, _s=spec, _d=data:
            controller_step(_s, _d, state, pose, vel, traj, 1)
        )
        state = controller_init(spec, data.q_diag.dtype)
        traj = jnp.zeros((N + 1, 3), data.q_diag.dtype).at[0, 0].set(
            jnp.asarray(0.5, data.q_diag.dtype)
        )
        state, cmd, stats = step(
            state,
            jnp.zeros(3, data.q_diag.dtype),
            jnp.zeros(3, data.q_diag.dtype),
            traj,
        )
        kkt = float(stats.kkt_res)
        vals = [float(cmd.v), float(cmd.vn), float(cmd.w), kkt]
        if not all(math.isfinite(v) for v in vals):
            raise RuntimeError(
                f"[{geom}] smoke solve produced non-finite output: "
                f"cmd={vals[:3]} kkt={kkt}"
            )
        log(f"[{geom}] smoke solve OK: cmd=({vals[0]:+.3f},{vals[1]:+.3f},"
            f"{vals[2]:+.3f}) kkt={kkt:.2e}")
        built[geom] = (spec, data)
    return built
