"""Profiling and latency-accounting utilities.

The reference exposes two timing hooks: the solver-internal ``time_tot``
(``ocp_nlp_get(..., "time_tot")``, surfaced at ``NMPCNavControlDiff.cpp:148-149``)
and the whole-cycle wall time (``ros::WallTime`` around ``mainCycle``,
``NMPCNavControlROS.cpp:510-513``).  This module is the TPU-native
observability equivalent:

  - :class:`LatencyStats` — streaming per-cycle latency accounting with
    p50/p99/max and budget-violation counts (the 25 ms tick budget of the
    40 Hz loop);
  - :func:`steady_state_seconds_per_step` — the chained-slope throughput
    measurement prescribed by PERFORMANCE.md, as a library function: on this
    rig (and any networked TPU frontend) per-dispatch timing conflates
    device compute with dispatch latency, so the reliable number is the
    marginal cost of one extra *dependent* step inside a single jit;
  - :func:`device_trace` — context manager around :func:`jax.profiler.trace`
    for capturing XLA/TensorBoard traces of the solve.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np

__all__ = [
    "LatencyStats",
    "steady_state_seconds_per_step",
    "device_trace",
]


class LatencyStats:
    """Streaming latency recorder with percentile summaries.

    Keeps every sample (8 bytes each; a week at 40 Hz is ~200 MB — callers
    running unbounded loops should ``reset()`` periodically or set
    ``max_samples`` to use a fixed-size ring).
    """

    def __init__(self, budget_s: float | None = None,
                 max_samples: int | None = None):
        self.budget_s = budget_s
        self.max_samples = max_samples
        self._samples: list[float] = []
        self._pos = 0
        self.count = 0
        self.violations = 0

    def record(self, seconds: float) -> None:
        self.count += 1
        if self.budget_s is not None and seconds > self.budget_s:
            self.violations += 1
        if self.max_samples is not None and len(self._samples) >= self.max_samples:
            self._samples[self._pos] = seconds
            self._pos = (self._pos + 1) % self.max_samples
        else:
            self._samples.append(seconds)

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(time.perf_counter() - t0)

    def reset(self) -> None:
        self._samples.clear()
        self._pos = 0
        self.count = 0
        self.violations = 0

    def summary(self) -> dict:
        """p50/p90/p99/max in milliseconds plus budget accounting."""
        if not self._samples:
            return {"count": 0}
        arr = np.asarray(self._samples)
        out = {
            "count": self.count,
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "p99_ms": float(np.percentile(arr, 99) * 1e3),
            "max_ms": float(arr.max() * 1e3),
            "mean_ms": float(arr.mean() * 1e3),
        }
        if self.budget_s is not None:
            out["budget_ms"] = self.budget_s * 1e3
            out["violations"] = self.violations
        return out


def steady_state_seconds_per_step(
    step: Callable,
    carry,
    *,
    k_lo: int = 1,
    k_hi: int = 9,
    reps: int = 5,
) -> float:
    """Marginal wall time of one dependent ``step`` inside a jitted chain.

    ``step(carry) -> carry`` is chained ``k`` times under ``lax.scan`` inside
    one jit; the returned figure is ``(t[k_hi] - t[k_lo]) / (k_hi - k_lo)``
    over the best of ``reps`` timed runs each.  This is the PERFORMANCE.md
    methodology: it removes per-dispatch latency (the axon tunnel's ~30 ms
    round trip here; PCIe/driver overhead elsewhere) and any optimistic
    ``block_until_ready`` behavior from the per-step cost.
    """
    import jax
    import jax.numpy as jnp

    def chained(k):
        @jax.jit
        def run(carry):
            def body(c, _):
                return step(c), None

            out, _ = jax.lax.scan(body, carry, None, length=k)
            leaves = [jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(out)]
            return sum(leaves)

        return run

    timings = {}
    for k in (k_lo, k_hi):
        run = chained(k)
        jax.block_until_ready(run(carry))  # compile + first exec
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(carry))
            best = min(best, time.perf_counter() - t0)
        timings[k] = best
    return (timings[k_hi] - timings[k_lo]) / (k_hi - k_lo)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a JAX/XLA profiler trace (view with TensorBoard's profile tab
    or Perfetto).  Usage::

        with device_trace("/tmp/nmpc_trace"):
            jax.block_until_ready(step(*args))
    """
    import jax

    with jax.profiler.trace(log_dir):
        yield
