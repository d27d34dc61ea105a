"""ctypes bindings for the native real-time runtime (native/rt_runtime.cpp).

Builds ``libnmpc_rt.so`` on first use with g++ (cached next to the source);
falls back cleanly if no compiler is available (``available()`` -> False and
the executor uses the pure-Python timing path).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

__all__ = ["available", "RtTimer", "SpscRing", "now_ns"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "rt_runtime.cpp")
_SO = os.path.join(_NATIVE_DIR, "libnmpc_rt.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.rt_timer_create.restype = ctypes.c_void_p
    lib.rt_timer_create.argtypes = [ctypes.c_double]
    lib.rt_timer_destroy.argtypes = [ctypes.c_void_p]
    lib.rt_timer_wait.restype = ctypes.c_int64
    lib.rt_timer_wait.argtypes = [ctypes.c_void_p]
    lib.rt_timer_overruns.restype = ctypes.c_int64
    lib.rt_timer_overruns.argtypes = [ctypes.c_void_p]
    lib.rt_timer_jitter_stats.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    for name in ("ring_push", "ring_push_overwrite"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.ring_pop.restype = ctypes.c_int
    lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                             ctypes.POINTER(ctypes.c_uint8)]
    lib.ring_pop_latest.restype = ctypes.c_int64
    lib.ring_pop_latest.argtypes = lib.ring_pop.argtypes
    lib.ring_size.restype = ctypes.c_int64
    lib.ring_size.argtypes = [ctypes.c_void_p]
    lib.rt_now_ns.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def now_ns() -> int:
    lib = _load()
    assert lib is not None
    return int(lib.rt_now_ns())


class RtTimer:
    """Absolute-deadline periodic timer (native clock_nanosleep)."""

    def __init__(self, period_s: float):
        self._lib = _load()
        assert self._lib is not None, "native runtime unavailable"
        self._h = self._lib.rt_timer_create(period_s)

    def wait(self) -> int:
        """Block until the next deadline; returns wakeup lateness in ns."""
        return int(self._lib.rt_timer_wait(self._h))

    @property
    def overruns(self) -> int:
        return int(self._lib.rt_timer_overruns(self._h))

    def jitter_stats(self):
        out = (ctypes.c_int64 * 3)()
        self._lib.rt_timer_jitter_stats(self._h, out)
        return {"p50_ns": out[0], "p99_ns": out[1], "max_ns": out[2]}

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.rt_timer_destroy(self._h)
            self._h = None


class SpscRing:
    """Wait-free SPSC ring of fixed-size byte records with timestamps.

    ``capacity`` is the requested number of usable records.  The native ring
    keeps one slot of headroom in bounded (``overwrite=False``) mode — the
    consumer's lap-validated read treats a record at distance >= slots from
    head as potentially mid-rewrite, so a bounded producer must stop one
    short — hence ring_create is given ``2 * capacity_pow2`` slots so the
    advertised capacity is fully usable in both modes.
    """

    def __init__(self, record_size: int, capacity_pow2: int = 64):
        self._lib = _load()
        assert self._lib is not None, "native runtime unavailable"
        self.record_size = record_size
        self.capacity = capacity_pow2
        self._h = self._lib.ring_create(record_size, 2 * capacity_pow2)
        assert self._h, "capacity must be a power of two"

    def push(self, payload: bytes, overwrite: bool = True) -> bool:
        assert len(payload) == self.record_size
        buf = (ctypes.c_uint8 * self.record_size).from_buffer_copy(payload)
        fn = self._lib.ring_push_overwrite if overwrite else self._lib.ring_push
        return bool(fn(self._h, buf))

    def pop(self):
        """Oldest record -> (timestamp_ns, payload) or None."""
        ts = ctypes.c_int64()
        buf = (ctypes.c_uint8 * self.record_size)()
        if not self._lib.ring_pop(self._h, ctypes.byref(ts), buf):
            return None
        return int(ts.value), bytes(buf)

    def pop_latest(self):
        """Freshest record, dropping stale ones -> (ts, payload, n_dropped) or None."""
        ts = ctypes.c_int64()
        buf = (ctypes.c_uint8 * self.record_size)()
        dropped = self._lib.ring_pop_latest(self._h, ctypes.byref(ts), buf)
        if dropped < 0:
            return None
        return int(ts.value), bytes(buf), int(dropped)

    def __len__(self):
        return int(self._lib.ring_size(self._h))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ring_destroy(self._h)
            self._h = None
