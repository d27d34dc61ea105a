"""Test configuration: run on a virtual 8-device CPU mesh with x64 available.

Multi-chip sharding is validated on ``xla_force_host_platform_device_count=8``
CPU devices (no multi-chip TPU hardware in CI); the driver separately
dry-run-compiles the multi-chip path via ``__graft_entry__.dryrun_multichip``.
"""
import os
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# Keep CLI tests' persistent-compile-cache writes out of the shared
# .jax_cache: concurrent writers (a bench run on the TPU + the test suite)
# can abort inside jax's cache serializer, killing the whole pytest process.
os.environ.setdefault("NMPC_TPU_CACHE_DIR", tempfile.mkdtemp(prefix="jaxcache-test-"))
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The container's sitecustomize registers the axon TPU backend and forces
# jax_platforms="axon,cpu" regardless of JAX_PLATFORMS; override it before any
# backend is initialized so tests run on the virtual CPU mesh in real float64.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.devices()[0].platform == "cpu", jax.devices()
