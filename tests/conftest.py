"""Test configuration: force CPU JAX with 8 virtual devices and f64.

Multi-chip logic is tested on a simulated 8-device CPU mesh
(xla_force_host_platform_device_count), as real multi-chip hardware is not
needed for logic tests.

Note: this environment preloads a TPU backend plugin via sitecustomize and
exports JAX_PLATFORMS=axon; env-var overrides are ineffective by the time
conftest runs, but ``jax.config.update("jax_platforms", ...)`` still wins as
long as no backend has been initialized. XLA_FLAGS must likewise be set
before first backend use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# The persistent XLA compilation cache stays ENABLED for tests. Historical
# SIGSEGV/SIGABRT crashes inside jax cache/compile internals were traced to
# jax's non-atomic cache writes (a concurrent process reads a torn entry);
# multiview_tpu.__init__._patch_atomic_cache_writes fixes that at the root
# with temp-file + os.replace writes. Validated 2026-08-21: two consecutive
# COLD-cache full-suite runs (fresh cache dir wiped before each) both
# passed 272/272 with no crashes.
