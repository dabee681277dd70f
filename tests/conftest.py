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

# The persistent XLA compilation cache is DISABLED for the CPU test suite
# (it exists for the TPU remote-compile tunnel, where it stays on; CPU
# compiles are local and fast). Two independent crash classes hit the
# CPU+cache combination on this infra: (a) torn concurrent writes — fixed
# at the root by multiview_tpu.__init__._patch_atomic_cache_writes and
# validated round 4 with two cold full-suite runs; (b) round 5, a SIGSEGV
# inside jax's put_executable_and_time serialization while a concurrent
# TPU process wrote the same cache, plus XLA:CPU AOT loader warnings that
# cached entries carry machine features ("prefer-no-scatter") absent at
# load time ("could lead to execution errors such as SIGILL"). The CPU
# suite gains little from the cache; the hazard is not worth it.
os.environ.setdefault("MULTIVIEW_TPU_NO_COMPILE_CACHE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
