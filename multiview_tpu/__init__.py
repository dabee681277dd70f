"""multiview_tpu: a TPU-native rig-calibration and 3D-reconstruction engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
MultiView (NASA ISAAC/Astrobee dense-mapping) toolchain:

- camera models: pinhole with none/FOV/radtan(Tsai)/RPC distortion
  (reference: camera_model/camera_params.{h,cc})
- rig bundle adjustment with bracketed-pose interpolation, depth and mesh
  constraints (reference: rig_calibrator/bin/rig_calibrator.cc)
- SfM front-end: feature detection, descriptor matching, track building,
  global pose initialization (reference: TheiaSfM role)
- TSDF fusion into meshes (reference: voxblox role)
- texture projection (reference: texrecon role)

Design: state lives in pytrees of dense arrays; all per-element math is
written once as JAX functions and vmapped; Jacobians come from autodiff;
the nonlinear solver is a Levenberg-Marquardt core with matrix-free
Schur-complement elimination of structure points; hot kernels (descriptor
distance, rasterization, TSDF) are Pallas TPU kernels; multi-chip scaling
uses jax.sharding meshes with psum/all_gather collectives.
"""

__version__ = "0.1.0"


def _host_fingerprint() -> str:
    """Short stable id of this host's CPU ISA + XLA build: hash of the
    /proc/cpuinfo feature line (x86 'flags' / arm 'Features'), machine
    arch, and the jaxlib version (AOT target options change with the XLA
    build, not only with the host ISA)."""
    import hashlib
    import platform

    parts = [platform.machine()]
    try:
        import jaxlib

        parts.append(getattr(jaxlib, "__version__", "?"))
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:
        parts.append(platform.processor())
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def _patch_atomic_cache_writes():
    """Make JAX's persistent-compilation-cache writes ATOMIC.

    jax's ``LRUCache.put`` (jax/_src/lru_cache.py) writes cache entries with
    a direct ``cache_path.write_bytes(val)`` and — with eviction disabled,
    the default — takes no lock. A second process (pytest workers, a bench
    run next to a test run) can read the partially-written executable and
    segfault/abort inside deserialization. Observed repeatedly in this
    environment (tests/conftest.py history); the root fix is write-to-temp
    + ``os.replace`` (atomic on POSIX within one filesystem), which makes a
    torn read impossible: readers see either the old state (miss) or a
    complete entry. Two concurrent writers of the same key both produce
    valid entries; last rename wins.
    """
    import os

    try:
        from jax._src import lru_cache as _lru
    except Exception:
        return
    if getattr(_lru.LRUCache, "_multiview_atomic_put", False):
        return
    orig_put = _lru.LRUCache.put

    def put(self, key, val):
        if self.eviction_enabled:
            # eviction mode holds a filelock around the write already
            return orig_put(self, key, val)
        if not key:
            raise ValueError("key cannot be empty")
        cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
        try:
            if cache_path.exists():
                return
            tmp = self.path / f".tmp-{os.getpid()}-{key}"
            tmp.write_bytes(val)
            os.replace(str(tmp), str(cache_path))
        except OSError:
            try:
                tmp.unlink()
            except Exception:
                pass

    put._multiview_atomic = True
    _lru.LRUCache.put = put
    _lru.LRUCache._multiview_atomic_put = True


def _enable_persistent_compile_cache():
    """Point JAX's persistent compilation cache at a local directory unless
    the user configured one. Cold-process pipeline runs stack many one-time
    XLA compiles (each a multi-second round-trip through the remote-compile
    tunnel on this TPU setup); with the cache, a rerun loads every
    executable it has seen before. Set MULTIVIEW_TPU_NO_COMPILE_CACHE=1 to
    opt out."""
    import os

    if os.environ.get("MULTIVIEW_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if (jax.config.jax_compilation_cache_dir is None
                and not os.environ.get("JAX_COMPILATION_CACHE_DIR")):
            base = os.environ.get(
                "MULTIVIEW_TPU_COMPILE_CACHE",
                os.path.expanduser("~/.cache/multiview_tpu/xla"))
            # Key the cache by a host-CPU fingerprint: XLA:CPU AOT results
            # encode the compile machine's ISA features, and loading one on
            # a different host can SIGILL. One subdirectory per machine
            # type keeps cross-host cache dirs (shared volumes, driver
            # rounds on heterogeneous hosts) safe; TPU executables just
            # recompile once per new host.
            path = os.path.join(base, _host_fingerprint())
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            # through the remote-compile tunnel even sub-second executables
            # cost seconds of round-trip, so cache everything
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.0)
    except Exception:
        pass  # caching is an optimization; never block import


_patch_atomic_cache_writes()
_enable_persistent_compile_cache()

from multiview_tpu.geometry import pose, distortion, camera, triangulation, registration  # noqa: F401
