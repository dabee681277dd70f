"""Tracing/profiling hooks.

The reference has only wall-timers + Ceres progress prints (SURVEY.md 5);
here: jax.profiler TensorBoard traces around any pipeline stage plus a
lightweight stage timer registry printed like the reference's wall-timer
lines (texture_processing.cc:282-288).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

_STAGES: List[tuple] = []


@contextlib.contextmanager
def stage(name: str, verbose: bool = True):
    """Wall-clock a pipeline stage: `with profiling.stage("triangulation"):`"""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    _STAGES.append((name, dt))
    if verbose:
        print(f"{name} took {dt:.6g} seconds")


def stage_times() -> Dict[str, float]:
    out: Dict[str, float] = {}
    for name, dt in _STAGES:
        out[name] = out.get(name, 0.0) + dt
    return out


def reset():
    _STAGES.clear()


@contextlib.contextmanager
def device_trace(logdir: str, with_host: bool = True):
    """jax.profiler trace context: XLA op-level timeline viewable in
    TensorBoard/XProf. Wrap a jitted stage:

        with profiling.device_trace("/tmp/trace"):
            solver(cam0, pts).cost.block_until_ready()
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
