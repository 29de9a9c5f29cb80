"""Tracing / profiling helpers.

Equivalents of the reference's aux tracing subsystem (SURVEY.md section 5):
the `run_time` rolling-latency decorator (`models/utils/bricks.py:7-19`, which
cuda-synchronises and prints means) and the commented-out profiler hook —
here built on device-sync scalar fetches and `jax.profiler` traces.
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Callable, Dict

import jax
import jax.numpy as jnp

_STATS: Dict[str, list] = defaultdict(list)


def device_sync(x) -> None:
    """Reliable device barrier: fetch a scalar depending on x (on the axon
    tunnel backend `block_until_ready` does not block)."""
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)))


def run_time(name: str) -> Callable:
    """Decorator printing a rolling mean latency for the wrapped function
    (the reference's `run_time`), synchronising on the output."""
    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            device_sync(out)
            dt = time.perf_counter() - t0
            _STATS[name].append(dt)
            vals = _STATS[name]
            print(f"[run_time] {name}: {dt * 1e3:.1f} ms "
                  f"(mean {sum(vals) / len(vals) * 1e3:.1f} ms, n={len(vals)})")
            return out
        return wrapped
    return deco


def reset_run_time_stats():
    _STATS.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up in the XLA timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield
