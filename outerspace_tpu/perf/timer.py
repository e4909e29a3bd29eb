"""Instrumentation: scope timers and device-sync-aware measurement.

Parity with the reference's RAII ``Timer`` / ``TIMER(caption){...}`` macro
(``SimSpGEMM.cpp:23-38``) plus the TPU-specific gotcha this environment
surfaced: on tunneled devices ``jax.block_until_ready`` does not actually
block, so honest timing fetches a scalar.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Callable

import numpy as np


class Timer(contextlib.AbstractContextManager):
    """Wall-clock scope timer printing on exit (reference Timer ctor/dtor
    semantics)."""

    def __init__(self, caption: str, out=sys.stderr, quiet: bool = False):
        self.caption = caption
        self.out = out
        self.quiet = quiet
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if not self.quiet:
            print(f"[{self.caption}] {self.elapsed:.6f}s", file=self.out)
        return False


def timed(caption: str | None = None):
    """Decorator form of Timer."""

    def deco(fn: Callable):
        name = caption or fn.__name__

        def wrapper(*a, **kw):
            with Timer(name):
                return fn(*a, **kw)

        return wrapper

    return deco


def device_sync(x) -> float:
    """Force real device completion by fetching a scalar (see module doc)."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    return float(np.asarray(jnp.sum(leaves[-1])))


def time_device(fn: Callable, reps: int = 5, warmup: int = 2) -> float:
    """min-of-reps device timing with scalar-fetch sync."""
    for _ in range(warmup):
        device_sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        device_sync(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """jax.profiler trace scope — the TPU equivalent of the reference's
    per-100k-cycle ``printStats`` dumps (``SimOuterSPACE.cpp:775-780``)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
