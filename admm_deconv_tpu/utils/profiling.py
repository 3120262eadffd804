"""Tracing / profiling subsystem.

The reference has no profiling beyond one ``CUDA.@time`` call
(``admm_deconv_test.jl:76``, SURVEY.md §5.1).  Here: ``jax.profiler`` trace
annotations around solver phases, and an honest wall-clock iteration timer
that forces device completion with a host scalar fetch (on the axon TPU
backend ``block_until_ready`` can return before device completion, so naive
timers under-report by orders of magnitude).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region in a ``jax.profiler`` trace (no-op without a trace)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def force_completion(x) -> float:
    """Force device completion of (any leaf of) ``x``; returns a scalar."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf))


class IterationTimer:
    """Steady-state wall-clock timer for jitted functions.

    Usage::

        timer = IterationTimer(fn, make_input)   # fresh input per repeat
        stats = timer.measure(repeats=4)
        stats["seconds_per_call"], stats["calls_per_s"]
    """

    def __init__(self, fn: Callable, make_input: Callable[[int], tuple]):
        self.fn = fn
        self.make_input = make_input

    def measure(self, repeats: int = 4, warmup: int = 1) -> dict:
        for i in range(warmup):
            force_completion(self.fn(*self.make_input(-1 - i)))
        inputs = [self.make_input(i) for i in range(repeats)]
        for args in inputs:
            for a in jax.tree_util.tree_leaves(args):
                if hasattr(a, "block_until_ready"):
                    force_completion(a)
        t0 = time.perf_counter()
        for args in inputs:
            force_completion(self.fn(*args))
        elapsed = time.perf_counter() - t0
        per_call = elapsed / repeats
        return {
            "seconds_total": elapsed,
            "seconds_per_call": per_call,
            "calls_per_s": 1.0 / per_call if per_call > 0 else float("inf"),
            "repeats": repeats,
        }


def profile_trace(fn: Callable, *args, log_dir: str = "/tmp/jax-trace"):
    """Run ``fn(*args)`` under a ``jax.profiler`` trace written to
    ``log_dir`` (viewable in TensorBoard / xprof)."""
    with jax.profiler.trace(log_dir):
        out = fn(*args)
        force_completion(out)
    return out
