"""Tracing / profiling utilities (SURVEY.md §5: the reference only has
thop MACs accounting + an nvidia-smi probe; the TPU-native equivalents are
XLA cost analysis — ``utils.flops`` — and jax.profiler timeline traces).

Includes a robust wall-clock timer for the axon tunnel: the client
memoizes executions with identical inputs AND ``block_until_ready`` does
not fence actual device completion, so honest timing requires (a) distinct
inputs per call and (b) a host fetch of (a reduction of) the output.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler timeline trace context; view with TensorBoard or
    Perfetto (reference equivalent: none — it had no timeline tracing)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, make_args: Callable[[int], tuple], iters: int = 4,
          warmup: int = 1) -> Dict[str, float]:
    """Honest wall-clock timing of a jitted fn on any backend.

    ``make_args(i)`` must return DISTINCT arrays per i (tunnel memoization)
    and the result is fenced by fetching a scalar reduction to host.
    Returns min/mean milliseconds.
    """
    jfn = jax.jit(lambda *a: jnp.sum(jnp.asarray(fn(*a), jnp.float32)))
    for i in range(warmup):
        float(jfn(*make_args(-1 - i)))
    ts = []
    for i in range(iters):
        args = make_args(i)
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return {"min_ms": min(ts) * 1e3, "mean_ms": sum(ts) / len(ts) * 1e3}


def device_memory_stats() -> Optional[Dict]:
    """Per-device memory stats when the backend exposes them (the
    reference's nvidia-smi probe equivalent, core.py:19-24)."""
    try:
        dev = jax.devices()[0]
        return dev.memory_stats()
    except Exception:
        return None
