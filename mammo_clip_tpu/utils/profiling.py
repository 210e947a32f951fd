"""Profiling hooks (a subsystem the reference lacks — its only runtime introspection is
tqdm GPU-percent postfix, SURVEY.md §5 tracing).

``profile_trace`` wraps a code region with jax.profiler tracing (view in TensorBoard /
xprof); ``step_timer`` measures honest step latency by forcing a scalar fetch, since
remote-dispatch runtimes can acknowledge block_until_ready before execution completes
(observed on this pod; see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, List

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_timer(fn: Callable, *args, iters: int = 10, sync_value=None) -> List[float]:
    """Time ``fn(*args)`` per call; each call is synced by fetching a scalar from the
    output (tree-reduced sum when ``sync_value`` is None). Returns per-call seconds."""
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        if sync_value is not None:
            _ = float(sync_value(out))
        else:
            leaves = jax.tree_util.tree_leaves(out)
            _ = float(jnp.sum(leaves[0]).astype(jnp.float32))
        times.append(time.perf_counter() - t0)
    return times
