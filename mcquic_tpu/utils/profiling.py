"""Profiling helpers (SURVEY.md §5 tracing parity).

The reference measured throughput with CUDA events (validator.py:60-97) and
had no profiler integration; here we expose `jax.profiler` traces plus simple
wall-clock scopes that tolerate remote-attach backends (where
block_until_ready may return before completion — pair with a tiny fetch).
"""
import contextlib
import logging
import time
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger("mcquic_tpu.profiling")


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", logdir)


def syncAndFetch(tree):
    """Fully materialize a pytree result — robust sync point for timing."""
    jax.block_until_ready(tree)
    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(leaf).ravel()[:1]
    return tree


@contextlib.contextmanager
def wallClock(name: str, sink: Optional[dict] = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = dt
    logger.info("%s: %.3f s", name, dt)
