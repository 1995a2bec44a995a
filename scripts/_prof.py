"""Shared profiling helpers for the TPU stage-breakdown scripts.

Methodology (docs/ROADMAP.md "the 28 ms dispatch floor"): every jitted
call through the axon relay costs ~28 ms wall-clock regardless of size,
and jax.block_until_ready does NOT block under the remote backend — so
all timings here are slopes of N back-to-back executions forced by a
scalar D2H read.
"""
from __future__ import annotations

import time

import numpy as np


def sync_read(x):
    """Force device completion (block_until_ready is a no-op on axon)."""
    return np.asarray(x[(0,) * getattr(x, "ndim", 0)])


def timed(fn, n, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn()
        sync_read(o)
        best = min(best, time.perf_counter() - t0)
    return best


def slope_ms(fn, n=8, repeats=3, warm=True):
    """Per-call ms from the slope of 1 vs 1+n back-to-back executions."""
    if warm:
        sync_read(fn())
    t1 = timed(fn, 1, repeats)
    tn = timed(fn, 1 + n, repeats)
    return max((tn - t1) / n, 1e-9) * 1000.0


def corpus(mb: int) -> bytes:
    import bench
    return bench.make_corpus(mb)


def setup_jax():
    import os
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    return jax
