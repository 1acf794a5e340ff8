"""Benchmark timing helpers (block_until_ready-based)."""

from __future__ import annotations

import time

import numpy as np


def median_time(fn, *args, warmup: int = 3, iters: int = 10) -> float:
    """Median wall time of fn(*args) with device sync per iteration."""
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def throughput_ints(fn, n_ints: int, *args, **kw) -> float:
    """Integers/second of a codec call over n_ints total values."""
    return n_ints / median_time(fn, *args, **kw)
