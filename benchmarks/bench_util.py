"""Honest TPU timing helpers.

The axon remote platform makes naive loop timing misleading (dispatch
overlap, cached identical dispatches, lazy compilation of helper ops).
Methodology here: pre-stage several DISTINCT inputs, warm up on all of
them, then time individual blocking calls and report the median.
"""

import time

import numpy as np


def time_fn(fn, args_list, iters=30):
    """Median seconds per call over rotating distinct argument tuples."""
    import jax

    for args in args_list:  # warmup / compile
        jax.block_until_ready(fn(*args))
    times = []
    for i in range(iters):
        args = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
