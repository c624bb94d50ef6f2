"""Trustworthy on-device timing for the axon-tunneled TPU.

Plain `dispatch N times, block once` benchmarking is UNRELIABLE on this
platform: repeated dispatch of the same (executable, input buffers) pair
can be served from a ready buffer without re-executing, producing
physically impossible timings (a 2.56 M-element HBM gather "measured" at
0.02 ms — 1.4 TB/s on an 819 GB/s part). The only pattern observed to
always measure real execution is a DEPENDENCY CHAIN: each iteration's
input consumes the previous iteration's output, so no call can be deduped
or reordered.

`chain_bench` times `fn(state, *args) -> state` over a chain and returns
ms/call. Functions under test must thread a small carry (e.g. fold a
scalar of their result into a dummy input).
"""

from __future__ import annotations

import time
from typing import Callable

import jax


def chain_bench(fn: Callable, state, *args, iters: int = 10,
                trials: int = 3) -> float:
    """ms per call of jitted `fn(state, *args) -> state`, measured over a
    dependency chain (call i+1 consumes call i's output)."""
    state = jax.block_until_ready(fn(state, *args))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        s = state
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(s, *args)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3
