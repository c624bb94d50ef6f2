"""Trustworthy on-device timing for the axon-tunneled TPU.

Plain `dispatch N times, block once` benchmarking is UNRELIABLE on this
platform, for two separately-observed reasons:

1. Repeated dispatch of the same (executable, input buffers) pair can be
   served from a ready buffer without re-executing, producing physically
   impossible timings (a 2.56 M-element HBM gather "measured" at
   0.02 ms — 1.4 TB/s on an 819 GB/s part). Countermeasure: a DEPENDENCY
   CHAIN — each iteration's input consumes the previous iteration's
   output, so no call can be deduped or reordered.

2. `jax.block_until_ready` can return BEFORE execution completes
   (observed round 5: 100 chained 4096^3 bf16 matmuls — a >=70 ms
   workload at v5e peak — "completed" in 0.1 ms under block_until_ready,
   but took the expected ~100 ms the moment one output element was read
   back). The only barrier observed to always wait is a HOST READBACK of
   data that depends on the computation. Countermeasure: `sync` below —
   device_get one element of every output buffer.

`chain_bench` times `fn(state, *args) -> state` over a chain and returns
ms/call. Functions under test must thread a small carry (e.g. fold a
scalar of their result into a dummy input).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np


def sync(x):
    """Execution barrier that actually waits on this runtime.

    Reads ONE element of every array in the pytree back to the host (an
    XLA executable's outputs are whole buffers, so reading any element
    requires the producing program to have finished). Use this, not
    `jax.block_until_ready`, to end a timed region: block_until_ready has
    been observed to return early on the axon tunnel (module docstring,
    point 2). Cost: one tiny transfer per leaf — O(µs), timing-neutral.
    Returns x so it can wrap an expression in place."""
    for leaf in jax.tree_util.tree_leaves(x):
        if isinstance(leaf, jax.Array):
            idx = (0,) * leaf.ndim
            np.asarray(jax.device_get(leaf[idx]))
    return x


def chain_bench(fn: Callable, state, *args, iters: int = 10,
                trials: int = 3) -> float:
    """ms per call of jitted `fn(state, *args) -> state`, measured over a
    dependency chain (call i+1 consumes call i's output)."""
    state = sync(fn(state, *args))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        s = state
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(s, *args)
        sync(s)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3
