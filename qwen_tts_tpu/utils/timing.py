"""Timing helpers — the TPU analog of the reference's
`torch.cuda.synchronize()` + `time.perf_counter()` discipline
(reference: benchmark.py:44-49).

NOTE: on the experimental tunneled-TPU platform used in CI,
`jax.block_until_ready` can return before execution finishes; `sync()`
therefore forces a host transfer, which is the only honest barrier.
Also: the chip is single-tenant — concurrent processes contend and
serialize, so benchmarks must run alone.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax
import numpy as np


def sync(x) -> None:
    """Hard synchronization barrier: forces a host readback."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(leaves[0])


def drain_device() -> None:
    """Wait for ALL previously enqueued device work to finish.

    TPU executes programs in submission order, so reading back a fresh tiny
    computation fences everything before it — including speculative chunks
    a closed streaming generator left in flight. Latency probes (TTFC) must
    call this between runs or they measure queue contention from their own
    previous run, not time-to-first-chunk."""
    import jax.numpy as jnp

    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)


@contextmanager
def timed(label: str = "", results: dict | None = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
    else:
        print(f"{label}: {dt * 1000:.2f} ms")


def bench_fn(fn, *args, warmup: int = 2, repeats: int = 5) -> float:
    """Best-of-N wall time of fn(*args), sync-bracketed. Returns seconds."""
    for _ in range(warmup):
        sync(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best
