#!/usr/bin/env python3
"""Dissect the continuous batcher's steady-state cycle on hardware.

exp_batched_mega --scaling measured the raw vmapped dense chunk at
121.7 ms (B=8, 10 frames, S=1024), yet bench_continuous's aggregate
implies ~255 ms per steady cycle — something host-side eats a chunk's
worth of time. Candidates: the audio readback (8 x 19,200 f32 = 614 KB
per chunk over a ~25 ms-RTT tunnel), executor-thread handoff, per-request
emit work, asyncio scheduling gaps.

Method: wrap the live batcher's `_chunk_call` (dispatch enqueue) and
`_collect` (readback + emit) with timers, run steady traffic, and print
the per-cycle breakdown plus a raw `jax.device_get` size-vs-time probe of
the audio buffer alone.

Usage: python benchmarks/exp_batcher_cycle.py [--slots 8] [--chunk 10]
       [--max-seq 1024]
"""

from __future__ import annotations

import argparse
import asyncio
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--max-seq", type=int, default=1024)
    args = ap.parse_args()

    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine
    from qwen_tts_tpu.runtime.continuous import ContinuousBatcher

    eng = TTSEngine(TTSConfig(max_seq_len=args.max_seq, backend="dense",
                              chunk_frames=args.chunk, warmup=False))
    t0 = time.perf_counter()
    eng.initialize()
    print(f"engine init {time.perf_counter() - t0:.1f}s", flush=True)
    b = ContinuousBatcher(eng, slots=args.slots, chunk_frames=args.chunk)
    b.warm()

    dispatch_t, collect_t, cycle_marks = [], [], []
    orig_call, orig_collect = b._chunk_call, b._collect

    def timed_call(n):
        t0 = time.perf_counter()
        out = orig_call(n)
        dispatch_t.append((n, time.perf_counter() - t0))
        cycle_marks.append(time.perf_counter())
        return out

    async def timed_collect(inflight):
        t0 = time.perf_counter()
        await orig_collect(inflight)
        collect_t.append(time.perf_counter() - t0)

    b._chunk_call = timed_call
    b._collect = timed_collect

    texts = ["a quite long utterance that keeps this slot streaming for "
             "many consecutive chunks of audio output"] * args.slots
    t0 = time.perf_counter()
    b.serve(texts)
    wall = time.perf_counter() - t0

    gaps = sorted(np.diff([m for m in cycle_marks]))
    steady = [g for g in gaps[: max(len(gaps) - 2, 1)]]  # drop ramp tails
    d_med = float(np.median([d for _n, d in dispatch_t]) * 1000)
    c_med = float(np.median(collect_t) * 1000)
    print(f"cycles {len(cycle_marks)}  wall {wall:.2f}s")
    print(f"dispatch-enqueue median {d_med:.1f} ms  "
          f"collect (await readback+emit) median {c_med:.1f} ms  "
          f"cycle gap median {float(np.median(steady)) * 1000:.1f} ms")

    # raw device_get cost of the audio buffer alone, f32 vs int16
    import jax.numpy as jnp

    hop = eng.vocoder_config.hop_length
    B, n = args.slots, args.chunk
    f = jax.jit(lambda x: x * 1.0001)
    g16 = jax.jit(lambda x: jnp.clip(x * 1.0001 * 32767.0,
                                     -32768, 32767).astype(jnp.int16))
    x = jnp.zeros((B, n * hop), jnp.float32)
    np.asarray(f(x)); np.asarray(g16(x))
    for name, fn in (("f32", f), ("int16", g16)):
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(x))
            times.append(time.perf_counter() - t0)
        nbytes = B * n * hop * (4 if name == "f32" else 2)
        print(f"audio readback {name} [{B},{n * hop}] = {nbytes / 1e3:.0f} KB"
              f": median {float(np.median(times)) * 1000:.1f} ms")


if __name__ == "__main__":
    main()
