#!/usr/bin/env python3
"""Continuous-batching serving benchmark: staggered arrivals into fixed
slots (runtime/continuous.py) vs the static-batch baseline.

Static batching (`synthesize_batch`) must collect a full batch before
dispatching and holds every slot until the LAST utterance finishes;
continuous batching admits each request at the next chunk boundary and
frees a slot the moment its EOS lands. With staggered traffic the
difference shows up as (a) time-to-first-audio per request — continuous
pays (queue + ~1 chunk) instead of (batch collect + full prefill +
whole-batch decode) — and (b) aggregate frames/s at equal slot count.

No reference counterpart (the reference is strictly batch-1); numbers are
recorded as TPU-first extension rows.
"""

from __future__ import annotations

import argparse
import asyncio
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TEXTS = [
    "Hello there, welcome to the continuous batching benchmark.",
    "The second caller says a slightly longer sentence to vary the load.",
    "Short one.",
    "Caller four would like to know the weather in the mountains today.",
    "A fifth request arrives while earlier ones are still streaming.",
    "Number six keeps the slots busy with yet another utterance.",
    "Seven says continuous batching should hide the admission cost.",
    "Eight closes out the first wave of staggered requests.",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--arrival-ms", type=float, default=150.0,
                    help="inter-arrival gap (open-loop staggered traffic)")
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--chunk-frames", type=int, default=10)
    ap.add_argument("--quantize", default="off",
                    choices=["off", "int8", "int4", "mixed"])
    ap.add_argument("--kv-cache", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--vocoder", default="fast", choices=["fast", "code2wav"],
                    help="code2wav = the real-architecture vocoder, fused "
                         "per-slot into the chunk dispatch (left-context "
                         "gapless decode, per-slot utterance-start flags)")
    ap.add_argument("--admit-chunk", type=int, default=2,
                    help="fast-admission chunk size in frames "
                         "(0 disables: every dispatch is --chunk-frames)")
    ap.add_argument("--skip-static", action="store_true")
    ap.add_argument("--sweep", action="store_true",
                    help="after the main pass, re-run sparse-arrival and "
                         "admit-off traffic through the SAME warm batcher "
                         "(isolates admission latency from slot wait)")
    args = ap.parse_args()

    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine
    from qwen_tts_tpu.runtime.continuous import ContinuousBatcher

    quant = False if args.quantize == "off" else args.quantize
    # warmup=False: the batcher warms its OWN signatures below; the
    # engine's single-stream warmup compiles (first_fn + chunk fn on the
    # dense path) are minutes of wasted init on the TPU for quantized tiers
    eng = TTSEngine(TTSConfig(max_seq_len=args.max_seq, backend="dense",
                              chunk_frames=args.chunk_frames,
                              quantize=quant, kv_cache=args.kv_cache,
                              vocoder_backend=args.vocoder,
                              warmup=False))
    t0 = time.perf_counter()
    eng.initialize()
    print(f"engine init {time.perf_counter() - t0:.1f}s "
          f"(quantize={args.quantize} kv={args.kv_cache} "
          f"vocoder={args.vocoder})")

    texts = [TEXTS[i % len(TEXTS)] for i in range(args.requests)]
    batcher = ContinuousBatcher(eng, slots=args.slots,
                                chunk_frames=args.chunk_frames,
                                admit_chunk_frames=args.admit_chunk)

    # warm every signature (admit / insert / chunk sizes × ctx shapes)
    # + vocoder buckets
    t0 = time.perf_counter()
    batcher.warm()
    batcher.serve(texts[: args.slots])
    print(f"warmup {time.perf_counter() - t0:.1f}s")

    def staggered_pass(label, arrival_ms, n_requests):
        async def staggered():
            t_start = time.perf_counter()
            stats = []

            async def one(i, text):
                await asyncio.sleep(i * arrival_ms / 1000.0)
                t_arr = time.perf_counter()
                first, samples = None, 0
                async for audio, _sr in batcher.submit(text):
                    if first is None:
                        first = time.perf_counter() - t_arr
                    samples += len(audio)
                stats.append((first, samples))

            reqs = [TEXTS[i % len(TEXTS)] for i in range(n_requests)]
            await asyncio.gather(*[one(i, t) for i, t in enumerate(reqs)])
            return time.perf_counter() - t_start, stats

        wall, stats = asyncio.run(staggered())
        firsts = sorted(s[0] for s in stats if s[0] is not None)
        total_audio = sum(s[1] for s in stats) / eng.sample_rate
        frames = total_audio * eng.model_config.frame_rate_hz
        print(f"continuous [{label}]: {n_requests} reqs / {args.slots} "
              f"slots, arrivals every {arrival_ms:.0f} ms")
        print(f"  wall {wall:.2f}s for {total_audio:.1f}s audio "
              f"-> {total_audio / wall:.1f}x real-time aggregate "
              f"({frames / wall:.1f} frames/s)")
        print(f"  first-audio latency p50 "
              f"{firsts[len(firsts) // 2] * 1000:.0f} ms"
              f"  p95 {firsts[int(len(firsts) * 0.95)] * 1000:.0f} ms"
              f"  max {firsts[-1] * 1000:.0f} ms", flush=True)

    staggered_pass("main", args.arrival_ms, args.requests)

    if args.sweep:
        # sparse arrivals isolate the ADMISSION path (slots always free);
        # the admit-off rows quantify what the small first chunk buys.
        # All rows share one warm engine/batcher — b.small is a host-side
        # knob, both chunk sizes are already compiled.
        staggered_pass("sparse+fast-admit", 1500.0, args.slots)
        batcher.small = 0
        staggered_pass("sparse+admit-off", 1500.0, args.slots)
        staggered_pass("load+admit-off", args.arrival_ms, args.requests)
        batcher.small = args.admit_chunk if 0 < args.admit_chunk else 0

    if args.skip_static:
        return

    # static baseline: same texts in full batches of `slots`, arrivals
    # ignored (requests must wait for a full batch — best case for static).
    # Two passes: the COLD pass shows the structural hazard (every group's
    # (Tmax, max_frames) signature is new → a fresh XLA compile mid-
    # serving; continuous batching never compiles after warmup), the WARM
    # pass is the compile-free best case for throughput comparison.
    def static_pass():
        t0 = time.perf_counter()
        audio_s = 0.0
        for i in range(0, args.requests, args.slots):
            group = texts[i: i + args.slots]
            group = group + group[: args.slots - len(group)]  # pad to B
            for wav, _sr in eng.synthesize_batch(group[: args.slots]):
                audio_s += len(wav) / eng.sample_rate
        return time.perf_counter() - t0, audio_s

    wall_cold, audio_s = static_pass()
    wall_warm, audio_s = static_pass()
    print(f"static batch baseline (B={args.slots}, batch-collect ignored): "
          f"cold {audio_s / wall_cold:.1f}x real-time "
          f"(per-group recompiles), warm {audio_s / wall_warm:.1f}x "
          f"({audio_s:.1f}s audio in {wall_warm:.2f}s)")


if __name__ == "__main__":
    main()
