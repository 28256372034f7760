#!/usr/bin/env python3
"""Streaming TTS demo: per-chunk latency + TTFC/RTF PASS-FAIL.

TPU port of the reference streaming demo (reference: demo_pipeline.py:24-80).
"""

import argparse
import asyncio
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


async def run(args):
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    cfg = TTSConfig(model_path=args.model_path, max_seq_len=args.max_seq,
                    chunk_frames=args.chunk_frames)
    engine = TTSEngine(cfg)
    t0 = time.perf_counter()
    engine.initialize()
    print(f"Initialized in {time.perf_counter() - t0:.1f}s")

    # one warm-up pass so a first-use shape bucket doesn't pollute timings
    async for _ in engine.synthesize_streaming(args.text):
        pass

    t_start = time.perf_counter()
    ttfc = None
    total_samples = 0
    chunk_times = []
    prev = t_start
    async for audio, sr in engine.synthesize_streaming(args.text):
        now = time.perf_counter()
        if ttfc is None:
            ttfc = (now - t_start) * 1000
        chunk_times.append((now - prev) * 1000)
        prev = now
        total_samples += len(audio)

    wall = time.perf_counter() - t_start
    dur = total_samples / engine.sample_rate
    rtf = wall / dur if dur else float("inf")

    print(f"Chunks: {len(chunk_times)}; inter-chunk ms: "
          f"{[f'{t:.0f}' for t in chunk_times[:8]]}")
    print(f"TTFC: {ttfc:.1f} ms ({'PASS' if ttfc < 90 else 'FAIL'} vs 90 ms)")
    print(f"Streaming RTF: {rtf:.3f} ({'PASS' if rtf < 0.3 else 'FAIL'} vs 0.3)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text", default="Streaming synthesis check with several words "
                                     "to produce a couple of chunks of audio.")
    p.add_argument("--model-path", default=None)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--chunk-frames", type=int, default=10)
    args = p.parse_args()
    asyncio.run(run(args))


if __name__ == "__main__":
    main()
