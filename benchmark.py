#!/usr/bin/env python3
"""Top-level TTS benchmark: streaming and non-streaming synthesis.

TPU port of the reference's top-level benchmark CLI
(reference: benchmark.py:25-74 — streaming TTFC/RTF per text plus a
non-streaming tok/s pass), built on the public engine API.
"""

import argparse
import asyncio
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

TEXTS = [
    "Hello there, how are you today?",
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "Streaming speech synthesis on tensor processing units combines fused "
    "decode kernels with pipelined host dispatch for interactive latency.",
]


async def bench_streaming(eng, text):
    t0 = time.perf_counter()
    ttfc = None
    samples = 0
    async for audio, sr in eng.synthesize_streaming(text):
        if ttfc is None:
            ttfc = time.perf_counter() - t0
        samples += len(audio)
    wall = time.perf_counter() - t0
    dur = samples / eng.sample_rate
    return ttfc * 1000, wall / dur if dur else float("inf"), dur


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--runs", type=int, default=2)
    args = p.parse_args()

    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    eng = TTSEngine(TTSConfig(max_seq_len=args.max_seq))
    t0 = time.perf_counter()
    eng.initialize()
    print(f"initialize: {time.perf_counter() - t0:.1f}s")

    ok = True
    for text in TEXTS:
        best = (float("inf"), float("inf"), 0)
        for _ in range(args.runs):
            ttfc, rtf, dur = asyncio.run(bench_streaming(eng, text))
            if ttfc < best[0]:
                best = (ttfc, rtf, dur)
        ttfc, rtf, dur = best
        passed = ttfc < 90 and rtf < 0.3
        ok &= passed
        print(f"[{'PASS' if passed else 'FAIL'}] TTFC {ttfc:6.1f} ms  "
              f"RTF {rtf:.3f}  audio {dur:4.1f}s  | {text[:50]}...")

        t0 = time.perf_counter()
        wav, sr = eng.synthesize(text)
        dt = time.perf_counter() - t0
        frames = eng.get_metrics()["frames_generated"]
        print(f"       non-streaming: {dt * 1000:6.0f} ms, "
              f"{frames} frames, RTF {dt / (len(wav) / sr):.3f}")

    print("OVERALL:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
