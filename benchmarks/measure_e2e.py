#!/usr/bin/env python3
"""End-to-end streaming latency over short/medium/long texts.

TPU port of the reference e2e benchmark (reference: benchmarks/measure_e2e.py:
20-97 — TTFC + inter-chunk latency stats per text length).
"""

import argparse
import asyncio
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TEXTS = {
    "short": "Hello there!",
    "medium": "The quick brown fox jumps over the lazy dog near the river bank.",
    "long": ("Speech synthesis has advanced significantly in recent years, with "
             "neural codec language models enabling natural sounding voices at "
             "interactive latencies. This benchmark measures the full pipeline "
             "from text input to streamed audio chunks on tensor processing "
             "hardware, including tokenization, prefill, frame generation and "
             "vocoder decoding."),
}


async def run_one(eng, text):
    t0 = time.perf_counter()
    ttfc = None
    gaps = []
    prev = t0
    samples = 0
    async for audio, sr in eng.synthesize_streaming(text):
        now = time.perf_counter()
        if ttfc is None:
            ttfc = now - t0
        else:
            gaps.append(now - prev)
        prev = now
        samples += len(audio)
    wall = time.perf_counter() - t0
    return ttfc, gaps, samples, wall


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-seq", type=int, default=2048)
    args = p.parse_args()

    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    eng = TTSEngine(TTSConfig(max_seq_len=args.max_seq))
    eng.initialize()

    from qwen_tts_tpu.utils.timing import drain_device

    ok = True
    for name, text in TEXTS.items():
        drain_device()  # fence any speculative chunk from the previous text
        ttfc, gaps, samples, wall = asyncio.run(run_one(eng, text))
        dur = samples / eng.sample_rate
        rtf = wall / dur if dur else float("inf")
        gap_ms = (f"{statistics.mean(gaps) * 1000:.0f}±"
                  f"{(statistics.pstdev(gaps) if len(gaps) > 1 else 0) * 1000:.0f}"
                  if gaps else "n/a")
        passed = ttfc * 1000 < 90 and rtf < 0.3
        ok &= passed
        print(f"{name:7s} TTFC {ttfc * 1000:6.1f} ms  RTF {rtf:.3f}  "
              f"inter-chunk {gap_ms} ms  audio {dur:.1f}s  "
              f"[{'PASS' if passed else 'FAIL'}]")
    print("E2E:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
