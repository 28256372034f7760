#!/usr/bin/env python3
"""Real-time factor over N frames, with per-frame phase split.

TPU port of the reference RTF benchmark (reference: benchmarks/measure_rtf.py:
23-153 — per-frame talker/CP/embed split + wall-clock streaming RTF).
"""

import argparse
import asyncio
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text", default=("This is a longer passage used to measure the "
                                      "sustained real time factor of the decoder over "
                                      "many frames of generated speech audio."))
    p.add_argument("--frames", type=int, default=50)
    p.add_argument("--max-seq", type=int, default=2048)
    args = p.parse_args()

    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    eng = TTSEngine(TTSConfig(max_seq_len=args.max_seq, max_new_tokens=args.frames))
    eng.initialize()

    # Non-streaming RTF: frames + one vocoder decode
    t0 = time.perf_counter()
    frames = list(eng._generate_codec_frames(args.text))[: args.frames]
    t_frames = time.perf_counter() - t0
    t0 = time.perf_counter()
    wav, sr = eng._decode_to_audio(frames)
    t_voc = time.perf_counter() - t0
    dur = len(wav) / sr
    rtf = (t_frames + t_voc) / dur
    print(f"frames: {len(frames)}  gen {t_frames * 1000:.0f} ms "
          f"({t_frames / len(frames) * 1000:.1f} ms/frame)  vocoder {t_voc * 1000:.0f} ms")
    print(f"non-streaming RTF: {rtf:.3f} ({'PASS' if rtf < 0.3 else 'FAIL'} vs 0.3)")

    # Streaming RTF (wall-clock through the async generator)
    async def stream():
        t0 = time.perf_counter()
        total = 0
        async for audio, sr2 in eng.synthesize_streaming(args.text):
            total += len(audio)
        return time.perf_counter() - t0, total

    wall, samples = asyncio.run(stream())
    sdur = samples / eng.sample_rate
    srtf = wall / sdur if sdur else float("inf")
    print(f"streaming RTF: {srtf:.3f} ({'PASS' if srtf < 0.3 else 'FAIL'} vs 0.3)")


if __name__ == "__main__":
    main()
