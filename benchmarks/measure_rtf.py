#!/usr/bin/env python3
"""Real-time factor over N frames (streaming + non-streaming, warm paths).

TPU port of the reference RTF benchmark (reference: benchmarks/measure_rtf.py:
23-153). Both modes run through the public engine API on warm compiled
signatures; the streaming mode exercises the fully fused pipelined path
(frames+vocoder per dispatch, depth-1 speculation).
"""

import argparse
import asyncio
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text", default=("This is a longer passage used to measure the "
                                      "sustained real time factor of the decoder over "
                                      "many frames of generated speech audio."))
    p.add_argument("--frames", type=int, default=50)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--vocoder", default="fast", choices=["fast", "code2wav"])
    p.add_argument("--vocoder-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="code2wav matrix dtype (default bf16, the TPU norm)")
    p.add_argument("--code2wav-impl", default="packed",
                   choices=["packed", "reference"])
    p.add_argument("--quantize", default="off",
                   choices=["off", "int8", "int4", "mixed"])
    p.add_argument("--kv-cache", default="bf16", choices=["bf16", "int8"])
    p.add_argument("--cp-quantize", default="int8", choices=["int8", "int4"],
                   help="code-predictor tier when --quantize is on")
    args = p.parse_args()

    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    eng = TTSEngine(TTSConfig(
        max_seq_len=args.max_seq, max_new_tokens=args.frames,
        vocoder_backend=args.vocoder, vocoder_dtype=args.vocoder_dtype,
        code2wav_impl=args.code2wav_impl,
        quantize=False if args.quantize == "off" else args.quantize,
        kv_cache=args.kv_cache, cp_quantize=args.cp_quantize))
    eng.initialize()

    # Warm both public paths once (also compiles the utterance's trailing bucket)
    eng.synthesize(args.text)

    async def stream():
        t0 = time.perf_counter()
        total = 0
        n_chunks = 0
        async for audio, sr in eng.synthesize_streaming(args.text):
            total += len(audio)
            n_chunks += 1
        return time.perf_counter() - t0, total, n_chunks

    asyncio.run(stream())   # warm

    best_ns = float("inf")
    for _ in range(args.runs):
        t0 = time.perf_counter()
        wav, sr = eng.synthesize(args.text)
        best_ns = min(best_ns, time.perf_counter() - t0)
    dur = len(wav) / sr
    rtf_ns = best_ns / dur
    print(f"non-streaming: {best_ns * 1000:.0f} ms for {dur:.2f}s audio "
          f"({eng.get_metrics()['frames_generated']} frames)")
    print(f"non-streaming RTF: {rtf_ns:.3f} ({'PASS' if rtf_ns < 0.3 else 'FAIL'} vs 0.3)")

    best_s = float("inf")
    for _ in range(args.runs):
        wall, samples, n_chunks = asyncio.run(stream())
        best_s = min(best_s, wall)
    sdur = samples / eng.sample_rate
    rtf_s = best_s / sdur if sdur else float("inf")
    print(f"streaming: {best_s * 1000:.0f} ms for {sdur:.2f}s audio in {n_chunks} chunks")
    print(f"streaming RTF: {rtf_s:.3f} ({'PASS' if rtf_s < 0.3 else 'FAIL'} vs 0.3)")


if __name__ == "__main__":
    main()
