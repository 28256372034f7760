#!/usr/bin/env python3
"""Real-time factor over N frames (streaming + non-streaming, warm paths).

TPU port of the reference RTF benchmark (reference: benchmarks/measure_rtf.py:
23-153). Both modes run through the public engine API on warm compiled
signatures; the streaming mode exercises the fully fused pipelined path
(frames+vocoder per dispatch, depth-2 speculation) and reports the
steady-state inter-chunk wall (median gap between chunk arrivals after the
first) — the direct probe for the dispatch pipeline: with the readback round
trip overlapped against the next chunk's compute, the gap should sit near
max(chunk compute, tunnel RTT) rather than their sum.
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
    p.add_argument("--cp-quantize", default="int8",
                   choices=["int8", "int4", "mixed"],
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
        arrivals = []
        async for audio, sr in eng.synthesize_streaming(args.text):
            arrivals.append(time.perf_counter() - t0)
            total += len(audio)
        return arrivals[-1] if arrivals else 0.0, total, arrivals

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

    best_s, samples = float("inf"), 0
    best_arrivals = []
    for _ in range(args.runs):
        wall, run_samples, arrivals = asyncio.run(stream())
        if wall < best_s:
            best_s, samples, best_arrivals = wall, run_samples, arrivals
    n_chunks = len(best_arrivals)
    sdur = samples / eng.sample_rate
    rtf_s = best_s / sdur if sdur else float("inf")
    print(f"streaming: {best_s * 1000:.0f} ms for {sdur:.2f}s audio in {n_chunks} chunks")
    gaps = sorted(b - a for a, b in zip(best_arrivals[1:-1], best_arrivals[2:]))
    if gaps:   # steady-state chunks only: skip TTFC and the terminal partial
        print(f"inter-chunk wall: median {gaps[len(gaps) // 2] * 1000:.1f} ms "
              f"max {gaps[-1] * 1000:.1f} ms over {len(gaps)} steady gaps")
    print(f"streaming RTF: {rtf_s:.3f} ({'PASS' if rtf_s < 0.3 else 'FAIL'} vs 0.3)")


if __name__ == "__main__":
    main()
