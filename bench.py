#!/usr/bin/env python3
"""Headline benchmarks, driver-readable: one JSON line per metric.

Default (`--mode full`) measures, in order:
  {"metric": "ttfc_ms", ...}              streaming time-to-first-chunk
  {"metric": "rtf_nonstreaming", ...}     wall / audio-duration, synthesize()
  {"metric": "rtf_streaming", ...}        wall / audio-duration, streaming
  {"metric": "talker_decode_tok_s...", .} talker decode throughput (LAST —
                                          the driver's parsed headline)

Methodology matches the reference benchmarks:
- TTFC = wall time from `synthesize_streaming(text)` to the first audio
  chunk on warm compiled paths (reference: benchmarks/measure_ttfc.py:22-99,
  README.md:10 — 81.6 ms streaming baseline).
- RTF = best wall / generated-audio-duration over the public API
  (reference: benchmarks/measure_rtf.py:126-153 — 0.177 / 0.234 baselines).
- tok/s = N timed decode steps as ONE `lax.scan`-style megakernel with
  on-device token feedback (the generate_nosync equivalent, reference:
  csrc/kernel.cu:1555-1613, benchmarks/measure_tok_s.py:18-75 — ~1,000
  tok/s baseline), warmup excluded.
Sync discipline: every timing ends in a host transfer (`np.asarray`) —
`jax.block_until_ready` returns early on this tunneled platform.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def emit(metric, value, unit, vs_baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 3 if value < 10 else 1),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 3),
    }), flush=True)


def bench_tok_s(args):
    from qwen_tts_tpu.core.config import CODEC_BOS, DecoderConfig
    from qwen_tts_tpu.core.weights import init_decoder_weights
    from qwen_tts_tpu.models.decoder import init_state
    from qwen_tts_tpu.runtime.generate import generate_tokens

    cfg = DecoderConfig(max_seq_len=args.max_seq)
    w = init_decoder_weights(jax.random.PRNGKey(0), cfg)

    if args.backend.startswith("megagen"):
        from qwen_tts_tpu.ops.generate_kernel import generate_megakernel

        gen_w = w
        base = args.backend.removesuffix("-kv8")
        kv_dtype = jnp.int8 if args.backend.endswith("-kv8") else jnp.bfloat16
        if base == "megagen-int8":
            from qwen_tts_tpu.core.weights import quantize_decoder_weights

            gen_w = quantize_decoder_weights(w)
        elif base == "megagen-int4":
            from qwen_tts_tpu.core.weights import quantize_decoder_weights_int4

            gen_w = quantize_decoder_weights_int4(w)

        def run():
            state = init_state(cfg, kv_dtype)
            state, tokens = generate_megakernel(
                cfg, gen_w, state, jnp.int32(CODEC_BOS), args.steps)
            # host transfer = the only honest sync on this platform
            return np.asarray(tokens)
    else:
        attn_impl = args.backend

        def run():
            state = init_state(cfg)
            state, tokens = generate_tokens(
                cfg, w, state, jnp.int32(CODEC_BOS), args.steps,
                attn_impl=attn_impl)
            return np.asarray(tokens)

    for _ in range(args.warmup):
        run()
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)

    tok_s = args.steps / best
    suffix = {"megagen-int8": "_int8_weights",
              "megagen-int4": "_int4_weights",
              "megagen-int8-kv8": "_int8_weights_kv8",
              "megagen-int4-kv8": "_int4_weights_kv8"}.get(args.backend, "")
    emit("talker_decode_tok_s" + suffix, tok_s, "tok/s", tok_s / 1000.0)


def bench_engine(args):
    """TTFC + RTF through the public engine API (warm paths)."""
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    eng = TTSEngine(TTSConfig(max_seq_len=args.engine_max_seq,
                              quantize=args.quantize))
    eng.initialize()

    short = "The quick brown fox jumps over the lazy dog."
    longer = ("This is a longer passage used to measure the sustained real "
              "time factor of the decoder over many frames of speech audio.")

    async def ttfc_once(text):
        t0 = time.perf_counter()
        agen = eng.synthesize_streaming(text)
        async for _audio, _sr in agen:
            dt = time.perf_counter() - t0
            await agen.aclose()
            return dt
        return float("inf")

    async def stream_all(text):
        t0 = time.perf_counter()
        total = 0
        async for audio, _sr in eng.synthesize_streaming(text):
            total += len(audio)
        return time.perf_counter() - t0, total

    from qwen_tts_tpu.utils.timing import drain_device

    # warm each signature (trailing buckets) once before timing; drain the
    # device queue between runs — an aclose()d stream leaves a speculative
    # chunk in flight that would otherwise delay the next run's dispatch
    asyncio.run(ttfc_once(short))
    best_ttfc = float("inf")
    for _ in range(args.runs):
        drain_device()
        best_ttfc = min(best_ttfc, asyncio.run(ttfc_once(short)))
    emit("ttfc_ms", best_ttfc * 1000, "ms", 81.6 / (best_ttfc * 1000))

    eng.synthesize(longer)  # warm
    best_ns, best_samples = float("inf"), 0
    for _ in range(args.runs):
        t0 = time.perf_counter()
        wav, sr = eng.synthesize(longer)
        dt = time.perf_counter() - t0
        if dt < best_ns:   # pair wall time with ITS OWN waveform length
            best_ns, best_samples = dt, len(wav)
    rtf_ns = best_ns / (best_samples / sr)
    emit("rtf_nonstreaming", rtf_ns, "ratio", 0.177 / rtf_ns)

    asyncio.run(stream_all(longer))  # warm
    best_s, samples = float("inf"), 0
    for _ in range(args.runs):
        wall, total = asyncio.run(stream_all(longer))
        if wall < best_s:
            best_s, samples = wall, total
    rtf_s = best_s / (samples / eng.sample_rate)
    emit("rtf_streaming", rtf_s, "ratio", 0.234 / rtf_s)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="full", choices=["full", "tok", "engine"])
    p.add_argument("--steps", type=int, default=1024)
    p.add_argument("--max-seq", type=int, default=8192)
    p.add_argument("--engine-max-seq", type=int, default=2048)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--quantize", action="store_true")
    p.add_argument("--backend", default="megagen-int8",
                   choices=["megagen", "megagen-int8", "megagen-int4",
                            "megagen-int8-kv8", "megagen-int4-kv8",
                            "mega", "pallas", "dense"])
    args = p.parse_args()

    if args.mode in ("full", "engine"):
        try:
            bench_engine(args)
        except Exception as e:  # keep the tok/s headline alive regardless
            print(f"engine bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            if args.mode == "engine":
                raise
    if args.mode == "tok":
        bench_tok_s(args)
    elif args.mode == "full":
        # quantized decode modes; int4 + int8-KV-cache (the fastest) last =
        # the driver's parsed headline
        import copy

        for backend in ("megagen-int8", "megagen-int4", "megagen-int4-kv8"):
            a = copy.copy(args)
            a.backend = backend
            try:
                bench_tok_s(a)
            except Exception as e:
                print(f"tok bench {backend} failed: {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
