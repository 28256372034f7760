"""Aggregate serving throughput: B concurrent streams on ONE chip.

The reference is strictly batch-1 (SURVEY.md §2.3). On TPU, batching is the
natural way past the weight-bandwidth wall: a decode step is bandwidth-bound,
so B streams share each weight read and aggregate tok/s scales until compute
or KV-cache traffic catches up. This measures the vmapped dense frame path
(`runtime/batch.py`) — full frames (1 talker token + 15 CP codes + trailing
embed feedback), i.e. real end-to-end serving work, not just talker steps.

Prints per-B lines plus a summary of aggregate frames/s and per-stream RTF
(streams are real-time while aggregate_frames_per_s / B >= 12.5).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.core.config import TTSModelConfig
from qwen_tts_tpu.core.weights import init_tts_weights
from qwen_tts_tpu.runtime.batch import batched_frames, batched_prefill
from qwen_tts_tpu.utils.timing import sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", type=int, nargs="+",
                    default=[1, 2, 4, 8])
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--chunk-frames", type=int, default=10)
    ap.add_argument("--chunks", type=int, default=8,
                    help="timed chunk dispatches per batch size")
    ap.add_argument("--trailing", type=int, default=64)
    ap.add_argument("--quantize", default="off",
                    choices=["off", "int8", "int4", "mixed"],
                    help="serve quantized weights (the quant-aware dense "
                         "path shares one weight read across the batch)")
    ap.add_argument("--kv-cache", default="bf16", choices=["bf16", "int8"],
                    help="per-utterance KV cache dtype (int8 halves the "
                         "position-proportional cache reads, which scale "
                         "with B)")
    args = ap.parse_args()

    import dataclasses as dc
    mc = TTSModelConfig()
    mc = dc.replace(mc, talker=dc.replace(mc.talker, max_seq_len=args.max_seq))
    w = init_tts_weights(jax.random.PRNGKey(0), mc)
    if args.quantize != "off":
        from qwen_tts_tpu.core.weights import (
            quantize_decoder_weights,
            quantize_decoder_weights_int4,
            quantize_decoder_weights_mixed,
        )

        qt = {"int4": quantize_decoder_weights_int4,
              "mixed": quantize_decoder_weights_mixed,
              "int8": quantize_decoder_weights}[args.quantize](w.talker)
        qcp = quantize_decoder_weights(w.code_predictor.decoder,
                                       quant_head=False)
        w = w._replace(talker=qt,
                       code_predictor=w.code_predictor._replace(decoder=qcp))
    H = mc.talker.hidden_size
    pad = jnp.zeros((H,), jnp.float32)
    frame_rate = mc.frame_rate_hz

    results = []
    for B in args.batch_sizes:
        prefill = jnp.zeros((B, 8, H), jnp.bfloat16)
        trailing = jnp.zeros((B, args.trailing, H), jnp.bfloat16)
        tlen = jnp.full((B,), args.trailing, jnp.int32)
        rngs = jax.random.split(jax.random.PRNGKey(1), B)

        kv_dtype = jnp.int8 if args.kv_cache == "int8" else jnp.bfloat16
        state, tok, hid = batched_prefill(mc.talker, w.talker, prefill,
                                          kv_dtype=kv_dtype)
        idx0 = jnp.zeros((B,), jnp.int32)
        # warm (compile) one chunk
        state, codes, valid, tok, hid = batched_frames(
            mc.talker, mc.code_predictor, w.talker, w.code_predictor,
            state, tok, hid, trailing, tlen, idx0, pad, rngs,
            num_frames=args.chunk_frames)
        idx0 = idx0 + args.chunk_frames
        sync(codes)

        t0 = time.perf_counter()
        for _ in range(args.chunks):
            state, codes, valid, tok, hid = batched_frames(
                mc.talker, mc.code_predictor, w.talker, w.code_predictor,
                state, tok, hid, trailing, tlen, idx0, pad, rngs,
                num_frames=args.chunk_frames)
            idx0 = idx0 + args.chunk_frames
        sync(codes)
        dt = time.perf_counter() - t0

        frames = args.chunks * args.chunk_frames * B
        fps = frames / dt
        per_stream = fps / B
        rtf = frame_rate / per_stream
        results.append((B, fps, per_stream, rtf))
        print(f"B={B:3d}  aggregate {fps:8.1f} frames/s  "
              f"per-stream {per_stream:6.1f} frames/s  RTF {rtf:.3f}  "
              f"({'real-time' if rtf < 1 else 'NOT real-time'})")

    realtime = [r for r in results if r[3] < 1]
    if realtime:
        best = max(realtime, key=lambda r: r[1])
        print(f"\nbest real-time config: B={best[0]} -> {best[1]:.1f} frames/s "
              f"aggregate ({best[1] / frame_rate:.1f}x real-time total)")
    else:
        print("\nno batch size is real-time at this configuration")


if __name__ == "__main__":
    main()
