#!/usr/bin/env python3
"""Headline benchmark: talker decode throughput (tok/s) on one chip.

Mirrors the reference's kernel-only tok/s methodology
(reference: benchmarks/measure_tok_s.py:18-75 — warmup excluded, N timed
decode steps, device-sync bracketed): here the N steps run as one
`lax.scan` with on-device token feedback (the generate_nosync equivalent,
reference: csrc/kernel.cu:1555-1613) and `jax.block_until_ready` brackets.

Prints ONE JSON line:
  {"metric": "talker_decode_tok_s", "value": N, "unit": "tok/s",
   "vs_baseline": N/1000}
Baseline: ~1,000 tok/s talker decode on the reference RTX 5090
(reference: README.md:15).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1024)
    p.add_argument("--max-seq", type=int, default=8192)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--backend", default="megagen-int8",
                   choices=["megagen", "megagen-int8", "mega", "mega2", "pallas", "dense"])
    args = p.parse_args()

    from qwen_tts_tpu.core.config import CODEC_BOS, DecoderConfig
    from qwen_tts_tpu.core.weights import init_decoder_weights
    from qwen_tts_tpu.models.decoder import init_state
    from qwen_tts_tpu.runtime.generate import generate_tokens

    cfg = DecoderConfig(max_seq_len=args.max_seq)
    w = init_decoder_weights(jax.random.PRNGKey(0), cfg)

    import numpy as np

    if args.backend.startswith("megagen"):
        from qwen_tts_tpu.ops.generate_kernel import generate_megakernel

        gen_w = w
        if args.backend == "megagen-int8":
            from qwen_tts_tpu.core.weights import quantize_decoder_weights

            gen_w = quantize_decoder_weights(w)

        def run():
            state = init_state(cfg)
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
    metric = "talker_decode_tok_s"
    if args.backend == "megagen-int8":
        metric = "talker_decode_tok_s_int8_weights"
    print(json.dumps({
        "metric": metric,
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
