#!/usr/bin/env python3
"""int8-KV-cache quality + long-run throughput evidence.

Free-runs the generate megakernel with identical weights under bf16 vs
int8 KV caches and reports token-trajectory agreement (prefix length to
first divergence + total agreement). Teacher-forced per-step comparison is
not possible inside the fused generate kernel (token feedback is
on-device), so trajectory agreement is the honest end-to-end measure; the
per-element cache-fidelity bound is covered by interpret tests
(tests/test_generate_kernel.py::test_generate_kv8_matches_oracle).

Also times both modes at a long step count, where the int8 cache's halved
position-proportional read traffic matters most.
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

from qwen_tts_tpu.core.config import CODEC_BOS, DecoderConfig
from qwen_tts_tpu.core.weights import (
    init_decoder_weights,
    quantize_decoder_weights,
    quantize_decoder_weights_int4,
)
from qwen_tts_tpu.models.decoder import init_state
from qwen_tts_tpu.ops.generate_kernel import generate_megakernel


def trajectory(cfg, w, dtype, steps):
    state = init_state(cfg, dtype)
    state, tokens = generate_megakernel(cfg, w, state, jnp.int32(CODEC_BOS),
                                        steps)
    return np.asarray(tokens)


def agreement(a, b):
    eq = a == b
    prefix = int(np.argmin(eq)) if not eq.all() else len(a)
    return prefix, float(eq.mean())


def timed(cfg, w, dtype, steps, repeats=2):
    def run():
        state = init_state(cfg, dtype)
        state, tokens = generate_megakernel(
            cfg, w, state, jnp.int32(CODEC_BOS), steps)
        return np.asarray(tokens)

    run()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); run()
        best = min(best, time.perf_counter() - t0)
    return steps / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--long-steps", type=int, default=4096)
    ap.add_argument("--max-seq", type=int, default=8192)
    args = ap.parse_args()

    cfg = DecoderConfig(max_seq_len=args.max_seq)
    w = init_decoder_weights(jax.random.PRNGKey(0), cfg)

    if args.steps:
        for name, gw in (("bf16-weights", w),
                         ("int8-weights", quantize_decoder_weights(w)),
                         ("int4-weights", quantize_decoder_weights_int4(w))):
            a = trajectory(cfg, gw, jnp.bfloat16, args.steps)
            b = trajectory(cfg, gw, jnp.int8, args.steps)
            prefix, agree = agreement(a, b)
            print(f"{name:13s} bf16-cache vs int8-cache over {args.steps}: "
                  f"prefix match {prefix}, agreement {agree:.1%}", flush=True)

    if args.long_steps:
        qw = quantize_decoder_weights_int4(w)
        t_bf = timed(cfg, qw, jnp.bfloat16, args.long_steps)
        t_q8 = timed(cfg, qw, jnp.int8, args.long_steps)
        print(f"int4 weights @ {args.long_steps} steps: bf16 cache "
              f"{t_bf:.1f} tok/s, int8 cache {t_q8:.1f} tok/s "
              f"({t_q8 / t_bf - 1:+.1%})", flush=True)


if __name__ == "__main__":
    main()
