#!/usr/bin/env python3
"""Experiment: what does the int8 LM head buy?

The codec head is a [1024, 3072] matvec read once per decode step — ~6 MB
bf16, ~3 MB int8 (+12 KB scales). The reference fuses its head into the
kernel too (reference: csrc/kernel.cu:1022-1185); round 3 quantizes it
per-output-channel (core/weights.py quantize_lm_head), applied as one
multiply on the f32 logits inside mm_scaled.

Measures, in ONE process (same weights, same session RTT), the generate
megakernel with the head bf16 vs int8 for the int8 and int4+kv8 weight
tiers. Reports full-run tok/s AND the marginal rate between --steps and
--steps/2 (subtracts the fixed ~1-RTT per-call overhead — the TPU analog
of the reference's CUDA-event kernel-only timing). Expected effect:
~3 MB/step saved against a ~220-480 MB/step total → low single-digit %.
Token-match evidence for the int8 head lives in `validate_kernel.py`
(the quantized backends all run it) and
tests/test_megakernel.py::test_megakernel_int8_head_logits.
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
from qwen_tts_tpu.ops import generate_kernel as gk


def bench(cfg, gen_w, kv_dtype, steps, warmup=1, repeats=2):
    def run(n):
        state = init_state(cfg, kv_dtype)
        state, tokens = gk.generate_megakernel(
            cfg, gen_w, state, jnp.int32(CODEC_BOS), n)
        return np.asarray(tokens)

    for _ in range(warmup):
        run(steps)
        run(steps // 2)
    best_n = best_h = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); run(steps)
        best_n = min(best_n, time.perf_counter() - t0)
        t0 = time.perf_counter(); run(steps // 2)
        best_h = min(best_h, time.perf_counter() - t0)
    full = steps / best_n
    marginal = (steps - steps // 2) / (best_n - best_h)
    return full, marginal


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1024)
    ap.add_argument("--max-seq", type=int, default=8192)
    args = ap.parse_args()

    cfg = DecoderConfig(max_seq_len=args.max_seq)
    w = init_decoder_weights(jax.random.PRNGKey(0), cfg)

    modes = [
        ("int8 / head bf16",
         quantize_decoder_weights(w, quant_head=False), jnp.bfloat16),
        ("int8 / head int8",
         quantize_decoder_weights(w), jnp.bfloat16),
        ("int4+kv8 / head bf16",
         quantize_decoder_weights_int4(w, quant_head=False), jnp.int8),
        ("int4+kv8 / head int8",
         quantize_decoder_weights_int4(w), jnp.int8),
    ]
    for name, qw, kv in modes:
        full, marginal = bench(cfg, qw, kv, args.steps)
        print(f"{name:22s} full {full:7.1f} tok/s   "
              f"marginal {marginal:7.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
