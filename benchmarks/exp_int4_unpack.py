#!/usr/bin/env python3
"""Experiment: where does int4 generate throughput go?

Measures, in ONE process (same weights, same session RTT):
  1. int8 per-channel         — the quality-tier reference point
  2. int8 group-128           — isolates the grouped-dot cost (same bytes
                                as int8, same scale shape as int4)
  3. int4 mask-unpack         — current production form
  4. int4 shift-unpack        — `(w<<28)>>28` / `w>>4` sign-extension
                                (3 shifts vs 4 logical ops per byte)

Each mode reports marginal tok/s between --steps and --steps/2 as well —
the (t_N - t_{N/2}) rate subtracts the fixed per-call overhead (~1 tunnel
RTT), the TPU analog of the reference's CUDA-event kernel-only timing
(reference: benchmarks/measure_tok_s.py:51-63).
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
from qwen_tts_tpu.ops import decode_step as ds
from qwen_tts_tpu.ops import generate_kernel as gk


def _make_mms_int4(unpack):
    """make_mms with a custom int4 nibble sign-extension `unpack(wi) → (lo, hi)`
    (wi is the packed byte widened to int32; halves are returned as bf16)."""
    base_mm, base_scaled = ds.make_mms()

    def _grouped(ah, wh, sh):
        ngh, n_out = sh.shape
        gs = ah.shape[1] // ngh
        wg = wh.reshape(ngh, gs, n_out)
        ag = ah.reshape(ngh, 1, gs)
        partial = jax.lax.dot_general(
            ag, wg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.sum(partial * sh[:, None, :], axis=0)

    def mm_scaled(a, w, s):
        ng = s.shape[0]
        if 2 * w.shape[0] == a.shape[1]:               # packed int4
            lo, hi = unpack(w.astype(jnp.int32))
            half = a.shape[1] // 2
            return (_grouped(a[:, :half], lo, s[: ng // 2]) +
                    _grouped(a[:, half:], hi, s[ng // 2:]))
        return base_scaled(a, w, s)

    return base_mm, mm_scaled


def make_mms_shift():
    """Arithmetic-shift sign extension (production form since round 2):
    3 ops — `(w<<28)>>28` for the low nibble, `w>>4` for the high."""
    return _make_mms_int4(lambda wi: (
        ((wi << 28) >> 28).astype(jnp.bfloat16),
        (wi >> 4).astype(jnp.bfloat16)))


def make_mms_mask():
    """Mask/xor/sub sign extension (the pre-round-2 production form this A/B
    originally measured against): 4 logical ops — `((w & 15) ^ 8) - 8` for
    the low nibble; the high nibble still needs the arithmetic shift to
    reach the bits, then the same identity."""
    return _make_mms_int4(lambda wi: (
        (((wi & 15) ^ 8) - 8).astype(jnp.bfloat16),
        ((((wi >> 4) & 15) ^ 8) - 8).astype(jnp.bfloat16)))


def bench(cfg, gen_w, steps, warmup=1, repeats=2):
    def run(n):
        state = init_state(cfg)
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
        ("int8", lambda: quantize_decoder_weights(w), None),
        ("int8-g128", lambda: quantize_decoder_weights(w, group_size=128), None),
        ("int4-mask", lambda: quantize_decoder_weights_int4(w), make_mms_mask),
        ("int4-shift", lambda: quantize_decoder_weights_int4(w), make_mms_shift),
    ]
    for name, qf, mms in modes:
        if mms is not None:
            gk.make_mms = mms
        gk.generate_megakernel.clear_cache()
        full, marginal = bench(cfg, qf(), args.steps)
        print(f"{name:12s} full {full:7.1f} tok/s   "
              f"marginal {marginal:7.1f} tok/s", flush=True)
    gk.make_mms = ds.make_mms


if __name__ == "__main__":
    main()
