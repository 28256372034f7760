#!/usr/bin/env python3
"""Talker decode throughput (kernel-level tok/s).

TPU port of the reference benchmark (reference: benchmarks/measure_tok_s.py:
18-119 — CUDA-event timing of `step` and `step_with_embed`). Here both modes
run as `lax.scan` loops inside one jit (the generate_nosync equivalent) and
as per-step dispatches (the engine's actual frame-loop granularity).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=256)
    p.add_argument("--max-seq", type=int, default=8192)
    p.add_argument("--backend", default="pallas", choices=["pallas", "dense"])
    args = p.parse_args()

    from qwen_tts_tpu.core.config import CODEC_BOS, DecoderConfig
    from qwen_tts_tpu.core.weights import init_decoder_weights
    from qwen_tts_tpu.models.decoder import decode_step_with_embed, init_state
    from qwen_tts_tpu.runtime.generate import generate_tokens
    from qwen_tts_tpu.utils.timing import sync

    cfg = DecoderConfig(max_seq_len=args.max_seq)
    w = init_decoder_weights(jax.random.PRNGKey(0), cfg)
    impl = args.backend if args.backend != "dense" else "dense"

    # Mode 1: fused scan (no host syncs between steps)
    def run_scan():
        state = init_state(cfg)
        _, tokens = generate_tokens(cfg, w, state, jnp.int32(CODEC_BOS),
                                    args.steps, attn_impl=impl)
        return np.asarray(tokens)

    run_scan(); run_scan()
    t0 = time.perf_counter(); run_scan(); dt = time.perf_counter() - t0
    scan_tok_s = args.steps / dt
    print(f"scan mode ({args.backend}): {scan_tok_s:.0f} tok/s "
          f"({dt / args.steps * 1000:.2f} ms/step)")

    # Mode 2: per-step dispatch (step_with_embed granularity)
    import functools
    step = jax.jit(functools.partial(decode_step_with_embed, cfg, attn_impl=impl),
                   donate_argnames=("state",))
    embed = jnp.zeros((cfg.hidden_size,), dtype=jnp.bfloat16)
    state = init_state(cfg)
    state, tok, hid = step(w, state, embed)
    sync(tok)
    n = min(args.steps, 64)
    t0 = time.perf_counter()
    for _ in range(n):
        state, tok, hid = step(w, state, embed)
    sync(tok)
    dt = time.perf_counter() - t0
    print(f"per-step dispatch: {n / dt:.0f} tok/s ({dt / n * 1000:.2f} ms/step)")

    target = 1000.0
    print(f"{'PASS' if scan_tok_s >= target else 'FAIL'}: scan {scan_tok_s:.0f} "
          f"vs target {target:.0f} tok/s")


if __name__ == "__main__":
    main()
