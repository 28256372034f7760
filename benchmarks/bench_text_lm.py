#!/usr/bin/env python3
"""Original Qwen3-0.6B text-LM benchmark + correctness check.

TPU port of the reference text-LM bench (reference: qwen_megakernel/bench.py:
83-133 — tok/s plus a greedy-token golden check against HuggingFace
`model.generate`). Offline (no checkpoint), the golden check runs
megakernel-vs-oracle instead; pass --model-path to check against real
weights loaded from safetensors.
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
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--prompt-len", type=int, default=16)
    p.add_argument("--model-path", default=None)
    p.add_argument("--check-steps", type=int, default=20)
    p.add_argument("--quantize", default="off",
                   choices=["off", "int8", "int4", "mixed"],
                   help="weight-only quantization (incl. the 311 MB head "
                        "-> int8): the text LM is pure HBM-bandwidth-bound, "
                        "so tok/s scales with weight bytes exactly like the "
                        "talker tiers")
    p.add_argument("--kv-cache", default="bf16", choices=["bf16", "int8"],
                   help="int8 KV cache: halves the position-proportional "
                        "cache-read bytes (same machinery as the talker's "
                        "kv8 serve path)")
    args = p.parse_args()

    from qwen_tts_tpu.core.weights import init_decoder_weights
    from qwen_tts_tpu.models.decoder import decode_step, init_state, prefill
    from qwen_tts_tpu.models.text_lm import TEXT_LM_CONFIG, TextLM, load_text_lm_weights
    from qwen_tts_tpu.runtime.generate import generate_tokens

    cfg = TEXT_LM_CONFIG
    if args.model_path:
        w, tok = load_text_lm_weights(args.model_path, cfg)
    else:
        w = init_decoder_weights(jax.random.PRNGKey(0), cfg)
        tok = None
    if args.quantize != "off":
        from qwen_tts_tpu.core.weights import (
            quantize_decoder_weights,
            quantize_decoder_weights_int4,
            quantize_decoder_weights_mixed,
        )

        w = {"int8": quantize_decoder_weights,
             "int4": quantize_decoder_weights_int4,
             "mixed": quantize_decoder_weights_mixed}[args.quantize](w)

    lm = TextLM(w, cfg, tokenizer=tok, attn_impl="mega",
                kv_cache=args.kv_cache)
    prompt = list(range(1, args.prompt_len + 1))

    # throughput (prefill + fused scan decode); warm first — the cold call
    # pays the jit compiles, which are not a per-token cost
    t0 = time.perf_counter()
    out = lm.generate(prompt, max_new_tokens=args.steps)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = lm.generate(prompt, max_new_tokens=args.steps)
    dt = time.perf_counter() - t0
    print(f"text LM: {args.steps / dt:.0f} tok/s end-to-end warm "
          f"({dt / args.steps * 1000:.2f} ms/tok incl. prefill; "
          f"cold first call {cold:.1f} s; quantize={args.quantize} "
          f"kv={args.kv_cache})")
    print(f"first tokens: {out[:8]}")

    # golden check: megakernel (at the benched kv dtype) vs bf16-KV oracle
    state_o = init_state(cfg)
    state_m = init_state(cfg, lm.kv_dtype)
    ids = jnp.asarray(prompt, dtype=jnp.int32)
    state_o, tok_o, _ = prefill(cfg, w, state_o, w.embed[ids])
    state_m, tok_m, _ = prefill(cfg, w, state_m, w.embed[ids], attn_impl="mega")
    match = int(tok_o == tok_m)
    for _ in range(args.check_steps - 1):
        state_o, tok_o, _ = decode_step(cfg, w, state_o, tok_o)
        state_m, tok_m, _ = decode_step(cfg, w, state_m, tok_m, attn_impl="mega")
        match += int(int(tok_o) == int(tok_m))
    rate = match / args.check_steps
    print(f"golden check (oracle vs megakernel): {match}/{args.check_steps} "
          f"tokens ({rate:.0%}) → {'PASS' if rate >= 0.95 else 'FAIL'}")
    sys.exit(0 if rate >= 0.95 else 1)


if __name__ == "__main__":
    main()
