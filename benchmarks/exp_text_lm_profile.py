"""Where does the text-LM decode step spend its time?

The talker megakernel step is ~1.3 ms (874 MB of bf16 weights at ~700 GB/s);
the text LM is the SAME architecture except vocab 151936 (311 MB unfused
head + 311 MB embedding table), so speed-of-light is ~1.8-2.3 ms/step.
This experiment times jitted N-step scans (marginal rate between two N ->
kernel-only rate, docs/05) for:

  mega         full megakernel step (unfused XLA head)
  mega-nohead  same but logits replaced by a 128-wide dummy head — isolates
               the 311 MB head matvec
  mega-noembed feed a fixed embedding instead of the 311 MB table gather
  dense        pure-XLA oracle step

Usage (repo root, solo TPU): python benchmarks/exp_text_lm_profile.py
"""
from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args):
    out = fn(*args)
    tok = out[1]
    np.asarray(tok)                       # honest sync (axon)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out[1])
    return time.perf_counter() - t0


def main() -> None:
    from qwen_tts_tpu.core.weights import init_decoder_weights
    from qwen_tts_tpu.models.decoder import (
        decode_step,
        decode_step_with_embed,
        init_state,
    )
    from qwen_tts_tpu.models.text_lm import TEXT_LM_CONFIG

    cfg = TEXT_LM_CONFIG
    w = init_decoder_weights(jax.random.PRNGKey(0), cfg)
    H = cfg.hidden_size

    def scan_steps(attn_impl, head_mode, embed_mode, n):
        @partial(jax.jit, static_argnames=())
        def run(w, state, tok):
            fixed = jnp.zeros((H,), jnp.float32)

            def body(carry, _):
                state, tok = carry
                if embed_mode == "table":
                    emb = w.embed[tok]
                else:
                    emb = fixed
                state, nt, normed = decode_step_with_embed(
                    cfg, w, state, emb, attn_impl=attn_impl)
                if head_mode == "dummy":
                    # overwrite the token with a head-free readout so the
                    # real head matvec is dead code XLA eliminates
                    nt = jnp.argmax(normed[:128]).astype(jnp.int32)
                return (state, nt), nt

            (state, tok), toks = jax.lax.scan(body, (state, tok), None,
                                              length=n)
            return state, toks

        return run

    results = {}
    for name, (attn, head, embed) in {
        "mega": ("mega", "real", "table"),
        "mega-nohead": ("mega", "dummy", "table"),
        "mega-noembed": ("mega", "real", "fixed"),
        "mega-bare": ("mega", "dummy", "fixed"),
        "dense": ("dense", "real", "table"),
    }.items():
        per_n = {}
        for n in (16, 64):
            fn = scan_steps(attn, head, embed, n)
            state = init_state(cfg)
            tok = jnp.int32(11)
            dt = timed(fn, w, state, tok)
            per_n[n] = dt
        marginal = (per_n[64] - per_n[16]) / (64 - 16)
        results[name] = (per_n, marginal)
        print(f"{name:13s} 16-step {per_n[16]*1e3:8.1f} ms   "
              f"64-step {per_n[64]*1e3:8.1f} ms   "
              f"marginal {marginal*1e3:7.2f} ms/step "
              f"({1.0/marginal:6.1f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
