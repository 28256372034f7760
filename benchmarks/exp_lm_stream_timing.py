"""Warm `TextLM.generate_stream` wall time: main thread vs executor thread.

The jitted scan itself runs at ~1.65 ms/step (exp_text_lm_profile), yet the
agent demo saw ~1.27 s to the first 10-word sentence. This isolates the
stream-call overhead: prefill + first chunk, timed warm, called (a) from
the main thread and (b) from a ThreadPoolExecutor thread (the demo's
producer), plus per-phase timers inside one call.

Usage (repo root, solo TPU): python benchmarks/exp_lm_stream_timing.py
"""
from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from qwen_tts_tpu.core.weights import init_decoder_weights
    from qwen_tts_tpu.models.text_lm import TEXT_LM_CONFIG, TextLM

    cfg = TEXT_LM_CONFIG
    w = init_decoder_weights(jax.random.PRNGKey(7), cfg)
    lm = TextLM(w, cfg, attn_impl="mega")
    prompt = list(range(64))

    def one_stream():
        t0 = time.perf_counter()
        marks = []
        for batch in lm.generate_stream(prompt, max_new_tokens=30, chunk=16):
            marks.append((time.perf_counter() - t0, len(batch)))
        return marks

    print("cold (compiles):", flush=True)
    t0 = time.perf_counter()
    one_stream()
    print(f"  {time.perf_counter() - t0:.1f} s", flush=True)

    for label in ("main-thread", "main-thread-2"):
        t0 = time.perf_counter()
        marks = one_stream()
        total = time.perf_counter() - t0
        pretty = " ".join(f"+{m*1e3:.0f}ms/{n}tok" for m, n in marks)
        print(f"warm {label}: total {total*1e3:.1f} ms  [{pretty}]",
              flush=True)

    with ThreadPoolExecutor(max_workers=1) as ex:
        for label in ("executor", "executor-2"):
            t0 = time.perf_counter()
            marks = ex.submit(one_stream).result()
            total = time.perf_counter() - t0
            pretty = " ".join(f"+{m*1e3:.0f}ms/{n}tok" for m, n in marks)
            print(f"warm {label}: total {total*1e3:.1f} ms  [{pretty}]",
                  flush=True)

    # CONTRAST: the bare (un-jitted) prefill building block, called
    # directly — this is the op-by-op eager path TextLM used before
    # `_prefill_ids`; ~1.1 s of per-op tunnel dispatches for 28 layers
    from qwen_tts_tpu.models.decoder import init_state, prefill
    from qwen_tts_tpu.runtime.generate import generate_tokens

    ids = jnp.asarray(np.asarray(prompt), dtype=jnp.int32)
    for it in range(2):
        t0 = time.perf_counter()
        state = init_state(cfg)
        state, first, _ = prefill(cfg, w, state, w.embed[ids],
                                  attn_impl="mega")
        t1 = time.perf_counter()
        first_h = int(np.asarray(first))
        t2 = time.perf_counter()
        state, toks = generate_tokens(cfg, w, state, first, 16,
                                      attn_impl="mega")
        t3 = time.perf_counter()
        host = np.asarray(toks)
        t4 = time.perf_counter()
        print(f"eager-contrast[{it}]: prefill-dispatch {(t1-t0)*1e3:.1f} ms  "
              f"first-readback {(t2-t1)*1e3:.1f} ms  "
              f"chunk-dispatch {(t3-t2)*1e3:.1f} ms  "
              f"chunk-readback {(t4-t3)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
