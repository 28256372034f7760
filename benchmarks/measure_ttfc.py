#!/usr/bin/env python3
"""Time-to-first-chunk breakdown.

TPU port of the reference's 6-phase TTFC breakdown
(reference: benchmarks/measure_ttfc.py:22-99): tokenize → embed/projection →
prefill (one fused dispatch incl. first decode) → first code-predictor frame
→ first vocoder decode.
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
    p.add_argument("--text", default="The quick brown fox jumps over the lazy dog.")
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--runs", type=int, default=5)
    args = p.parse_args()

    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine
    from qwen_tts_tpu.runtime.frame_loop import frame_step, talker_prefill
    from qwen_tts_tpu.models.decoder import init_state
    from qwen_tts_tpu.utils.timing import sync

    eng = TTSEngine(TTSConfig(max_seq_len=args.max_seq))
    t0 = time.perf_counter()
    eng.initialize()
    print(f"initialize: {time.perf_counter() - t0:.1f}s (cold, incl. compile)")

    mc, cfg = eng.model_config, eng.config
    best = None
    for _ in range(args.runs):
        phases = {}
        t = time.perf_counter()
        prefill_embeds, trailing, t_len = eng._build_prefill(args.text)
        sync(prefill_embeds)
        phases["tokenize+embed"] = time.perf_counter() - t

        t = time.perf_counter()
        state = init_state(mc.talker)
        state, token, hidden = talker_prefill(
            mc.talker, eng.weights.talker, state, prefill_embeds,
            attn_impl=eng._attn_impl)
        sync(token)
        phases["prefill+first_decode"] = time.perf_counter() - t

        t = time.perf_counter()
        r = frame_step(
            mc.talker, mc.code_predictor, eng.weights.talker,
            eng.weights.code_predictor, state, token, hidden,
            trailing, jnp.int32(t_len), jnp.int32(0),
            eng._tts_pad_embed, jax.random.PRNGKey(0),
            do_sample=cfg.subtalker_do_sample,
            temperature=cfg.subtalker_temperature,
            top_k=cfg.subtalker_top_k, attn_impl=eng._attn_impl)
        codes = np.asarray(r.codes)
        phases["first_frame(CP+talker)"] = time.perf_counter() - t

        t = time.perf_counter()
        eng._decode_to_audio([codes])
        phases["vocoder(1 frame)"] = time.perf_counter() - t

        total = sum(phases.values())
        if best is None or total < best[0]:
            best = (total, phases)

    total, phases = best
    for k, v in phases.items():
        print(f"  {k:24s} {v * 1000:7.1f} ms")
    print(f"  {'TOTAL TTFC':24s} {total * 1000:7.1f} ms "
          f"({'PASS' if total * 1000 < 90 else 'FAIL'} vs 90 ms)")


if __name__ == "__main__":
    main()
