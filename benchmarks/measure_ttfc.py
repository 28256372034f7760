#!/usr/bin/env python3
"""Time-to-first-chunk: streaming TTFC through the public API + phase split.

TPU port of the reference's TTFC breakdown
(reference: benchmarks/measure_ttfc.py:22-99). The headline number is the
wall time from `synthesize_streaming(text)` to the first audio chunk on warm
compiled paths — the same definition as the reference's streaming TTFC
(reference: README.md:10). The phase split reruns the pieces individually:
tokenize+embed, prefill(+first decode), first frame+vocoder dispatch.
"""

import argparse
import asyncio
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


async def ttfc_once(eng, text):
    t0 = time.perf_counter()
    agen = eng.synthesize_streaming(text)
    async for audio, sr in agen:
        dt = time.perf_counter() - t0
        await agen.aclose()
        return dt, len(audio)
    return float("inf"), 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text", default="The quick brown fox jumps over the lazy dog.")
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--runs", type=int, default=5)
    args = p.parse_args()

    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine
    from qwen_tts_tpu.models.decoder import init_state
    from qwen_tts_tpu.runtime.frame_loop import talker_prefill
    from qwen_tts_tpu.utils.timing import sync

    eng = TTSEngine(TTSConfig(max_seq_len=args.max_seq))
    t0 = time.perf_counter()
    eng.initialize()
    print(f"initialize: {time.perf_counter() - t0:.1f}s (cold, incl. compile)")

    from qwen_tts_tpu.utils.timing import drain_device

    # warm the utterance's trailing bucket
    asyncio.run(ttfc_once(eng, args.text))

    best = float("inf")
    for _ in range(args.runs):
        drain_device()   # fence the previous run's speculative chunk
        dt, nsamp = asyncio.run(ttfc_once(eng, args.text))
        best = min(best, dt)
    print(f"streaming TTFC: {best * 1000:.1f} ms (first chunk = {nsamp} samples) "
          f"({'PASS' if best * 1000 < 90 else 'FAIL'} vs 90 ms)")

    # phase split: host tokenization vs the single fused device dispatch
    from qwen_tts_tpu.engine.tokenizer import encode_tts_prompt

    phases = {}
    t = time.perf_counter()
    text_ids = encode_tts_prompt(eng.tokenizer, args.text)
    content = np.asarray(text_ids[3:], dtype=np.int32)
    phases["tokenize (host)"] = time.perf_counter() - t

    bucket = eng.config.trailing_bucket
    Tpad = max(((len(content) + bucket - 1) // bucket) * bucket, bucket)
    ids = np.zeros(Tpad, dtype=np.int32)
    ids[:len(content)] = content
    key = jax.device_put(jax.random.PRNGKey(0))
    drain_device()
    t = time.perf_counter()
    ids_dev, n_dev = jax.device_put((ids, np.int32(len(content))))
    out = eng._first_audio_fn(ids_dev, n_dev, key)
    np.asarray(out[5])
    phases["fused text→first audio (1 dispatch)"] = time.perf_counter() - t

    for k, v in phases.items():
        print(f"  {k:38s} {v * 1000:7.1f} ms")
    print(f"  {'sum of phases':38s} {sum(phases.values()) * 1000:7.1f} ms")


if __name__ == "__main__":
    main()
