#!/usr/bin/env python3
"""Dissect the streaming chunk pipeline on hardware: where does the
steady-state inter-chunk wall actually go?

Per iteration of `_generate_audio_chunks` (depth-2 pipeline) this measures
the wall of the two host-side phases:

  - enqueue: the `_chunk_audio_fn` dispatch call (should be ~1 ms — async)
  - read:    the blocking `jax.device_get` of the current chunk

plus two calibration probes after the stream:

  - bare chunk dispatch+sync  → T_compute + RTT for one chunk
  - enqueue / sleep(2*T) / fetch → T_compute alone (does compute really
    overlap host sleep for THIS function, with its donated-state argument?)

If read ≈ compute+RTT in steady state while the calibration shows compute
overlaps a sleep, the pre-read enqueue is not achieving overlap and the
serialization is inside the loop's own dataflow, not the platform.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--frames", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine
    from qwen_tts_tpu.utils.timing import drain_device

    text = ("This is a longer passage used to measure the sustained real "
            "time factor of the decoder over many frames of generated "
            "speech audio.")

    eng = TTSEngine(TTSConfig(max_seq_len=args.max_seq,
                              max_new_tokens=args.frames))
    eng.initialize()
    eng.synthesize(text)                      # warm both paths
    list(eng._generate_audio_chunks(text, eng.config.chunk_frames))

    # ── instrument: wrap the dispatch and the device_get the loop uses
    events = []
    real_chunk_fn = eng._chunk_audio_fn
    real_get = jax.device_get

    def timed_chunk_fn(*a, **k):
        t0 = time.perf_counter()
        out = real_chunk_fn(*a, **k)
        events.append(("enqueue", t0, time.perf_counter()))
        return out

    def timed_get(x):
        t0 = time.perf_counter()
        out = real_get(x)
        events.append(("read", t0, time.perf_counter()))
        return out

    eng._chunk_audio_fn = timed_chunk_fn
    jax.device_get = timed_get
    try:
        drain_device()
        t_start = time.perf_counter()
        for _audio, _frames in eng._generate_audio_chunks(
                text, eng.config.chunk_frames):
            events.append(("yield", time.perf_counter(), time.perf_counter()))
    finally:
        eng._chunk_audio_fn = real_chunk_fn
        jax.device_get = real_get

    print(f"{'event':>8} {'t_start_ms':>10} {'wall_ms':>8}")
    for name, t0, t1 in events:
        print(f"{name:>8} {(t0 - t_start) * 1000:>10.1f} "
              f"{(t1 - t0) * 1000:>8.1f}")

    # ── calibration: one chunk's true compute time, same fn, live state
    # Rebuild a live state by running the first-chunk path directly.
    from qwen_tts_tpu.engine.tokenizer import encode_tts_prompt

    drain_device()
    text_ids = encode_tts_prompt(eng.tokenizer, text)
    content = np.asarray(text_ids[3:], dtype=np.int32)
    bucket = eng.config.trailing_bucket
    Tpad = max(((len(content) + bucket - 1) // bucket) * bucket, bucket)
    content_ids = np.zeros(Tpad, dtype=np.int32)
    content_ids[:len(content)] = content
    rng = jax.random.PRNGKey(0)
    ids_dev, n_dev = jax.device_put((content_ids, np.int32(len(content))))
    state, codes, valid, tok, hid, audio, trailing, t_len = \
        eng._first_audio_fn(ids_dev, n_dev, rng)
    np.asarray(audio)                         # sync

    n = eng.config.chunk_frames
    # dispatch+sync = T_compute + readback RTT
    t0 = time.perf_counter()
    state2, codes2, valid2, tok2, hid2, audio2 = eng._chunk_audio_fn(
        state, tok, hid, trailing, t_len, jnp.int32(1), rng, n)
    np.asarray(audio2)
    sync_ms = (time.perf_counter() - t0) * 1000
    print(f"\nbare chunk dispatch+sync: {sync_ms:.1f} ms (= T_c + RTT)")

    # enqueue / sleep / fetch: if compute overlaps the sleep, fetch ≈ RTT
    t0 = time.perf_counter()
    state3, codes3, valid3, tok3, hid3, audio3 = eng._chunk_audio_fn(
        state2, tok2, hid2, trailing, t_len, jnp.int32(1 + n), rng, n)
    enq_ms = (time.perf_counter() - t0) * 1000
    time.sleep(max(2 * sync_ms / 1000, 0.2))
    t0 = time.perf_counter()
    np.asarray(audio3)
    fetch_ms = (time.perf_counter() - t0) * 1000
    print(f"enqueue {enq_ms:.1f} ms / sleep / fetch {fetch_ms:.1f} ms "
          f"(≈RTT ⇒ compute overlapped the sleep)")


if __name__ == "__main__":
    main()
