"""Drive TPUContinuousTTSService end-to-end on the real TPU.

Two service instances sharing one batcher, two concurrent clients, full
pipecat frame protocol. Prints per-client frame counts, audio seconds,
first-audio latency, and wall time. This is the verification surface for
the multi-client serving layer (serving/pipecat_tts.py).

Usage (repo root, solo TPU process):
    python benchmarks/drive_continuous_service.py [--slots 4] [--clients 2]
"""
from __future__ import annotations

import argparse
import asyncio
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--clients", type=int, default=2)
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from qwen_tts_tpu.engine.tts_engine import TTSConfig
    import qwen_tts_tpu.serving.pipecat_tts as svc

    texts = [
        "Hello from the first concurrent client on the shared batcher.",
        "The second client speaks at the same time over the same chip.",
        "A third request arrives while the first two are still decoding.",
        "Client four joins late and should still be admitted to a slot.",
    ]

    cfg = TTSConfig(max_seq_len=args.max_seq, seed=0)
    t0 = time.perf_counter()
    first = svc.TPUContinuousTTSService(
        config=cfg, sample_rate=24000, slots=args.slots,
        warm=not args.no_warm)
    services = [first] + [
        svc.TPUContinuousTTSService(share=first)
        for _ in range(args.clients - 1)
    ]

    async def one(service, text):
        t_start = time.perf_counter()
        frames, first_audio = [], None
        async for f in service.run_tts(text):
            if first_audio is None and isinstance(f, svc.TTSAudioRawFrame):
                first_audio = time.perf_counter() - t_start
            frames.append(f)
        return frames, first_audio, time.perf_counter() - t_start

    async def drive():
        # build + warm BEFORE the client timers start, so first_audio_ms
        # measures admission latency, not engine compilation
        await first._shared.get()
        init_s = time.perf_counter() - t0
        t_serve = time.perf_counter()
        results = await asyncio.gather(*(
            one(services[i % len(services)], texts[i % len(texts)])
            for i in range(args.clients)))
        return results, init_s, time.perf_counter() - t_serve

    results, init_s, serve_wall = asyncio.run(drive())
    wall = time.perf_counter() - t0

    ok = True
    total_audio_s = 0.0
    for i, (frames, first_audio, client_wall) in enumerate(results):
        audio = [f for f in frames if isinstance(f, svc.TTSAudioRawFrame)]
        errs = [f for f in frames if isinstance(f, svc.ErrorFrame)]
        started = isinstance(frames[0], svc.TTSStartedFrame)
        stopped = isinstance(frames[-1], svc.TTSStoppedFrame)
        n_samples = sum(len(f.audio) // 2 for f in audio)
        secs = n_samples / 24000.0
        total_audio_s += secs
        ok &= started and stopped and not errs and len(audio) >= 1
        print(f"client {i}: frames={len(frames)} audio_chunks={len(audio)} "
              f"audio_s={secs:.2f} first_audio_ms="
              f"{(first_audio or 0) * 1e3:.1f} wall_s={client_wall:.2f} "
              f"started={started} stopped={stopped} errors={len(errs)}")

    batcher = first._shared.batcher
    assert all(s._shared.batcher is batcher for s in services)
    print(f"shared batcher: {type(batcher).__name__} slots={args.slots} "
          f"one engine for {args.clients} clients")
    agg = total_audio_s / serve_wall if serve_wall > 0 else 0.0
    print(f"total: audio_s={total_audio_s:.2f} serve_wall_s={serve_wall:.2f} "
          f"({agg:.1f}x realtime aggregate) init_warm_s={init_s:.1f} "
          f"wall_s={wall:.1f} -> {'PASS' if ok else 'FAIL'}")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
