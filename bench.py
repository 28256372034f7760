#!/usr/bin/env python3
"""Headline benchmarks, driver-readable: one JSON line per metric.

CONTRACT (learned from rounds 1-2): the driver runs a bare `python bench.py`
under a `timeout` and parses the LAST JSON line printed. Round 2's default
front-loaded a multi-minute engine compile and was killed before one metric
line landed (BENCH_r02.json rc=124). So the default mode now:

  0. probes the device in a SUBPROCESS with bounded retries (≤ budget/3),
     emitting a `tunnel_down` JSON line per failed attempt — a tunnel
     outage (round 3, BENCH_r03.json rc=1) leaves evidence, not a crash,
  1. emits `tunnel_rtt_ms` immediately (host↔device weather — TTFC numbers
     are uninterpretable without it),
  2. runs the best QUALITY-GATE-PASSING tok/s config first (int8+kv8) and
     emits its line (valid headline on disk within one kernel compile,
     ~2 min); int4+kv8 follows as the explicit throughput-mode row,
  3. spends whatever remains of `--budget` on richer metrics (second tok/s
     backend, engine TTFC/RTF), each emitted when measured. The budget
     clock starts when the tunnel probe SUCCEEDS, not at process start —
     round 4's driver capture carried only the headline because a ~305 s
     tunnel-re-init wait was charged against the budget and starved every
     optional phase,
  4. re-emits the best tok/s line after EVERY later metric (and once more
     LAST) so the driver's parsed line — the last one — is always the
     headline no matter where a kill lands mid-phase
     (tests/test_bench_resilience.py).

Methodology matches the reference benchmarks:
- TTFC = wall time from `synthesize_streaming(text)` to the first audio
  chunk on warm compiled paths (reference: benchmarks/measure_ttfc.py:22-99,
  README.md:10 — 81.6 ms streaming baseline).
- RTF = best wall / generated-audio-duration over the public API
  (reference: benchmarks/measure_rtf.py:126-153 — 0.177 / 0.234 baselines).
- tok/s = N timed decode steps as ONE megakernel dispatch with on-device
  token feedback (the generate_nosync equivalent, reference:
  csrc/kernel.cu:1555-1613, benchmarks/measure_tok_s.py:18-75 — ~1,000
  tok/s baseline), warmup excluded.
Sync discipline: every timing ends in a host transfer (`np.asarray`) —
`jax.block_until_ready` returns early on this tunneled platform.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

T_START = time.perf_counter()

# budget clock: starts at process start, RESET to the moment the tunnel
# probe succeeds (round-4 driver capture carried exactly ONE metric because
# a ~305 s probe wait was charged against --budget; the wait is tunnel
# weather, not bench spending)
B_START = T_START

# once the headline tok/s is measured, every later emit() is followed by a
# re-emit of the headline line, so the driver (which parses the LAST JSON
# line) gets the headline even if it kills the bench mid-phase — round 4's
# layout would have parsed `ttfc_ms` after a kill inside bench_engine
_HEADLINE: list = []


def elapsed() -> float:
    return time.perf_counter() - T_START


def budget_spent() -> float:
    return time.perf_counter() - B_START


def emit(metric, value, unit, vs_baseline, *, _reemit=True):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 3 if value < 10 else 1),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 3),
    }), flush=True)
    if _reemit and _HEADLINE and metric != _HEADLINE[0][0]:
        m, v = _HEADLINE[0]
        emit(m, v, "tok/s", v / 1000.0, _reemit=False)


def measure_rtt() -> float:
    """Median host↔device round trip (ms): upload 1 scalar, read it back."""
    times = []
    x = jnp.zeros((8, 128), jnp.float32)  # tiny, tile-aligned
    f = jax.jit(lambda a: a + 1.0)
    np.asarray(f(x))                      # compile outside the timing
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(jnp.asarray(np.zeros((8, 128), np.float32))))
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1000.0)


def device_up_or_retry(budget: float) -> float | None:
    """First device touch, hardened against a tunnel outage.

    Round 3 died on the first `jax.devices()` touch (BENCH_r03.json rc=1,
    zero metric lines) when the TPU tunnel went down — indistinguishable
    from a broken bench. The probe runs in a SUBPROCESS: a dead tunnel can
    hang a device touch for >10 min (observed during the 2026-08-17
    outage), so an in-process call could hang the whole bench.

    CRUCIALLY (round-4 rehearsal failure): the first device touch after a
    previous TPU process exits stalls MINUTES on tunnel re-init (measured
    77 s – ~5 min) — normal weather, not an outage, and exactly the state
    the driver's round-end run starts from. Kill-and-retry is wrong for
    that regime: each fresh probe restarts init from scratch and never
    accumulates progress. So: ONE patient probe, polled in short slices,
    a `tunnel_probe_wait` evidence line each minute, patience sized to the
    re-init envelope independent of --budget — a late headline
    beats a null round; the budget gate only skips optional phases. A
    probe that EXITS (crash, not hang) is retried with backoff.

    Patience history: 480 s (round 4) was exceeded once in round 5 — a
    re-init stall after a long quantized-compile process resolved between
    480 and ~780 s. 900 s covers that envelope with margin.
    """
    import subprocess

    patience = 900.0
    code = ("import jax, jax.numpy as jnp, numpy as np;"
            "np.asarray(jnp.zeros((8,128))+1.0);print('UP')")
    last_note = 0.0
    proc = None
    while elapsed() < patience:
        if proc is None:
            proc = subprocess.Popen(
                [sys.executable, "-c", code], text=True,
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
        try:
            out, _ = proc.communicate(timeout=15.0)
        except subprocess.TimeoutExpired:
            if elapsed() - last_note >= 60.0:   # heartbeat: evidence that
                last_note = elapsed()           # the bench is alive+waiting
                emit("tunnel_probe_wait", round(elapsed(), 1), "s", 0.0)
            continue
        if proc.returncode == 0 and "UP" in (out or ""):
            return measure_rtt()   # in-process: tunnel is live now
        proc = None                # probe crashed (didn't hang): back off
        emit("tunnel_down", 1.0, "attempts", 0.0)
        time.sleep(min(20.0, max(0.0, patience - elapsed())))
    if proc is not None:
        proc.kill()
    emit("tunnel_down", -1.0, "attempts", 0.0)
    return None


_SUFFIX = {"megagen-int8": "_int8_weights",
           "megagen-int4": "_int4_weights",
           "megagen-mixed": "_mixed_weights",
           "megagen-int8-kv8": "_int8_weights_kv8",
           "megagen-int4-kv8": "_int4_weights_kv8",
           "megagen-mixed-kv8": "_mixed_weights_kv8"}


def bench_tok_s(args, backend: str):
    """One generate-megakernel backend; returns (metric, value) and emits."""
    from qwen_tts_tpu.core.config import CODEC_BOS, DecoderConfig
    from qwen_tts_tpu.core.weights import init_decoder_weights
    from qwen_tts_tpu.models.decoder import init_state
    from qwen_tts_tpu.runtime.generate import generate_tokens

    cfg = DecoderConfig(max_seq_len=args.max_seq)
    w = init_decoder_weights(jax.random.PRNGKey(0), cfg)

    if backend.startswith("megagen"):
        from qwen_tts_tpu.ops.generate_kernel import generate_megakernel

        gen_w = w
        base = backend.removesuffix("-kv8")
        kv_dtype = jnp.int8 if backend.endswith("-kv8") else jnp.bfloat16
        if base == "megagen-int8":
            from qwen_tts_tpu.core.weights import quantize_decoder_weights

            gen_w = quantize_decoder_weights(w)
        elif base == "megagen-int4":
            from qwen_tts_tpu.core.weights import quantize_decoder_weights_int4

            gen_w = quantize_decoder_weights_int4(w)
        elif base == "megagen-mixed":
            from qwen_tts_tpu.core.weights import quantize_decoder_weights_mixed

            gen_w = quantize_decoder_weights_mixed(w)

        def run():
            state = init_state(cfg, kv_dtype)
            state, tokens = generate_megakernel(
                cfg, gen_w, state, jnp.int32(CODEC_BOS), args.steps)
            # host transfer = the only honest sync on this platform
            return np.asarray(tokens)
    else:
        def run():
            state = init_state(cfg)
            state, tokens = generate_tokens(
                cfg, w, state, jnp.int32(CODEC_BOS), args.steps,
                attn_impl=backend)
            return np.asarray(tokens)

    for _ in range(args.warmup):
        run()
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)

    tok_s = args.steps / best
    metric = "talker_decode_tok_s" + _SUFFIX.get(backend, "")
    emit(metric, tok_s, "tok/s", tok_s / 1000.0)
    return metric, tok_s


def bench_engine(args):
    """TTFC + RTF through the public engine API (warm paths)."""
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    quant = False if args.quantize in (None, "none") else args.quantize
    eng = TTSEngine(TTSConfig(max_seq_len=args.engine_max_seq,
                              quantize=quant,
                              kv_cache="int8" if args.kv8 else "bf16"))
    eng.initialize()

    short = "The quick brown fox jumps over the lazy dog."
    longer = ("This is a longer passage used to measure the sustained real "
              "time factor of the decoder over many frames of speech audio.")

    async def ttfc_once(text):
        t0 = time.perf_counter()
        agen = eng.synthesize_streaming(text)
        async for _audio, _sr in agen:
            dt = time.perf_counter() - t0
            await agen.aclose()
            return dt
        return float("inf")

    async def stream_all(text):
        t0 = time.perf_counter()
        total = 0
        arrivals = []
        async for audio, _sr in eng.synthesize_streaming(text):
            arrivals.append(time.perf_counter() - t0)
            total += len(audio)
        return (arrivals[-1] if arrivals else 0.0), total, arrivals

    from qwen_tts_tpu.utils.timing import drain_device

    # RTT again, right next to TTFC: the tunnel weather drifts over minutes
    # and TTFC carries ~2×RTT (upload + readback)
    emit("tunnel_rtt_ms", measure_rtt(), "ms", 1.0)

    # warm each signature (trailing buckets) once before timing; drain the
    # device queue between runs — an aclose()d stream leaves a speculative
    # chunk in flight that would otherwise delay the next run's dispatch
    asyncio.run(ttfc_once(short))
    rtt_at_ttfc = measure_rtt()
    best_ttfc = float("inf")
    for _ in range(args.runs):
        drain_device()
        best_ttfc = min(best_ttfc, asyncio.run(ttfc_once(short)))
    emit("ttfc_ms", best_ttfc * 1000, "ms", 81.6 / (best_ttfc * 1000))
    # the tunnel-independent number: ~1×RTT of the TTFC is serial tunnel
    # time (the text upload overlaps the async dispatch enqueue; the first
    # audio readback is the serial round trip); subtracting isolates
    # on-device latency so TTFC is comparable across tunnel weather
    kernel_ttfc = max(best_ttfc * 1000 - rtt_at_ttfc, 0.0)
    emit("ttfc_kernel_ms", kernel_ttfc, "ms",
         81.6 / kernel_ttfc if kernel_ttfc > 0 else 0.0)

    eng.synthesize(longer)  # warm
    best_ns, best_samples = float("inf"), 0
    for _ in range(args.runs):
        t0 = time.perf_counter()
        wav, sr = eng.synthesize(longer)
        dt = time.perf_counter() - t0
        if dt < best_ns:   # pair wall time with ITS OWN waveform length
            best_ns, best_samples = dt, len(wav)
    rtf_ns = best_ns / (best_samples / sr)
    emit("rtf_nonstreaming", rtf_ns, "ratio", 0.177 / rtf_ns)

    asyncio.run(stream_all(longer))  # warm
    best_s, samples, best_arrivals = float("inf"), 0, []
    for _ in range(args.runs):
        wall, total, arrivals = asyncio.run(stream_all(longer))
        if wall < best_s:
            best_s, samples, best_arrivals = wall, total, arrivals
    rtf_s = best_s / (samples / eng.sample_rate)
    emit("rtf_streaming", rtf_s, "ratio", 0.234 / rtf_s)
    # steady-state inter-chunk wall (skip TTFC + the terminal partial):
    # the depth-2 pipeline probe — should sit at ~chunk compute, with the
    # readback RTT hidden under the next chunk's compute. vs_baseline =
    # ×-realtime of steady chunk production (0.8 s audio per 10-frame chunk)
    gaps = sorted(b - a for a, b in zip(best_arrivals[1:-1],
                                        best_arrivals[2:]))
    if gaps:
        wall_ms = gaps[len(gaps) // 2] * 1000
        chunk_audio_ms = (eng.config.chunk_frames
                          * eng.vocoder_config.hop_length
                          / eng.sample_rate * 1000)
        emit("stream_chunk_wall_ms", wall_ms, "ms", chunk_audio_ms / wall_ms)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="full", choices=["full", "tok", "engine"])
    p.add_argument("--steps", type=int, default=1024)
    p.add_argument("--max-seq", type=int, default=8192)
    p.add_argument("--engine-max-seq", type=int, default=2048)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--quantize", default="none",
                   choices=["none", "int8", "int4", "mixed"],
                   help="engine weight quantization tier (serving path)")
    p.add_argument("--kv8", action="store_true",
                   help="engine int8 KV cache (serving path)")
    p.add_argument("--budget", type=float, default=540.0,
                   help="soft wall-clock budget (s) for the full mode, "
                        "counted from tunnel-up; optional phases are "
                        "skipped when the remaining budget can't cover "
                        "their cost estimate. 540 fits headline + mixed + "
                        "engine (TTFC/RTF) in ~9 min after the probe — "
                        "safe now that the headline is re-emitted after "
                        "every metric, so even a driver kill mid-phase "
                        "still parses the headline (round 2's rc=124 "
                        "hazard). Richer runs: --budget 900")
    p.add_argument("--backend", default="megagen-int8-kv8",
                   choices=["megagen", "megagen-int8", "megagen-int4",
                            "megagen-mixed", "megagen-int8-kv8",
                            "megagen-int4-kv8", "megagen-mixed-kv8",
                            "mega", "pallas", "dense"],
                   help="headline backend. Default is the best config that "
                        "PASSES the validate_kernel quality gate (int8+kv8: "
                        "96.9%% token match / cos 0.9990); int4-kv8 is "
                        "faster but below tier on gaussian random weights "
                        "and is emitted as the throughput-mode row instead")
    args = p.parse_args()

    if args.mode == "tok":
        bench_tok_s(args, args.backend)
        return
    if args.mode == "engine":
        bench_engine(args)
        return

    # ── full mode: cheap-but-valid first, richer after, headline LAST ──
    global B_START
    rtt = device_up_or_retry(args.budget)
    if rtt is None:              # outage: leave evidence, not an rc=1
        emit("tunnel_down", -1.0, "attempts", 0.0)
        return
    B_START = time.perf_counter()   # probe wait is weather, not spending
    emit("tunnel_rtt_ms", rtt, "ms", 1.0)

    headline = None
    ran = set()
    for backend in (args.backend, "megagen-int8"):
        if backend in ran:
            continue
        try:
            headline = bench_tok_s(args, backend)
            ran.add(backend)
            break
        except Exception as e:   # fall back rather than die headline-less
            ran.add(backend)
            print(f"tok bench {backend} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    phase1 = budget_spent()      # ≈ compile + runs of one backend
    if headline is not None:     # every later emit re-emits this line after
        _HEADLINE[:] = [headline]

    # throughput-mode row: mixed+kv8 (int8 attn + int4 MLP) is the fastest
    # config — 2,034.5 tok/s r4, dominating int4+kv8 on speed AND fidelity
    # (cos .946 vs .825) — but still below the random-weights quality gate,
    # so it is reported as its own metric, never as the headline
    if (headline is not None and "megagen-mixed-kv8" not in ran
            and budget_spent() + phase1 < args.budget):
        try:
            bench_tok_s(args, "megagen-mixed-kv8")
            ran.add("megagen-mixed-kv8")
        except Exception as e:
            print(f"tok bench megagen-mixed-kv8 failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)

    # engine init compiles the fused cold/chunk paths (~3-4 min cold)
    if budget_spent() + 240.0 < args.budget:
        try:
            bench_engine(args)
        except Exception as e:
            print(f"engine bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    if headline is not None:     # the driver parses the LAST line
        emit(headline[0], headline[1], "tok/s", headline[1] / 1000.0,
             _reemit=False)


if __name__ == "__main__":
    main()
