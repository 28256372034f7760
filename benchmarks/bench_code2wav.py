#!/usr/bin/env python3
"""Code2Wav vocoder throughput: reference (NCH conv) vs packed (matmul) form.

Measures per-window decode latency and the implied vocoder-only RTF for
the engine's two code2wav shapes (the non-streaming window and the
streaming chunk), plus optional stage-level timings that show where the
time goes (transformer vs upsample vs BigVGAN decoder stack).

Methodology per docs/02-performance.md: honest host-transfer sync
(utils/timing.sync), warmup dispatch before timing, medians over repeats.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.utils.timing import sync
from qwen_tts_tpu.vocoder.code2wav import (
    Code2WavConfig,
    code2wav_apply,
    init_code2wav_weights,
)
from qwen_tts_tpu.vocoder.code2wav_fast import (
    code2wav_apply_packed,
    pack_code2wav_weights,
)


def time_fn(fn, *args, repeats=5):
    sync(fn(*args))  # warmup/compile
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_rtt(repeats=10):
    """Per-dispatch floor: a trivial jitted op, honest-synced. Every timed
    call below carries ~one of these (tunnel round trip + dispatch)."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    sync(f(x))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def stage_times(cfg, pw, codes, repeats):
    """Time the packed forward stage by stage (each stage jitted alone;
    inputs realised on device first so each timing is one stage + RTT)."""
    from qwen_tts_tpu.vocoder import code2wav_fast as cf

    dt = pw.embed.dtype

    def embed_tf(pw, codes):
        offset = (jnp.arange(cfg.num_quantizers, dtype=codes.dtype)
                  * cfg.codebook_size)[None, :, None]
        h = jnp.take(pw.embed, codes + offset, axis=0)
        h = jnp.mean(h.astype(jnp.float32), axis=1).astype(dt)
        return cf._transformer(cfg, pw, h)

    def upsample(pw, h):
        for stage in pw.upsample:
            h = cf._mm_tconv(h, stage.up).astype(dt)
            h = cf._convnext(h, stage.convnext)
        return cf._mm_conv(h, pw.dec_pre).astype(dt)

    def block(i):
        def f(pw, h):
            blk = pw.dec_blocks[i]
            h = cf._snake(h, blk.alpha, blk.beta, dt)
            h = cf._mm_tconv(h, blk.up).astype(dt)
            for unit in blk.units:
                r = cf._snake(h, unit.alpha1, unit.beta1, dt)
                r = cf._mm_conv(r, unit.conv1).astype(dt)
                r = cf._snake(r, unit.alpha2, unit.beta2, dt)
                r = cf._mm_conv(r, unit.conv2).astype(dt)
                h = h + r
            return h
        return f

    def post(pw, h):
        h = cf._snake(h, pw.dec_alpha, pw.dec_beta, dt)
        return jnp.clip(cf._mm_conv(h, pw.dec_post)[..., 0], -1.0, 1.0)

    stages = [("embed+transformer", embed_tf), ("upsample+pre", upsample)]
    stages += [(f"dec_block[{i}] r={r}", block(i))
               for i, r in enumerate(cfg.upsample_rates)]
    stages.append(("snake+post", post))

    h = codes
    for name, fn in stages:
        jf = jax.jit(fn)
        # time a scalar-reduced form: sync() transfers the output to host,
        # and stage intermediates are up to ~10^8 elements — reducing on
        # device keeps the measurement compute+RTT, not tunnel bandwidth
        jt = jax.jit(lambda pw, h, fn=fn: jnp.sum(
            fn(pw, h).astype(jnp.float32)))
        t = time_fn(jt, pw, h, repeats=repeats)
        print(f"  {name:20s} {t*1e3:7.2f} ms   in-shape {tuple(h.shape)}")
        h = jf(pw, h)


def stage_times_xn(cfg, pw, codes, repeats, n=8):
    """Per-stage cost BELOW the dispatch floor: run each stage N times
    inside ONE dispatch on N slightly-perturbed inputs (defeats CSE) and
    report (wall - floor)/N. The tunnel dispatch floor (~27 ms) otherwise
    hides stage costs of 1-5 ms entirely (docs/05 insight #15)."""
    from qwen_tts_tpu.vocoder import code2wav_fast as cf

    dt = pw.embed.dtype
    floor = measure_rtt()

    def embed_tf(pw, codes):
        offset = (jnp.arange(cfg.num_quantizers, dtype=codes.dtype)
                  * cfg.codebook_size)[None, :, None]
        h = jnp.take(pw.embed, codes + offset, axis=0)
        h = jnp.mean(h.astype(jnp.float32), axis=1).astype(dt)
        return cf._transformer(cfg, pw, h)

    def upsample(pw, h):
        for stage in pw.upsample:
            h = cf._mm_tconv(h, stage.up).astype(dt)
            h = cf._convnext(h, stage.convnext)
        return cf._mm_conv(h, pw.dec_pre).astype(dt)

    def block(i):
        def f(pw, h):
            blk = pw.dec_blocks[i]
            h = cf._snake(h, blk.alpha, blk.beta, dt)
            h = cf._mm_tconv(h, blk.up).astype(dt)
            for unit in blk.units:
                r = cf._snake(h, unit.alpha1, unit.beta1, dt)
                r = cf._mm_conv(r, unit.conv1).astype(dt)
                r = cf._snake(r, unit.alpha2, unit.beta2, dt)
                r = cf._mm_conv(r, unit.conv2).astype(dt)
                h = h + r
            return h
        return f

    def post(pw, h):
        h = cf._snake(h, pw.dec_alpha, pw.dec_beta, dt)
        return jnp.clip(cf._mm_conv(h, pw.dec_post)[..., 0], -1.0, 1.0)

    stages = [("embed+transformer", embed_tf), ("upsample+pre", upsample)]
    stages += [(f"dec_block[{i}] r={r}", block(i))
               for i, r in enumerate(cfg.upsample_rates)]
    stages.append(("snake+post", post))

    h = codes
    print(f"  (dispatch floor {floor*1e3:.1f} ms, N={n} repeats/dispatch)")
    for name, fn in stages:
        jf = jax.jit(fn)
        if h.dtype == jnp.int32:
            def xn(pw, h, fn=fn):
                acc = jnp.float32(0)
                for i in range(n):
                    acc += jnp.sum(fn(pw, (h + i) % cfg.codebook_size)
                                   .astype(jnp.float32))
                return acc
        else:
            def xn(pw, h, fn=fn):
                acc = jnp.float32(0)
                for i in range(n):
                    acc += jnp.sum(fn(pw, h * (1.0 + 1e-3 * i).__float__())
                                   .astype(jnp.float32))
                return acc
        t = time_fn(jax.jit(xn), pw, h, repeats=repeats)
        per = max(t - floor, 0.0) / n
        print(f"  {name:20s} {per*1e3:7.2f} ms/stage   in-shape {tuple(h.shape)}")
        h = jf(pw, h)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=185,
                   help="window frames incl. context (engine: 160+25)")
    p.add_argument("--chunk-frames", type=int, default=35,
                   help="streaming chunk incl. context (engine: 10+25)")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--skip-reference", action="store_true")
    p.add_argument("--stages", action="store_true",
                   help="also time the packed forward stage by stage")
    p.add_argument("--stages-xn", action="store_true",
                   help="stage timings via N-fold in-dispatch repeat "
                        "(resolves stage costs below the dispatch floor)")
    args = p.parse_args()

    cfg = Code2WavConfig()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    w = init_code2wav_weights(jax.random.PRNGKey(0), cfg)
    wd = jax.tree.map(lambda x: x.astype(dt), w)
    pw = pack_code2wav_weights(cfg, w, dtype=dt)

    ref = jax.jit(functools.partial(code2wav_apply, cfg))
    fast = jax.jit(functools.partial(code2wav_apply_packed, cfg))

    rtt = measure_rtt()
    print(f"[rtt] per-dispatch floor {rtt*1e3:.1f} ms "
          f"(subtract from every timing below)")

    if args.stages:
        codes = jax.random.randint(
            jax.random.PRNGKey(1), (1, cfg.num_quantizers, args.frames), 0,
            cfg.codebook_size, jnp.int32)
        print(f"[stages T={args.frames}] packed {args.dtype}:")
        stage_times(cfg, pw, codes, args.repeats)

    if args.stages_xn:
        codes = jax.random.randint(
            jax.random.PRNGKey(1), (1, cfg.num_quantizers, args.frames), 0,
            cfg.codebook_size, jnp.int32)
        print(f"[stages-xn T={args.frames}] packed {args.dtype}:")
        stage_times_xn(cfg, pw, codes, args.repeats)

    for label, t in [("window", args.frames), ("chunk", args.chunk_frames)]:
        codes = jax.random.randint(
            jax.random.PRNGKey(1), (1, cfg.num_quantizers, t), 0,
            cfg.codebook_size, jnp.int32)
        audio_s = cfg.output_samples(t) / cfg.sample_rate
        if not args.skip_reference:
            tr = time_fn(ref, wd, codes, repeats=args.repeats)
            print(f"[{label} T={t}] reference {args.dtype}: "
                  f"{tr*1e3:.1f} ms  RTF {tr/audio_s:.4f}")
        tp = time_fn(fast, pw, codes, repeats=args.repeats)
        print(f"[{label} T={t}] packed    {args.dtype}: "
              f"{tp*1e3:.1f} ms  RTF {tp/audio_s:.4f}")


if __name__ == "__main__":
    main()
