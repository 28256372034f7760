#!/usr/bin/env python3
"""Can batched serving ride the Pallas megakernel? vmap(frames_chunk) A/B.

The single-stream engine's per-frame step uses the single-step Pallas
megakernel on TPU (~1.07 ms/step vs ~2.0 ms for the XLA dense scan —
CLAUDE.md perf ledger), but the batched runtime (`runtime/batch.py`, the
continuous batcher's chunk fn) has always vmapped the DENSE path. Measured
round 5: a B=8 x 10-frame dense chunk walls ~220 ms (~2.75 ms/frame/slot).
jax.vmap of a pallas_call lowers the batch axis to an outer grid dimension,
so the megakernel *should* batch — interpret-mode CPU check agrees exactly
with dense (tokens + hidden cos 1.0).

This experiment times vmapped frames_chunk with attn_impl in
{dense, mega} at full model size on the TPU and prints per-frame-per-slot
milliseconds. If mega wins, thread attn_impl through batched_frames and
the batcher.

Usage:  python benchmarks/exp_batched_mega.py [--batch 8] [--frames 10]
        [--chunks 8] [--max-seq 2048] [--impls dense,mega]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--chunks", type=int, default=8,
                    help="timed chunk dispatches (enqueued back-to-back, "
                         "one readback — amortizes the tunnel RTT)")
    ap.add_argument("--max-seq", type=int, default=2048)
    ap.add_argument("--impls", default="dense,mega")
    ap.add_argument("--scaling", action="store_true",
                    help="dense-path scaling diagnostic: sweep (B, S) in "
                         "one process to attribute the chunk wall to "
                         "weight reads (flat in B), per-slot activations "
                         "(linear in B), or cache copies (linear in S)")
    args = ap.parse_args()
    if args.scaling:
        return scaling_diagnostic(args)

    from qwen_tts_tpu.core.config import TTSModelConfig
    from qwen_tts_tpu.core.weights import init_tts_weights
    from qwen_tts_tpu.runtime.batch import batched_prefill
    from qwen_tts_tpu.runtime.frame_loop import frames_chunk

    import dataclasses

    mc = TTSModelConfig()
    mc = dataclasses.replace(
        mc, talker=dataclasses.replace(mc.talker,
                                       max_seq_len=args.max_seq))
    w = init_tts_weights(jax.random.PRNGKey(0), mc)
    B, N, H = args.batch, args.frames, mc.talker.hidden_size

    prefill_e = jax.random.normal(jax.random.PRNGKey(1), (B, 8, H),
                                  dtype=jnp.bfloat16)
    trailing = jax.random.normal(jax.random.PRNGKey(2), (B, 16, H),
                                 dtype=jnp.bfloat16)
    tlen = jnp.full((B,), 16, jnp.int32)
    pad = jnp.zeros((H,), jnp.bfloat16)
    rngs = jax.random.split(jax.random.PRNGKey(3), B)

    for impl in args.impls.split(","):
        import functools

        # weights/trailing/rngs are jit ARGUMENTS — closed-over big arrays
        # become XLA constants, which wedges compilation on this platform
        # (CLAUDE.md conventions; self-inflicted relay broken-pipe here
        # before this fix)
        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames=("impl",))
        def chunk(st, tok, hid, tw, cw, trail_a, tlen_a, pad_a, rngs_a,
                  tidx0, impl="dense"):
            def one(s, t, h, trail, tl, ti, key):
                return frames_chunk(
                    mc.talker, mc.code_predictor, tw, cw,
                    s, t, h, trail, tl, ti, pad_a, key,
                    num_frames=N, do_sample=True, attn_impl=impl)

            st, codes, valid, tok, hid = jax.vmap(one)(
                st, tok, hid, trail_a, tlen_a,
                jnp.full((B,), tidx0, jnp.int32), rngs_a)
            return st, codes, valid, tok, hid

        chunk = functools.partial(
            chunk, tw=w.talker, cw=w.code_predictor, trail_a=trailing,
            tlen_a=tlen, pad_a=pad, rngs_a=rngs, impl=impl)

        def chunk(st, tok, hid, tidx0, _c=chunk):
            return _c(st, tok, hid, tidx0=tidx0)

        try:
            st, tok, hid = batched_prefill(mc.talker, w.talker, prefill_e)
            t0 = time.perf_counter()
            st, codes, valid, tok, hid = chunk(st, tok, hid, 0)
            np.asarray(tok)
            compile_s = time.perf_counter() - t0

            # warm run then K enqueued chunks, one readback at the end
            st, codes, valid, tok, hid = chunk(st, tok, hid, N)
            np.asarray(tok)
            t0 = time.perf_counter()
            base = 2 * N
            for k in range(args.chunks):
                st, codes, valid, tok, hid = chunk(st, tok, hid,
                                                   base + k * N)
            np.asarray(tok)
            dt = time.perf_counter() - t0
            per_frame_slot = dt / (args.chunks * N * B) * 1000
            print(f"{impl}: {dt / args.chunks * 1000:.1f} ms/chunk "
                  f"(B={B}, {N} frames) = {per_frame_slot:.3f} "
                  f"ms/frame/slot  [compile+first {compile_s:.1f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — record lowering failures
            print(f"{impl}: FAILED {type(e).__name__}: {e}", flush=True)


def scaling_diagnostic(args):
    """Time the vmapped dense chunk at several (B, max_seq) points.

    Reading the slopes: the bandwidth floor per frame is ~3.2 GB of weight
    reads (874 MB talker + 15 CP steps x ~156 MB), shared across slots —
    if ms/chunk is flat in B the path is weight-bound (batching ~free); a
    linear-in-B term is per-slot activation/sampling work; a linear-in-S
    term is full-cache traffic (reads or scan-carry copies)."""
    import dataclasses
    import functools

    from qwen_tts_tpu.core.config import TTSModelConfig
    from qwen_tts_tpu.core.weights import init_tts_weights
    from qwen_tts_tpu.runtime.batch import batched_prefill
    from qwen_tts_tpu.runtime.frame_loop import frames_chunk

    N = args.frames
    for B, S in [(1, 1024), (2, 1024), (8, 1024), (8, 256)]:
        mc = TTSModelConfig()
        mc = dataclasses.replace(
            mc, talker=dataclasses.replace(mc.talker, max_seq_len=S))
        w = init_tts_weights(jax.random.PRNGKey(0), mc)
        H = mc.talker.hidden_size
        prefill_e = jax.random.normal(jax.random.PRNGKey(1), (B, 8, H),
                                      dtype=jnp.bfloat16)
        trailing = jax.random.normal(jax.random.PRNGKey(2), (B, 16, H),
                                     dtype=jnp.bfloat16)
        tlen = jnp.full((B,), 16, jnp.int32)
        pad = jnp.zeros((H,), jnp.bfloat16)
        rngs = jax.random.split(jax.random.PRNGKey(3), B)

        # weights etc. as jit ARGUMENTS (closure constants wedge compiles)
        @functools.partial(jax.jit, donate_argnums=(0,))
        def chunk_impl(st, tok, hid, tw, cw, trail_a, tlen_a, pad_a,
                       rngs_a, tidx0, mc=mc, B=B):
            def one(s, t, h, trail, tl, ti, key):
                return frames_chunk(
                    mc.talker, mc.code_predictor, tw, cw,
                    s, t, h, trail, tl, ti, pad_a, key,
                    num_frames=N, do_sample=True, attn_impl="dense")

            return jax.vmap(one)(st, tok, hid, trail_a, tlen_a,
                                 jnp.full((B,), tidx0, jnp.int32), rngs_a)

        def chunk(st, tok, hid, tidx0, _w=w, _t=trailing, _tl=tlen,
                  _p=pad, _r=rngs):
            return chunk_impl(st, tok, hid, _w.talker, _w.code_predictor,
                              _t, _tl, _p, _r, tidx0)

        try:
            st, tok, hid = batched_prefill(mc.talker, w.talker, prefill_e)
            st, codes, valid, tok, hid = chunk(st, tok, hid, 0)
            np.asarray(tok)                       # compile + first run
            t0 = time.perf_counter()
            for k in range(args.chunks):
                st, codes, valid, tok, hid = chunk(st, tok, hid,
                                                   (1 + k) * N)
            np.asarray(tok)
            dt = time.perf_counter() - t0
            print(f"B={B} S={S}: {dt / args.chunks * 1000:.1f} ms/chunk "
                  f"({dt / (args.chunks * N) * 1000:.2f} ms/frame)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B={B} S={S}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
