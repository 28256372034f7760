"""Readback-cost anatomy on the tunneled TPU link.

Hypothesis (round-4 streaming work): the steady-state streaming chunk wall
(47-62 ms observed vs ~30 ms compute + ~26 ms RTT) is dominated by the
per-chunk host readback `jax.device_get((codes, valid, audio))` paying one
tunnel round trip PER ARRAY, not by device compute. If true, packing the
three chunk outputs into ONE device array (bitcast int32 codes/valid into
the f32 audio buffer's tail) should collapse the readback to a single RTT
and shave ~0.01-0.02 off streaming RTF.

This experiment measures, warm, on the real link:
  1x  device_get of a single [N] f32 array            (1 RTT floor)
  3x  device_get of a (codes, valid, audio) pytree    (the current shape)
  1x  device_get of the PACKED equivalent + host split
  3x  sequential np.asarray calls                     (upper bound)

Run solo (single-tenant TPU): python benchmarks/exp_readback.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, runs):
    # honest sync: np.asarray IS the operation under test here, so plain
    # wall clock around it is the right measurement (utils/timing.py rules)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), float(np.min(ts))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=10, help="frames per chunk")
    p.add_argument("--hop", type=int, default=480)
    p.add_argument("--groups", type=int, default=16)
    p.add_argument("--runs", type=int, default=30)
    args = p.parse_args()

    n, hop, g = args.chunk, args.hop, args.groups

    # JAX caches the host copy of a transferred array, so every timed
    # iteration must read FRESH device arrays: a trivial jit fn keyed by a
    # changing scalar produces new buffers (~μs of compute) each run.
    @jax.jit
    def make(i):
        codes = jnp.full((n, g), i, jnp.int32)
        valid = jnp.ones((n,), jnp.bool_)
        audio = jnp.full((n * hop,), jnp.float32(i))
        return codes, valid, audio

    @jax.jit
    def make_packed(i):
        codes, valid, audio = make(i)
        tail = jax.lax.bitcast_convert_type(
            jnp.concatenate([codes.reshape(-1), valid.astype(jnp.int32)]),
            jnp.float32)
        return jnp.concatenate([audio, tail])

    def unpack(buf):
        a = buf[: n * hop]
        tail = buf[n * hop:].view(np.int32)
        c = tail[: n * g].reshape(n, g)
        v = tail[n * g:]
        return c, v, a

    # RTT probe + warmup of every path
    x = jnp.ones((8, 128))
    np.asarray(x)
    rtt, _ = _timed(lambda: np.asarray(x + 1.0), 10)
    jax.device_get(make(0))
    np.asarray(make_packed(0))

    k = [1]

    def fresh():
        k[0] += 1
        return k[0]

    m_single, lo_single = _timed(
        lambda: np.asarray(make(fresh())[2]), args.runs)
    m_tree, lo_tree = _timed(
        lambda: jax.device_get(make(fresh())), args.runs)
    m_seq, _ = _timed(
        lambda: [np.asarray(a) for a in make(fresh())], args.runs)
    m_packed, lo_packed = _timed(
        lambda: unpack(np.asarray(make_packed(fresh()))), args.runs)

    print(f"tunnel RTT (8x128 add):        {rtt:7.2f} ms")
    print(f"single fresh [N={n*hop}] f32:  {m_single:7.2f} ms (min {lo_single:.2f})")
    print(f"device_get fresh 3-tuple:      {m_tree:7.2f} ms (min {lo_tree:.2f})")
    print(f"3x sequential np.asarray:      {m_seq:7.2f} ms")
    print(f"packed single + host unpack:   {m_packed:7.2f} ms (min {lo_packed:.2f})")
    save = m_tree - m_packed
    print(f"=> packing saves {save:.2f} ms/chunk "
          f"({'WORTH IT' if save > 5 else 'not worth it'} at 10-frame chunks: "
          f"{save / (n * 0.08):.4f} RTF)")


if __name__ == "__main__":
    main()
