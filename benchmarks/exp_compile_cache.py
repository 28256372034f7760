#!/usr/bin/env python3
"""Probe: is the JAX persistent compilation cache a win on this platform?

Reproducible form of the docs/05 insight #17 measurement (round 5, axon
tunnel, RTT ~25 ms):

  cold compile+execute (no cache dir)      ~63 s
  cache POPULATE (cache dir, empty)        ~3x the cold compile
  cache HIT (cache dir, warm entry)        ~391 s   ← 6x SLOWER than cold

i.e. the persistent cache is an ANTI-optimization here: executable
(de)serialization appears to round-trip through the remote-compile relay
pathologically. On directly-attached TPU hardware the cache is expected to
behave normally — rerun this probe there before carrying the conclusion
over.

Each regime runs in a fresh SUBPROCESS (the cache config and the jit
in-memory cache are per-process), sequentially (single-tenant TPU). The
probe program is a deliberately trivial-but-not-instant jit: a chain of
`--n-matmuls` (default 12) `[d, d]` matmuls, d=`--dim` (default 2048) —
big enough that XLA does real work, small enough that the number is
compile-dominated, matching the original measurement.

Usage (TPU process; ~10-15 min for all three regimes at the defaults):
    python benchmarks/exp_compile_cache.py [--dim 2048] [--n-matmuls 12]
    python benchmarks/exp_compile_cache.py --regime cold   # one regime only

Output: one JSON line per regime {"regime": ..., "first_result_s": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

_CHILD = r"""
import json, os, sys, time
cache_dir = sys.argv[1]
dim, n = int(sys.argv[2]), int(sys.argv[3])
import jax
if cache_dir != "none":
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

def chain(x):
    for _ in range(n):
        x = jnp.tanh(x @ x)
    return x

t0 = time.perf_counter()
f = jax.jit(chain)
out = np.asarray(f(jnp.eye(dim, dtype=jnp.bfloat16)))  # honest sync
print(json.dumps({"first_result_s": round(time.perf_counter() - t0, 1)}))
"""


def run_child(cache_dir: str, dim: int, n: int, timeout: float) -> float:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, cache_dir, str(dim), str(n)],
        capture_output=True, text=True, timeout=timeout)
    if out.returncode != 0:
        raise RuntimeError(f"probe child failed: {out.stderr[-500:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])["first_result_s"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--n-matmuls", type=int, default=12)
    ap.add_argument("--regime", default="all",
                    choices=["all", "cold", "populate", "hit"])
    ap.add_argument("--timeout", type=float, default=1200.0,
                    help="per-regime subprocess timeout (s); the pathological"
                         " cache-hit regime ran ~391 s on the tunnel")
    args = ap.parse_args()

    cache = tempfile.mkdtemp(prefix="jaxcache_probe_")
    regimes = (["cold", "populate", "hit"] if args.regime == "all"
               else [args.regime])
    for regime in regimes:
        cd = "none" if regime == "cold" else cache
        t = run_child(cd, args.dim, args.n_matmuls, args.timeout)
        n_entries = len(os.listdir(cache)) if os.path.isdir(cache) else 0
        print(json.dumps({"regime": regime, "first_result_s": t,
                          "cache_entries": n_entries}), flush=True)


if __name__ == "__main__":
    main()
