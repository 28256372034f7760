#!/usr/bin/env python3
"""Measure (not just argue) the ADR's dp-first linear-aggregate claim.

docs/06 decides dp-first scaling "by construction": utterances are
independent, so a dp-sharded batch inserts no collectives and aggregate
throughput is linear in chips. Only one physical chip exists here, so this
experiment validates the claim on the 8-virtual-device CPU mesh at the
level where a virtual mesh is MEANINGFUL (VERDICT r3 #8):

1. **Zero TENSOR collectives, compiled.** The batched frame program is
   lowered at dp ∈ {1,2,4,8} and the optimized HLO is scanned for
   collective ops (all-reduce / all-gather / reduce-scatter /
   collective-permute / all-to-all). dp must insert NO tensor-shaped
   collectives — that is the structural fact that makes aggregate scaling
   linear on real chips (each chip runs an independent shard, ICI idle).
   The only cross-device ops allowed are `pred[]` (scalar boolean)
   all-reduces: SPMD requires every device to agree on a data-dependent
   `lax.while_loop` trip condition (the chunked-attention loop inside
   frame_step), which moves one bit per loop iteration — latency noise
   against an 80 ms frame budget, and classified separately.
2. **Perfect FLOP partitioning.** XLA's cost analysis per device must show
   per-device FLOPs ≈ total/dp (weak-scaling share), i.e. no replicated
   compute sneaking in.
3. **Wall time (reported, not load-bearing).** Virtual devices share the
   host's cores, so CPU wall time cannot show linear speedup; it is
   recorded only to catch pathologies (e.g. dp=8 slower than dp=1 would
   flag replication).

Output: one JSON line per dp for the docs/06 table.
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def main():
    from qwen_tts_tpu.core.config import tiny_test_config
    from qwen_tts_tpu.core.weights import init_tts_weights
    from qwen_tts_tpu.runtime.batch import batched_frames, batched_prefill

    B = 8
    frames = 4
    mc = tiny_test_config(max_seq_len=128)
    w = init_tts_weights(jax.random.PRNGKey(0), mc)
    H = mc.talker.hidden_size
    devs = np.array(jax.devices())
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"

    prefill_embeds = jax.random.normal(
        jax.random.PRNGKey(1), (B, 8, H), jnp.float32)
    trailing = jax.random.normal(
        jax.random.PRNGKey(2), (B, 16, H), jnp.float32)
    tlen = jnp.full((B,), 16, jnp.int32)
    pad = jnp.zeros((H,), jnp.float32)
    rngs = jax.random.split(jax.random.PRNGKey(3), B)

    for dp in (1, 2, 4, 8):
        mesh = Mesh(devs[:dp].reshape(dp), ("dp",))

        def batch_sharded(x):
            # batch on the leading axis, everything else replicated. EVERY
            # batch-dim input must be placed this way — an eagerly-created
            # array is committed to device 0, and mixing it with dp-sharded
            # inputs makes GSPMD insert reshard collectives that then show
            # up (falsely) as "dp inserted communication"
            return jax.device_put(
                x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1)))))

        repl = lambda x: jax.device_put(x, NamedSharding(mesh, P()))
        pe = batch_sharded(prefill_embeds)
        tr = batch_sharded(trailing)
        tl = batch_sharded(tlen)
        rg = batch_sharded(rngs)
        tidx0 = batch_sharded(jnp.zeros((B,), jnp.int32))
        pad_r = repl(pad)
        w_r = jax.tree.map(repl, w)

        state, tok, hid = batched_prefill(
            mc.talker, w_r.talker, pe, attn_impl="dense")
        # re-pin the prefill outputs: their sharding is whatever GSPMD
        # propagated; the measurement wants an unambiguous dp layout
        state, tok, hid = jax.tree.map(batch_sharded, (state, tok, hid))
        args = (mc.talker, mc.code_predictor, w_r.talker, w_r.code_predictor,
                state, tok, hid, tr, tl, tidx0, pad_r, rg)
        kw = dict(num_frames=frames, do_sample=False, attn_impl="dense")

        lowered = batched_frames.lower(*args, **kw)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        n_coll = {c: hlo.count(c) for c in COLLECTIVES if hlo.count(c)}
        # classify any all-reduce by the SHAPE it reduces: a `pred[]`
        # (scalar boolean) all-reduce is a while-loop trip-condition
        # agreement (the dynamic-trip-count attention loop under SPMD),
        # NOT data communication — the dp claim is "zero TENSOR
        # collectives", which this separates out explicitly
        tensor_coll = 0
        pred_coll = 0
        for line in hlo.splitlines():
            if "all-reduce" in line and "= " in line:
                shape = line.split("= ", 1)[1].split(" ", 1)[0]
                if shape.startswith("pred[]"):
                    pred_coll += 1
                elif "all-reduce" in line.split("= ", 1)[1]:
                    tensor_coll += 1
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops_per_dev = float(cost.get("flops", float("nan")))

        # wall time (donated state → rebuild per run)
        ts = []
        for _ in range(3):
            st2, tok2, hid2 = batched_prefill(
                mc.talker, w_r.talker, pe, attn_impl="dense")
            st2, tok2, hid2 = jax.tree.map(batch_sharded, (st2, tok2, hid2))
            t0 = time.perf_counter()
            out = batched_frames(
                mc.talker, mc.code_predictor, w_r.talker, w_r.code_predictor,
                st2, tok2, hid2, tr, tl, tidx0, pad_r, rg, **kw)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)

        print(json.dumps({
            "dp": dp, "batch": B,
            "collectives_in_hlo": n_coll,
            "tensor_collectives": tensor_coll,     # must be 0
            "pred_loop_condition_allreduces": pred_coll,  # scalar, benign
            "flops_per_device": flops_per_dev,     # ≈ repl + sharded/dp
            "wall_ms_median_cpu": round(np.median(ts) * 1000, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
