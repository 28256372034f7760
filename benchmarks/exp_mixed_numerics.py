"""Is the mixed tier's 28.9% coupled token agreement numerics or a bug?

The round-4 all-quant hardware gate measured (random weights, 128 coupled
steps): int8 97.7% / cos .999, MIXED 28.9% / cos .946, int4 66.4% /
cos .825 — non-monotonic: mixed has strictly better hidden fidelity than
int4 yet worse token agreement. Before recording that in README, this
experiment discriminates kernel-bug vs genuine numerics by running the
IDENTICAL coupled comparison entirely in the DENSE ORACLE (models/decoder
.py, no Pallas, CPU) on pre-dequantized weights: oracle(bf16) vs
oracle(dequant(quant(w))). Any kernel bug is out of the loop; if the
non-monotonic ordering reproduces, it is a property of argmax margins on
random weights (error direction, not magnitude, decides flips).

Run on CPU: PYTHONPATH=/root/repo python benchmarks/exp_mixed_numerics.py

MEASURED (round 4). Dense oracle, x64 seed 0 / x32 seeds 1-2:

    tier    tokens s0 / s1 / s2      cos-min s0 / s1 / s2
    int8    100%  / 90.6% / 87.5%    0.9990 / 0.9988 / 0.9990
    mixed   45.3% / 34.4% / 71.9%    0.9462 / 0.9228 / 0.9382
    int4    93.8% / 28.1% / 65.6%    0.8300 / 0.7833 / 0.8307

1. NOT a kernel bug: the dense oracle reproduces the hardware kernel
   gate's cosines to 3 decimals (mixed .946/.953, int4 .825/.852).
2. Hidden fidelity is MONOTONIC in quantized bytes across every seed:
   int8 > mixed > int4 — the mixed tier behaves exactly as designed.
3. Teacher-forced token agreement between BELOW-TIER configs is
   trajectory luck: greedy decodes on random weights ride near-zero
   argmax margins, so whether a below-tier model tracks the oracle's
   token cycle is seed-dependent (int4 spans 28-94% over 3 seeds and
   orders BOTH ways vs mixed). Token agreement only ranks configs whose
   perturbation is inside the margin (the int8 tier); below that, quote
   cosine. README's quality table and validate_kernel's exit semantics
   encode this.
"""

from __future__ import annotations

import argparse

import jax

jax.config.update("jax_platforms", "cpu")

import functools

import jax.numpy as jnp
import numpy as np


def coupled(cfg, w_ref, w_alt, steps):
    from qwen_tts_tpu.core.config import CODEC_BOS
    from qwen_tts_tpu.models import decoder as oracle
    from qwen_tts_tpu.models.decoder import init_state

    step = jax.jit(functools.partial(oracle.decode_step_with_embed, cfg))
    s_r, s_a = init_state(cfg), init_state(cfg)
    prev = CODEC_BOS
    matches, cosines = 0, []
    margins = []
    for _ in range(steps):
        e = w_ref.embed[prev]
        s_r, t_r, h_r = step(w_ref, s_r, e)
        s_a, t_a, h_a = step(w_alt, s_a, e)
        a, b = np.asarray(h_r), np.asarray(h_a)
        cosines.append(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))))
        matches += int(int(t_r) == int(t_a))
        prev = int(t_r)
    return matches / steps, float(np.min(cosines)), float(np.mean(cosines))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from qwen_tts_tpu.core.config import DecoderConfig
    from qwen_tts_tpu.core.weights import (
        dequantize_layer_weights,
        dequantize_layer_weights_int4,
        dequantize_layer_weights_mixed,
        init_decoder_weights,
        quantize_decoder_weights,
        quantize_decoder_weights_int4,
        quantize_decoder_weights_mixed,
    )

    cfg = DecoderConfig(max_seq_len=256)
    w = init_decoder_weights(jax.random.PRNGKey(args.seed), cfg)

    def dq_head(qw):
        if qw.lm_head_s is None:
            return qw.lm_head
        return (qw.lm_head.astype(jnp.float32) * qw.lm_head_s).astype(
            jnp.bfloat16)

    tiers = {
        "int8": (quantize_decoder_weights, dequantize_layer_weights),
        "mixed": (quantize_decoder_weights_mixed,
                  dequantize_layer_weights_mixed),
        "int4": (quantize_decoder_weights_int4,
                 dequantize_layer_weights_int4),
    }
    print(f"dense-oracle coupled x{args.steps}, seed {args.seed} "
          f"(no kernels anywhere):")
    for name, (qf, dqf) in tiers.items():
        qw = qf(w)
        w_dq = w._replace(layers=dqf(qw.layers), lm_head=dq_head(qw))
        rate, cmin, cmean = coupled(cfg, w, w_dq, args.steps)
        print(f"  {name:6s} tokens {rate:.1%}  cos min {cmin:.4f} "
              f"mean {cmean:.4f}")


if __name__ == "__main__":
    main()
