#!/usr/bin/env python3
"""Isolate the kv8 hardware failure: tiny config, staged step counts.

Correctness vs the oracle is covered by interpret tests
(tests/test_generate_kernel.py); this only checks the kernel RUNS on the
real chip at each phase: tail-only (n<128, no flush), flush boundary
(n=128..), and flushed-chunk readback (n>128 with pos>=C)."""

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.core.config import DecoderConfig
from qwen_tts_tpu.core.weights import init_decoder_weights
from qwen_tts_tpu.models.decoder import init_state
from qwen_tts_tpu.ops.generate_kernel import generate_megakernel

cfg = DecoderConfig(num_layers=3, hidden_size=256, intermediate_size=512,
                    num_q_heads=4, num_kv_heads=2, head_dim=128,
                    vocab_size=512, max_seq_len=1024)
w = init_decoder_weights(jax.random.PRNGKey(4), cfg)

st = init_state(cfg)
st, toks = generate_megakernel(cfg, w, st, jnp.int32(7), 20)
bf16_toks = np.asarray(toks)
print("bf16 n=20 OK:", bf16_toks[:8].tolist(), flush=True)

for n in (8, 130, 300):
    try:
        st = init_state(cfg, jnp.int8)
        st, toks = generate_megakernel(cfg, w, st, jnp.int32(7), n)
        got = np.asarray(toks)
        print(f"kv8 n={n} OK: first {got[:8].tolist()}", flush=True)
    except Exception as e:
        print(f"kv8 n={n} FAIL: {type(e).__name__}: {str(e)[:400]}", flush=True)
        traceback.print_exc(limit=3)
