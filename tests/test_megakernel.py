"""Megakernel decode step vs the pure-JAX oracle (interpret mode, CPU).

The analog of the reference's validate_kernel.py: identical inputs through
the fused kernel and the oracle, comparing tokens + hidden-state closeness
with the two-tier bf16-ties acceptance (reference: validate_kernel.py:
204-258, 413-435)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_tts_tpu.core.config import DecoderConfig
from qwen_tts_tpu.core.weights import init_decoder_weights
from qwen_tts_tpu.models import decoder as oracle
from qwen_tts_tpu.models.decoder import init_state

CFG = DecoderConfig(
    num_layers=3, hidden_size=256, intermediate_size=512,
    num_q_heads=4, num_kv_heads=2, head_dim=128,
    vocab_size=512, max_seq_len=128)


@pytest.fixture(scope="module")
def w():
    return init_decoder_weights(jax.random.PRNGKey(1), CFG)


def _mega_step(w, state, embed):
    import qwen_tts_tpu.ops.decode_step as ds
    import jax.experimental.pallas as pl

    # interpret mode via the kernel's own plumb-through parameter
    return ds.megakernel_forward.__wrapped__(CFG, w, state, embed, chunk=64,
                                             interpret=True)


def test_megakernel_matches_oracle_sequence(w):
    """20 greedy steps: token match + cosine similarity vs oracle."""
    state_o = init_state(CFG)
    state_m = init_state(CFG)
    embed = jax.random.normal(jax.random.PRNGKey(2), (CFG.hidden_size,),
                              dtype=jnp.float32)

    n_match = 0
    for step in range(20):
        state_o, tok_o, hid_o = oracle.decode_step_with_embed(CFG, w, state_o, embed)
        state_m, logits_m, hid_m = _mega_step(w, state_m, embed)
        tok_m = jnp.argmax(logits_m)

        a, b = np.asarray(hid_o), np.asarray(hid_m)
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.999, f"step {step}: cosine {cos}"
        if int(tok_o) == int(tok_m):
            n_match += 1
        # caches must agree
        np.testing.assert_allclose(
            np.asarray(state_o.k_cache[:, :, step].astype(jnp.float32)),
            np.asarray(state_m.k_cache[:, :, step].astype(jnp.float32)),
            rtol=2e-2, atol=2e-2)
        # next input = previous hidden (keeps the sequence coupled)
        embed = hid_o

    # reference acceptance: 100% ideally; bf16 argmax ties tolerated
    assert n_match >= 19, f"only {n_match}/20 tokens matched"


def test_megakernel_position_advances(w):
    state = init_state(CFG)
    embed = jnp.zeros((CFG.hidden_size,), dtype=jnp.float32)
    state, logits, hid = _mega_step(w, state, embed)
    assert int(state.position) == 1
    assert logits.shape == (CFG.vocab_size,)
    assert hid.shape == (CFG.hidden_size,)
    state, _, _ = _mega_step(w, state, embed)
    assert int(state.position) == 2


