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


@pytest.mark.slow
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


@pytest.mark.slow
def test_megakernel_kv8_matches_oracle(w):
    """int8 KV cache in the SINGLE-STEP kernel (the serving path) vs the
    dense kv8 oracle: both quantize new columns identically (absmax/127 per
    head row from f32), so hiddens agree to bf16/softmax tolerance and the
    stored caches agree to ±1 int8 LSB (float last-bit differences between
    the two compute orders flip round() on a few percent of entries) and
    scales agree to float tolerance."""
    state_o = init_state(CFG, jnp.int8)
    state_m = init_state(CFG, jnp.int8)
    embed = jax.random.normal(jax.random.PRNGKey(3), (CFG.hidden_size,),
                              dtype=jnp.float32)

    for step in range(12):
        state_o, tok_o, hid_o = oracle.decode_step_with_embed(
            CFG, w, state_o, embed)
        state_m, logits_m, hid_m = _mega_step(w, state_m, embed)

        a, b = np.asarray(hid_o), np.asarray(hid_m)
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.999, f"step {step}: cosine {cos}"
        np.testing.assert_allclose(
            np.asarray(state_o.k_cache[:, :, step]).astype(np.int32),
            np.asarray(state_m.k_cache[:, :, step]).astype(np.int32),
            atol=1)
        np.testing.assert_allclose(
            np.asarray(state_o.k_scale[:, :, step]),
            np.asarray(state_m.k_scale[:, :, step]), rtol=5e-3)
        np.testing.assert_allclose(
            np.asarray(state_o.v_scale[:, :, step]),
            np.asarray(state_m.v_scale[:, :, step]), rtol=5e-3)
        embed = hid_o


@pytest.mark.slow
def test_megakernel_kv8_close_to_bf16(w):
    """kv8 vs bf16 cache: int8 rounding perturbs attention by < ~1%."""
    state8 = init_state(CFG, jnp.int8)
    state16 = init_state(CFG)
    embed = jax.random.normal(jax.random.PRNGKey(4), (CFG.hidden_size,),
                              dtype=jnp.float32)
    for step in range(8):
        state8, _, hid8 = _mega_step(w, state8, embed)
        state16, _, hid16 = _mega_step(w, state16, embed)
        a, b = np.asarray(hid8), np.asarray(hid16)
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.995, f"step {step}: cosine {cos}"
        embed = hid16


def test_megakernel_int8_head_logits(w):
    """int8 LM head in the fused kernel vs the oracle's scaled head math."""
    from qwen_tts_tpu.core.weights import quantize_decoder_weights

    qw = quantize_decoder_weights(w)
    assert qw.lm_head.dtype == jnp.int8 and qw.lm_head_s is not None
    state = init_state(CFG)
    embed = jax.random.normal(jax.random.PRNGKey(5), (CFG.hidden_size,),
                              dtype=jnp.float32)
    state, logits_m, hid_m = _mega_step(qw, state, embed)
    # oracle: same hidden → lm_head_logits applies the same scale placement
    logits_o = oracle.lm_head_logits(qw, hid_m[None, :])[0]
    np.testing.assert_allclose(np.asarray(logits_m), np.asarray(logits_o),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_megakernel_int4_step(w):
    """Packed-int4 weights through the SINGLE-STEP kernel (serving path) vs
    a dense oracle on the dequantized weights."""
    from qwen_tts_tpu.core.weights import (
        dequantize_layer_weights_int4,
        quantize_decoder_weights_int4,
    )

    qw = quantize_decoder_weights_int4(w)
    head_dq = (qw.lm_head.astype(jnp.float32) * qw.lm_head_s).astype(jnp.bfloat16)
    w_dq = w._replace(layers=dequantize_layer_weights_int4(qw.layers),
                      lm_head=head_dq)

    state_o = init_state(CFG)
    state_m = init_state(CFG)
    embed = jax.random.normal(jax.random.PRNGKey(6), (CFG.hidden_size,),
                              dtype=jnp.float32)
    n_match = 0
    for step in range(8):
        state_o, tok_o, hid_o = oracle.decode_step_with_embed(
            CFG, w_dq, state_o, embed)
        state_m, logits_m, hid_m = _mega_step(qw, state_m, embed)
        a, b = np.asarray(hid_o), np.asarray(hid_m)
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.999, f"step {step}: cosine {cos}"
        if int(tok_o) == int(jnp.argmax(logits_m)):
            n_match += 1
        embed = hid_o
    assert n_match >= 7, f"only {n_match}/8 tokens matched"


@pytest.mark.slow
def test_megakernel_mixed_step(w):
    """MIXED tier (int8 attention + packed-int4 MLP) through the SINGLE-STEP
    kernel vs a dense oracle on the dequantized weights. The kernel has no
    mixed-specific code: `mm_scaled` dispatches per matrix by shape."""
    from qwen_tts_tpu.core.weights import (
        dequantize_layer_weights_mixed,
        quantize_decoder_weights_mixed,
    )

    qw = quantize_decoder_weights_mixed(w)
    # attention fields int8-shaped, MLP fields packed
    assert qw.layers.wqkv_q.shape[1] == CFG.hidden_size
    assert qw.layers.w_gate_up_q.shape[1] == CFG.hidden_size // 2
    head_dq = (qw.lm_head.astype(jnp.float32) * qw.lm_head_s).astype(jnp.bfloat16)
    w_dq = w._replace(layers=dequantize_layer_weights_mixed(qw.layers),
                      lm_head=head_dq)

    state_o = init_state(CFG)
    state_m = init_state(CFG)
    embed = jax.random.normal(jax.random.PRNGKey(9), (CFG.hidden_size,),
                              dtype=jnp.float32)
    n_match = 0
    for step in range(8):
        state_o, tok_o, hid_o = oracle.decode_step_with_embed(
            CFG, w_dq, state_o, embed)
        state_m, logits_m, hid_m = _mega_step(qw, state_m, embed)
        a, b = np.asarray(hid_o), np.asarray(hid_m)
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.999, f"step {step}: cosine {cos}"
        if int(tok_o) == int(jnp.argmax(logits_m)):
            n_match += 1
        embed = hid_o
    assert n_match >= 7, f"only {n_match}/8 tokens matched"


def test_quant_prefill_matches_dequantized():
    """The quant-aware T>1 dense path (per-layer on-the-fly dequant) is
    BIT-IDENTICAL to running the dense path on pre-dequantized bf16 weights
    — quantize mode needs no resident bf16 copy (VERDICT r2 #4)."""
    from qwen_tts_tpu.core.weights import (
        dequantize_layer_weights,
        dequantize_layer_weights_int4,
        dequantize_layer_weights_mixed,
        quantize_decoder_weights,
        quantize_decoder_weights_int4,
        quantize_decoder_weights_mixed,
    )

    w = init_decoder_weights(jax.random.PRNGKey(7), CFG)
    embeds = jax.random.normal(jax.random.PRNGKey(8),
                               (8, CFG.hidden_size), dtype=jnp.float32)
    for qf, dqf in ((quantize_decoder_weights, dequantize_layer_weights),
                    (quantize_decoder_weights_int4,
                     dequantize_layer_weights_int4),
                    (quantize_decoder_weights_mixed,
                     dequantize_layer_weights_mixed)):
        qw = qf(w)
        w_dq = w._replace(layers=dqf(qw.layers))
        s_q, normed_q = oracle.forward_chunk(CFG, qw, init_state(CFG), embeds)
        s_d, normed_d = oracle.forward_chunk(CFG, w_dq, init_state(CFG), embeds)
        np.testing.assert_array_equal(np.asarray(normed_q),
                                      np.asarray(normed_d))
        np.testing.assert_array_equal(np.asarray(s_q.k_cache),
                                      np.asarray(s_d.k_cache))
        assert int(s_q.position) == 8




def test_unfused_head_bitwise_matches_fused(w):
    """Large-vocab mode (fuse_head=False: head as an XLA matvec after the
    pallas call) must produce the same logits/normed/caches as the fused
    in-kernel head — the text-LM 151936-vocab head exceeds VMEM, so the
    megakernel auto-selects this path (core/config.HEAD_FUSE_LIMIT_MB)."""
    import qwen_tts_tpu.ops.decode_step as ds

    embed = jax.random.normal(jax.random.PRNGKey(3), (CFG.hidden_size,),
                              dtype=jnp.float32)
    sf, lf, nf = ds.megakernel_forward.__wrapped__(
        CFG, w, init_state(CFG), embed, chunk=64, interpret=True,
        fuse_head=True)
    su, lu, nu = ds.megakernel_forward.__wrapped__(
        CFG, w, init_state(CFG), embed, chunk=64, interpret=True,
        fuse_head=False)
    np.testing.assert_array_equal(np.asarray(nf), np.asarray(nu))
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lu),
                               rtol=0, atol=1e-5)
    assert int(jnp.argmax(lf)) == int(jnp.argmax(lu))
    np.testing.assert_array_equal(np.asarray(sf.k_cache),
                                  np.asarray(su.k_cache))


def test_unfused_head_int8_scale_applied(w):
    """fuse_head=False with an int8 LM head applies the per-channel dequant
    scale exactly like the fused mm_scaled path."""
    import qwen_tts_tpu.ops.decode_step as ds
    from qwen_tts_tpu.core.weights import quantize_decoder_weights

    qw = quantize_decoder_weights(w)
    embed = jax.random.normal(jax.random.PRNGKey(4), (CFG.hidden_size,),
                              dtype=jnp.float32)
    _, lf, _ = ds.megakernel_forward.__wrapped__(
        CFG, qw, init_state(CFG), embed, chunk=64, interpret=True,
        fuse_head=True)
    _, lu, _ = ds.megakernel_forward.__wrapped__(
        CFG, qw, init_state(CFG), embed, chunk=64, interpret=True,
        fuse_head=False)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lu),
                               rtol=0, atol=1e-4)
    assert int(jnp.argmax(lf)) == int(jnp.argmax(lu))
