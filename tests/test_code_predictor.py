"""Code predictor tests: fused scan `cp_predict` vs a naive teacher-forced
step-by-step reimplementation (the analog of the reference's
CodePredictorKernel-vs-CodePredictor A/B test, reference:
test_cp_kernel.py:264-277).

Token-level comparison uses teacher forcing + a near-tie escape hatch,
mirroring the reference's two-tier acceptance for bf16 argmax ties
(reference: validate_kernel.py:423-435)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_tts_tpu.models.code_predictor import cp_predict
from qwen_tts_tpu.models.decoder import forward_chunk, init_state
from qwen_tts_tpu.ops.sampling import sample_logits


def _naive_logits_forced(cfg, w, hidden, first_token, talker_embed, forced):
    """Per-group logits with the *fused path's* tokens teacher-forced in,
    so near-tie argmax flips can't compound."""
    state = init_state(cfg)
    first_embed = talker_embed[first_token].astype(jnp.float32)
    prefill = jnp.stack([hidden, first_embed])
    state, normed = forward_chunk(cfg, w.decoder, state, prefill)
    last_hidden = normed[-1]

    all_logits = []
    for g in range(15):
        logits = jnp.dot(last_hidden.astype(jnp.bfloat16), w.lm_heads[g],
                         preferred_element_type=jnp.float32)
        all_logits.append(np.asarray(logits))
        token = int(forced[g + 1])
        embed = w.codec_embeds[g][token].astype(jnp.float32)
        state, normed = forward_chunk(cfg, w.decoder, state, embed[None])
        last_hidden = normed[0]
    return np.stack(all_logits)   # [15, 2048]


@pytest.mark.slow
def test_cp_predict_argmax_matches_naive(tiny_cfg, tiny_weights):
    cfg = tiny_cfg.code_predictor
    w = tiny_weights.code_predictor
    hidden = jax.random.normal(
        jax.random.PRNGKey(3), (cfg.hidden_size,), dtype=jnp.float32)
    first_token = jnp.int32(11)

    codes, logits = cp_predict(
        cfg, w, hidden, first_token, tiny_weights.talker.embed,
        jax.random.PRNGKey(0), do_sample=False, return_logits=True)
    codes = np.asarray(codes)
    logits = np.asarray(logits)
    assert codes.shape == (16,)
    assert codes[0] == 11

    naive_logits = _naive_logits_forced(
        cfg, w, hidden, first_token, tiny_weights.talker.embed, codes)

    # Logits trajectories must be numerically close (eager vs jit rounding)
    np.testing.assert_allclose(logits, naive_logits, rtol=5e-2, atol=5e-2)

    # Token check with near-tie tolerance: fused argmax must be within a
    # hair of the naive max (reference's bf16-tie acceptance tier).
    for g in range(15):
        tok = codes[g + 1]
        naive_best = naive_logits[g].max()
        assert naive_logits[g][tok] >= naive_best - 1e-2, (
            f"group {g}: fused token {tok} not near naive max")


def test_cp_predict_sampling_in_range_and_seeded(tiny_cfg, tiny_weights):
    cfg = tiny_cfg.code_predictor
    w = tiny_weights.code_predictor
    hidden = jax.random.normal(
        jax.random.PRNGKey(5), (cfg.hidden_size,), dtype=jnp.float32)

    a = cp_predict(cfg, w, hidden, jnp.int32(3), tiny_weights.talker.embed,
                   jax.random.PRNGKey(7), do_sample=True)
    b = cp_predict(cfg, w, hidden, jnp.int32(3), tiny_weights.talker.embed,
                   jax.random.PRNGKey(7), do_sample=True)
    c = cp_predict(cfg, w, hidden, jnp.int32(3), tiny_weights.talker.embed,
                   jax.random.PRNGKey(8), do_sample=True)

    na, nb, nc = map(np.asarray, (a, b, c))
    assert (na == nb).all()                      # same key → same codes
    assert (na[1:] >= 0).all() and (na[1:] < cfg.vocab_size).all()
    assert na[0] == 3
    # different keys should usually differ somewhere (not a hard guarantee,
    # but with 15 draws over 2048-way logits a collision is ~impossible)
    assert not (na == nc).all()


def test_cp_predict_step_w_default_is_identity(tiny_cfg, tiny_weights):
    """Passing step_w=w.decoder explicitly must equal the default path —
    the plumbing used by the quantized engine (step weights ≠ prefill
    weights) is a pure threading change."""
    cfg = tiny_cfg.code_predictor
    w = tiny_weights.code_predictor
    hidden = jax.random.normal(
        jax.random.PRNGKey(9), (cfg.hidden_size,), dtype=jnp.float32)

    a = cp_predict(cfg, w, hidden, jnp.int32(5), tiny_weights.talker.embed,
                   jax.random.PRNGKey(1), do_sample=False)
    b = cp_predict(cfg, w, hidden, jnp.int32(5), tiny_weights.talker.embed,
                   jax.random.PRNGKey(1), do_sample=False, step_w=w.decoder)
    assert (np.asarray(a) == np.asarray(b)).all()


def test_cp_predict_quantized_steps_match_dequant_oracle(tiny_cfg, tiny_weights):
    """The engine's quantize=True CP path: 15 T=1 steps through the
    megakernel with int8 weights, bf16 dense 2-token prefill. Oracle = the
    same split with the int8 weights DEQUANTIZED on the dense path — kernel
    vs oracle is then a numerics check (same quantization error on both
    sides), matching the talker kernels' acceptance strategy
    (tests/test_generate_kernel.py)."""
    from qwen_tts_tpu.core.weights import (
        DecoderWeights,
        dequantize_layer_weights,
        quantize_decoder_weights,
    )

    cfg = tiny_cfg.code_predictor
    w = tiny_weights.code_predictor
    qdec = quantize_decoder_weights(w.decoder)
    deq_dec = DecoderWeights(
        layers=dequantize_layer_weights(qdec.layers),
        final_norm=w.decoder.final_norm, embed=w.decoder.embed,
        lm_head=w.decoder.lm_head, rope=w.decoder.rope)
    hidden = jax.random.normal(
        jax.random.PRNGKey(13), (cfg.hidden_size,), dtype=jnp.float32)

    codes_k, logits_k = cp_predict(
        cfg, w, hidden, jnp.int32(7), tiny_weights.talker.embed,
        jax.random.PRNGKey(2), do_sample=False, return_logits=True,
        attn_impl="mega", interpret=True, step_w=qdec)
    codes_o, logits_o = cp_predict(
        cfg, w, hidden, jnp.int32(7), tiny_weights.talker.embed,
        jax.random.PRNGKey(2), do_sample=False, return_logits=True,
        step_w=deq_dec)

    codes_k, codes_o = np.asarray(codes_k), np.asarray(codes_o)
    logits_k, logits_o = np.asarray(logits_k), np.asarray(logits_o)
    # logits trajectories close; tokens equal up to near-ties
    np.testing.assert_allclose(logits_k, logits_o, rtol=5e-2, atol=5e-2)
    for g in range(15):
        tok = codes_k[g + 1]
        assert logits_o[g][tok] >= logits_o[g].max() - 1e-2, (
            f"group {g}: kernel token {tok} not near oracle max")


def test_sample_logits_topk_respects_support():
    logits = jnp.asarray([0.0, 10.0, 9.0, -5.0, 8.0] + [-100.0] * 11)
    for seed in range(20):
        tok = sample_logits(logits, jax.random.PRNGKey(seed),
                            do_sample=True, temperature=1.0, top_k=3)
        assert int(tok) in (1, 2, 4)

    tok = sample_logits(logits, jax.random.PRNGKey(0), do_sample=False)
    assert int(tok) == 1


def test_cp_predict_prefill_is_quant_aware(tiny_cfg, tiny_weights):
    """Serving passes a code predictor whose `.decoder` is quantized with NO
    bf16 copy anywhere (engine initialize() replaces it in place); both the
    2-token prefill and the 15 steps must run from the int8 weights via the
    quant-aware dense path. Oracle = the same decoder DEQUANTIZED, so any
    silent bf16 fallback (impossible here — the bf16 arrays don't exist)
    or a broken quant prefill would show up as a logits mismatch
    (reference CP-on-kernel prefill: model_tts.py:744-748)."""
    from qwen_tts_tpu.core.weights import (
        DecoderWeights,
        dequantize_layer_weights,
        quantize_decoder_weights,
    )

    cfg = tiny_cfg.code_predictor
    w = tiny_weights.code_predictor
    qdec = quantize_decoder_weights(w.decoder)
    assert hasattr(qdec.layers, "wqkv_q")        # quantized, bf16 mats gone
    deq_dec = DecoderWeights(
        layers=dequantize_layer_weights(qdec.layers),
        final_norm=w.decoder.final_norm, embed=w.decoder.embed,
        lm_head=w.decoder.lm_head, rope=w.decoder.rope)
    hidden = jax.random.normal(
        jax.random.PRNGKey(21), (cfg.hidden_size,), dtype=jnp.float32)

    # The serving shape: decoder fully quantized, step_w=None.
    codes_q, logits_q = cp_predict(
        cfg, w._replace(decoder=qdec), hidden, jnp.int32(4),
        tiny_weights.talker.embed, jax.random.PRNGKey(5),
        do_sample=False, return_logits=True)
    codes_o, logits_o = cp_predict(
        cfg, w._replace(decoder=deq_dec), hidden, jnp.int32(4),
        tiny_weights.talker.embed, jax.random.PRNGKey(5),
        do_sample=False, return_logits=True)

    logits_q, logits_o = np.asarray(logits_q), np.asarray(logits_o)
    # Same int8 numerics on both sides → tight agreement
    np.testing.assert_allclose(logits_q, logits_o, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(codes_q), np.asarray(codes_o))
