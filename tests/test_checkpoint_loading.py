"""Checkpoint-loader round trips against synthetic safetensors files that
use the REFERENCE key names (reference: model_tts.py:99-146, model.py:23-96)
— a typo in any key string would otherwise only surface with a real
checkpoint (VERDICT r1, missing item 7)."""

import numpy as np
import pytest
import jax.numpy as jnp

from qwen_tts_tpu.core.config import (
    DecoderConfig,
    TTSModelConfig,
    TextProjectionConfig,
)

TALKER = DecoderConfig(
    num_layers=2, hidden_size=64, intermediate_size=96,
    num_q_heads=4, num_kv_heads=2, head_dim=16,
    vocab_size=48, max_seq_len=32)
CP = DecoderConfig(
    num_layers=2, hidden_size=64, intermediate_size=96,
    num_q_heads=4, num_kv_heads=2, head_dim=16,
    vocab_size=40, max_seq_len=16)
MC = TTSModelConfig(
    talker=TALKER, code_predictor=CP,
    text_projection=TextProjectionConfig(
        text_vocab_size=80, text_hidden_size=32, hidden_size=64))


def _layer_tensors(rng, prefix, i, cfg):
    """One layer's tensors in TORCH layout ([out_features, in_features])."""
    h, q, kv, inter, d = (cfg.hidden_size, cfg.q_size, cfg.kv_size,
                          cfg.intermediate_size, cfg.head_dim)
    f = lambda *s: rng.standard_normal(s).astype(np.float32)
    return {
        f"{prefix}{i}.input_layernorm.weight": f(h),
        f"{prefix}{i}.self_attn.q_proj.weight": f(q, h),
        f"{prefix}{i}.self_attn.k_proj.weight": f(kv, h),
        f"{prefix}{i}.self_attn.v_proj.weight": f(kv, h),
        f"{prefix}{i}.self_attn.q_norm.weight": f(d),
        f"{prefix}{i}.self_attn.k_norm.weight": f(d),
        f"{prefix}{i}.self_attn.o_proj.weight": f(h, q),
        f"{prefix}{i}.post_attention_layernorm.weight": f(h),
        f"{prefix}{i}.mlp.gate_proj.weight": f(inter, h),
        f"{prefix}{i}.mlp.up_proj.weight": f(inter, h),
        f"{prefix}{i}.mlp.down_proj.weight": f(h, inter),
    }


@pytest.fixture(scope="module")
def tts_checkpoint(tmp_path_factory):
    """Synthetic model.safetensors with the full reference TTS key set."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    h = TALKER.hidden_size
    state = {}
    for i in range(TALKER.num_layers):
        state.update(_layer_tensors(rng, "talker.model.layers.", i, TALKER))
    state["talker.model.norm.weight"] = rng.standard_normal(h).astype(np.float32)
    state["talker.model.codec_embedding.weight"] = (
        rng.standard_normal((TALKER.vocab_size, h)).astype(np.float32))
    state["talker.codec_head.weight"] = (
        rng.standard_normal((TALKER.vocab_size, h)).astype(np.float32))

    for i in range(CP.num_layers):
        state.update(_layer_tensors(
            rng, "talker.code_predictor.model.layers.", i, CP))
    state["talker.code_predictor.model.norm.weight"] = (
        rng.standard_normal(h).astype(np.float32))
    for g in range(15):
        state[f"talker.code_predictor.lm_head.{g}.weight"] = (
            rng.standard_normal((CP.vocab_size, h)).astype(np.float32))
        state[f"talker.code_predictor.model.codec_embedding.{g}.weight"] = (
            rng.standard_normal((CP.vocab_size, h)).astype(np.float32))

    tp = MC.text_projection
    state["talker.model.text_embedding.weight"] = (
        rng.standard_normal((tp.text_vocab_size, tp.text_hidden_size))
        .astype(np.float32))
    state["talker.text_projection.linear_fc1.weight"] = (
        rng.standard_normal((tp.text_hidden_size, tp.text_hidden_size))
        .astype(np.float32))
    state["talker.text_projection.linear_fc1.bias"] = (
        rng.standard_normal(tp.text_hidden_size).astype(np.float32))
    state["talker.text_projection.linear_fc2.weight"] = (
        rng.standard_normal((tp.hidden_size, tp.text_hidden_size))
        .astype(np.float32))
    state["talker.text_projection.linear_fc2.bias"] = (
        rng.standard_normal(tp.hidden_size).astype(np.float32))

    # speaker encoder present-but-unused, as in the real checkpoint
    state["speaker_encoder.proj.weight"] = (
        rng.standard_normal((8, 8)).astype(np.float32))

    d = tmp_path_factory.mktemp("ckpt")
    save_file(state, str(d / "model.safetensors"))
    return str(d), state


def test_load_tts_weights_roundtrip(tts_checkpoint):
    from qwen_tts_tpu.core.weights import load_tts_weights

    path, state = tts_checkpoint
    w = load_tts_weights(path, MC, dtype=jnp.float32, verbose=False)

    L, H, Q, KV = (TALKER.num_layers, TALKER.hidden_size, TALKER.q_size,
                   TALKER.kv_size)
    assert w.talker.layers.wqkv.shape == (L, H, Q + 2 * KV)
    assert w.talker.layers.wo.shape == (L, Q, H)
    assert w.talker.layers.w_gate_up.shape == (L, H, 2 * TALKER.intermediate_size)
    assert w.talker.lm_head.shape == (H, TALKER.vocab_size)

    # transposition + qkv fusion: wqkv[:, :, :Q] == q_proj.T per layer
    q0 = state["talker.model.layers.0.self_attn.q_proj.weight"]
    np.testing.assert_allclose(
        np.asarray(w.talker.layers.wqkv[0, :, :Q]), q0.T, rtol=1e-6)
    v1 = state["talker.model.layers.1.self_attn.v_proj.weight"]
    np.testing.assert_allclose(
        np.asarray(w.talker.layers.wqkv[1, :, Q + KV:]), v1.T, rtol=1e-6)
    o0 = state["talker.model.layers.0.self_attn.o_proj.weight"]
    np.testing.assert_allclose(
        np.asarray(w.talker.layers.wo[0]), o0.T, rtol=1e-6)
    gate1 = state["talker.model.layers.1.mlp.gate_proj.weight"]
    np.testing.assert_allclose(
        np.asarray(w.talker.layers.w_gate_up[1, :, :TALKER.intermediate_size]),
        gate1.T, rtol=1e-6)

    # untied codec head is TRANSPOSED, embedding is not
    np.testing.assert_allclose(
        np.asarray(w.talker.lm_head),
        state["talker.codec_head.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(w.talker.embed),
        state["talker.model.codec_embedding.weight"], rtol=1e-6)

    # code predictor: per-group heads stacked in group order
    assert w.code_predictor.lm_heads.shape == (15, H, CP.vocab_size)
    np.testing.assert_allclose(
        np.asarray(w.code_predictor.lm_heads[3]),
        state["talker.code_predictor.lm_head.3.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(w.code_predictor.codec_embeds[7]),
        state["talker.code_predictor.model.codec_embedding.7.weight"], rtol=1e-6)

    # text projection: fc weights transposed, biases straight
    np.testing.assert_allclose(
        np.asarray(w.text_projection.fc2_w),
        state["talker.text_projection.linear_fc2.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(w.text_projection.fc1_b),
        state["talker.text_projection.linear_fc1.bias"], rtol=1e-6)


def test_loaded_weights_run_a_decode_step(tts_checkpoint):
    """The loaded pytree must be directly consumable by the decode path."""
    import jax
    from qwen_tts_tpu.core.weights import load_tts_weights
    from qwen_tts_tpu.models.decoder import decode_step, init_state

    path, _ = tts_checkpoint
    w = load_tts_weights(path, MC, dtype=jnp.bfloat16, verbose=False)
    state = init_state(TALKER)
    state, tok, hid = decode_step(TALKER, w.talker, state, jnp.int32(1))
    assert 0 <= int(tok) < TALKER.vocab_size
    assert hid.shape == (TALKER.hidden_size,)
    assert int(state.position) == 1


def test_speaker_encoder_loader(tts_checkpoint):
    from qwen_tts_tpu.core.weights import load_speaker_encoder

    path, state = tts_checkpoint
    enc = load_speaker_encoder(path)
    assert set(enc) == {"speaker_encoder.proj.weight"}


def test_load_text_lm_weights_roundtrip(tmp_path):
    from safetensors.numpy import save_file
    from qwen_tts_tpu.models.text_lm import load_text_lm_weights

    cfg = DecoderConfig(
        num_layers=2, hidden_size=64, intermediate_size=96,
        num_q_heads=4, num_kv_heads=2, head_dim=16,
        vocab_size=100, max_seq_len=32, rope_theta=10000.0)
    rng = np.random.default_rng(1)
    state = {}
    for i in range(cfg.num_layers):
        state.update(_layer_tensors(rng, "model.layers.", i, cfg))
    state["model.norm.weight"] = rng.standard_normal(
        cfg.hidden_size).astype(np.float32)
    state["model.embed_tokens.weight"] = rng.standard_normal(
        (cfg.vocab_size, cfg.hidden_size)).astype(np.float32)
    save_file(state, str(tmp_path / "model.safetensors"))

    w, _tok = load_text_lm_weights(str(tmp_path), cfg, dtype=jnp.float32,
                                   verbose=False)
    assert w.embed.shape == (cfg.vocab_size, cfg.hidden_size)
    # tied head = embed transposed
    np.testing.assert_allclose(
        np.asarray(w.lm_head), np.asarray(w.embed).T, rtol=1e-6)
    k1 = state["model.layers.1.self_attn.k_proj.weight"]
    np.testing.assert_allclose(
        np.asarray(w.layers.wqkv[1, :, cfg.q_size:cfg.q_size + cfg.kv_size]),
        k1.T, rtol=1e-6)
