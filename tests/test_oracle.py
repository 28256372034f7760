"""Oracle decoder invariants: shapes, determinism, prefill≡sequential-steps.

The prefill-vs-steps equivalence is the core correctness property that lets
the TPU build replace the reference's 8 sequential prefill steps
(reference: tts_engine.py:281-282) with one batched causal forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_tts_tpu.models.decoder import (
    decode_step,
    decode_step_with_embed,
    forward_chunk,
    init_state,
    prefill,
    rms_norm,
)


def test_rms_norm_matches_numpy():
    x = np.random.RandomState(0).randn(4, 32).astype(np.float32)
    w = np.random.RandomState(1).rand(32).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w)))
    want = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_step_shapes_and_position(tiny_cfg, tiny_weights):
    cfg, w = tiny_cfg.talker, tiny_weights.talker
    state = init_state(cfg)
    state, token, hidden = decode_step(cfg, w, state, jnp.int32(2149))
    assert token.shape == () and token.dtype == jnp.int32
    assert hidden.shape == (cfg.hidden_size,) and hidden.dtype == jnp.float32
    assert int(state.position) == 1
    assert 0 <= int(token) < cfg.vocab_size


@pytest.mark.slow
def test_decode_deterministic(tiny_cfg, tiny_weights):
    cfg, w = tiny_cfg.talker, tiny_weights.talker
    outs = []
    for _ in range(2):
        state = init_state(cfg)
        toks = []
        token = jnp.int32(2149)
        for _ in range(5):
            state, token, _ = decode_step(cfg, w, state, token)
            toks.append(int(token))
        outs.append(toks)
    assert outs[0] == outs[1]


def test_prefill_equals_sequential_steps(tiny_cfg, tiny_weights):
    cfg, w = tiny_cfg.talker, tiny_weights.talker
    embeds = jax.random.normal(
        jax.random.PRNGKey(42), (6, cfg.hidden_size), dtype=jnp.float32)

    # Path A: batched prefill
    state_a = init_state(cfg)
    state_a, tok_a, hid_a = prefill(cfg, w, state_a, embeds)

    # Path B: 6 sequential single steps
    state_b = init_state(cfg)
    for i in range(6):
        state_b, tok_b, hid_b = decode_step_with_embed(cfg, w, state_b, embeds[i])

    assert int(state_a.position) == int(state_b.position) == 6
    np.testing.assert_allclose(
        np.asarray(hid_a), np.asarray(hid_b), rtol=2e-2, atol=2e-2)
    assert int(tok_a) == int(tok_b)
    # KV caches must match where written
    ka = np.asarray(state_a.k_cache[:, :, :6].astype(jnp.float32))
    kb = np.asarray(state_b.k_cache[:, :, :6].astype(jnp.float32))
    np.testing.assert_allclose(ka, kb, rtol=2e-2, atol=2e-2)


def test_cache_only_written_at_positions(tiny_cfg, tiny_weights):
    cfg, w = tiny_cfg.talker, tiny_weights.talker
    state = init_state(cfg)
    state, _, _ = decode_step(cfg, w, state, jnp.int32(1))
    k = np.asarray(state.k_cache.astype(jnp.float32))
    assert np.abs(k[:, :, 1:]).max() == 0.0
    assert np.abs(k[:, :, 0]).max() > 0.0


def test_hidden_consumed_by_forward_chunk_matches_embed_mode(tiny_cfg, tiny_weights):
    """step(token) ≡ step_with_embed(embed[token]) — the sentinel-path
    equivalence (reference: model_tts.py:254-330)."""
    cfg, w = tiny_cfg.talker, tiny_weights.talker
    tok = jnp.int32(7)

    state1 = init_state(cfg)
    state1, t1, h1 = decode_step(cfg, w, state1, tok)

    state2 = init_state(cfg)
    state2, t2, h2 = decode_step_with_embed(cfg, w, state2, w.embed[tok])

    assert int(t1) == int(t2)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-5)


def test_bounded_mixed_attention_matches_reference():
    """The bounded (fori_loop over 256-blocks) old-cache pass must equal a
    full masked-softmax reference for arbitrary start positions."""
    from qwen_tts_tpu.core.config import DecoderConfig
    from qwen_tts_tpu.models.decoder import _dense_mixed_attention

    cfg = DecoderConfig(num_layers=1, hidden_size=64, intermediate_size=64,
                        num_q_heads=4, num_kv_heads=2, head_dim=16,
                        vocab_size=32, max_seq_len=512)
    T, S, d = 3, 512, cfg.head_dim
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((T, cfg.num_q_heads, d)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((T, cfg.num_kv_heads, d)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((T, cfg.num_kv_heads, d)), jnp.float32)
    k_old = jnp.asarray(rng.standard_normal((cfg.num_kv_heads, S, d)),
                        jnp.float32).astype(jnp.bfloat16)
    v_old = jnp.asarray(rng.standard_normal((cfg.num_kv_heads, S, d)),
                        jnp.float32).astype(jnp.bfloat16)

    def reference(start):
        g = cfg.gqa_groups
        qh = np.asarray(q).transpose(1, 0, 2).reshape(cfg.num_kv_heads, g, T, d)
        kf = np.asarray(k_old.astype(jnp.float32))
        vf = np.asarray(v_old.astype(jnp.float32))
        kcn = np.asarray(kc).transpose(1, 0, 2)
        vcn = np.asarray(vc).transpose(1, 0, 2)
        scale = 1.0 / np.sqrt(d)
        s_old = np.einsum("hgtd,hsd->hgts", qh, kf) * scale
        s_old[:, :, :, start:] = -np.inf
        s_new = np.einsum("hgtd,hud->hgtu", qh, kcn) * scale
        for t in range(T):
            s_new[:, :, t, t + 1:] = -np.inf
        s = np.concatenate([s_old, s_new], axis=-1)
        p = np.exp(s - s.max(axis=-1, keepdims=True))
        p /= p.sum(axis=-1, keepdims=True)
        attn = (np.einsum("hgts,hsd->hgtd", p[..., :S], vf)
                + np.einsum("hgtu,hud->hgtd", p[..., S:], vcn))
        return attn.reshape(cfg.num_q_heads, T, d).transpose(1, 0, 2).reshape(
            T, cfg.num_q_heads * d)

    for start in (0, 1, 255, 256, 300, 509):
        got = np.asarray(_dense_mixed_attention(
            cfg, q, kc, vc, k_old, v_old, jnp.int32(start)))
        np.testing.assert_allclose(got, reference(start), rtol=2e-2, atol=2e-2)
