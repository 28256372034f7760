"""M-RoPE (multimodal RoPE, mrope_section e.g. [24,20,20]) tests.

The reference kernel only implements standard RoPE and documents unreliable
EOS as the consequence (reference: README.md:204-208,
docs/02-kernel-adaptation.md). Here M-RoPE is implemented in the oracle and
threaded through both megakernels behind `DecoderConfig.mrope_section`;
these tests validate against a hand-rolled reference implementation and
check the standard-RoPE equivalence when all section positions agree."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_tts_tpu.core.config import DecoderConfig
from qwen_tts_tpu.core.weights import init_decoder_weights
from qwen_tts_tpu.models.decoder import (
    decode_step_with_embed,
    forward_chunk,
    init_state,
    mrope_rows,
)

# head_dim 128 → D//2 = 64 = 24 + 20 + 20, the real talker's sections
CFG = DecoderConfig(
    num_layers=2, hidden_size=256, intermediate_size=512,
    num_q_heads=4, num_kv_heads=2, head_dim=128,
    vocab_size=512, max_seq_len=128, mrope_section=(24, 20, 20))


@pytest.fixture(scope="module")
def w():
    return init_decoder_weights(jax.random.PRNGKey(7), CFG)


def _mrope_rows_reference(rope, secs, mpos, T):
    """Hand-rolled: per frequency index j, use the table row of its section."""
    cos = np.asarray(rope.cos)
    sin = np.asarray(rope.sin)
    d2 = cos.shape[1]
    sec_of = np.concatenate([np.full(s, i) for i, s in enumerate(secs)])
    assert sec_of.shape == (d2,)
    out_c = np.zeros((T, d2), np.float32)
    out_s = np.zeros((T, d2), np.float32)
    for t in range(T):
        for j in range(d2):
            p = int(mpos[sec_of[j]]) + t
            out_c[t, j] = cos[p, j]
            out_s[t, j] = sin[p, j]
    return out_c, out_s


def test_mrope_rows_match_reference(w):
    mpos = jnp.asarray([5, 11, 2], jnp.int32)
    cos, sin = mrope_rows(CFG, w.rope, mpos, 4)
    rc, rs = _mrope_rows_reference(w.rope, CFG.mrope_section, [5, 11, 2], 4)
    np.testing.assert_allclose(np.asarray(cos), rc, rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(sin), rs, rtol=0, atol=0)


def test_equal_sections_reduce_to_standard_rope(w):
    """mrope_pos = (p, p, p) must be BIT-identical to standard RoPE."""
    std_cfg = dataclasses.replace(CFG, mrope_section=None)
    e = jax.random.normal(jax.random.PRNGKey(0), (3, CFG.hidden_size),
                          dtype=jnp.bfloat16)
    s1, n1 = forward_chunk(std_cfg, w, init_state(std_cfg), e)
    mpos = jnp.asarray([0, 0, 0], jnp.int32)
    s2, n2 = forward_chunk(CFG, w, init_state(CFG), e, mrope_pos=mpos)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(s1.k_cache), np.asarray(s2.k_cache))


def test_unequal_sections_change_attention(w):
    """RoPE is relative: a constant per-section offset on ALL tokens cancels
    in q·k, so the observable effect needs cache keys with a DIFFERENT
    section pattern than the query — warm standard, then decode unequal."""
    e4 = jax.random.normal(jax.random.PRNGKey(1), (4, CFG.hidden_size),
                           dtype=jnp.bfloat16)
    e = jax.random.normal(jax.random.PRNGKey(2), (CFG.hidden_size,),
                          dtype=jnp.bfloat16)
    state, _ = forward_chunk(CFG, w, init_state(CFG), e4,
                             mrope_pos=jnp.asarray([0, 0, 0], jnp.int32))
    _, _, n_eq = decode_step_with_embed(
        CFG, w, state, e, mrope_pos=jnp.asarray([4, 4, 4], jnp.int32))
    _, _, n_ne = decode_step_with_embed(
        CFG, w, state, e, mrope_pos=jnp.asarray([4, 11, 29], jnp.int32))
    assert not np.array_equal(np.asarray(n_eq), np.asarray(n_ne))

    # and the constant-offset invariance itself (the reason the warm-up is
    # needed) holds: shifting every section start of a FRESH chunk leaves
    # the output unchanged up to f32 table rounding
    _, a = forward_chunk(CFG, w, init_state(CFG), e4,
                         mrope_pos=jnp.asarray([0, 0, 0], jnp.int32))
    _, b = forward_chunk(CFG, w, init_state(CFG), e4,
                         mrope_pos=jnp.asarray([0, 7, 19], jnp.int32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-2, atol=2e-2)


def test_megakernel_mrope_matches_oracle(w):
    """Single-step megakernel with unequal section positions vs the dense
    oracle on the same positions (interpret mode)."""
    import jax.experimental.pallas as pl
    from qwen_tts_tpu.ops import decode_step as ds

    e = jax.random.normal(jax.random.PRNGKey(2), (CFG.hidden_size,),
                          dtype=jnp.bfloat16)
    # warm the cache 5 positions with standard-equal mrope
    state_o, state_m = init_state(CFG), init_state(CFG)
    for i in range(5):
        mpos = jnp.asarray([i, i, i], jnp.int32)
        state_o, _, _ = decode_step_with_embed(CFG, w, state_o, e, mrope_pos=mpos)
    mpos = jnp.asarray([5, 9, 1], jnp.int32)
    state_o2, tok_o, h_o = decode_step_with_embed(CFG, w, state_o, e,
                                                  mrope_pos=mpos)

    state_m = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x,
                           state_o)
    state_m2, logits, h_m = ds.megakernel_forward.__wrapped__(
        CFG, w, state_m, e, chunk=64, mrope_pos=mpos, interpret=True)
    tok_m = int(jnp.argmax(logits))

    a, b = np.asarray(h_o), np.asarray(h_m)
    cos_sim = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos_sim > 0.999, cos_sim
    assert int(tok_o) == tok_m


ICFG = dataclasses.replace(CFG, mrope_interleaved=True)


def test_interleaved_masks_match_transformers_rule():
    """Section masks for the INTERLEAVED layout must reproduce the public
    Qwen3-Omni rule (transformers modeling_qwen3_omni_moe.py
    `apply_interleaved_mrope`): start from section 0 everywhere, then
    section s ∈ {1, 2} claims indices slice(s, sec[s]*3, 3)."""
    from qwen_tts_tpu.models.decoder import mrope_section_masks

    masks = mrope_section_masks(ICFG)
    d2 = ICFG.head_dim // 2
    secs = ICFG.mrope_section
    sec_of = np.zeros(d2, np.int32)
    for s in (1, 2):
        idx = np.arange(s, secs[s] * 3, 3)
        sec_of[idx] = s
    for s in range(3):
        np.testing.assert_array_equal(np.asarray(masks[s]), sec_of == s)
    # partition: every index in exactly one section
    total = sum(np.asarray(m).astype(int) for m in masks)
    np.testing.assert_array_equal(total, np.ones(d2, int))


def test_interleaved_rows_match_reference(w):
    """mrope_rows with the interleaved layout vs a per-index hand roll."""
    mpos = [5, 11, 2]
    cos, sin = mrope_rows(ICFG, w.rope, jnp.asarray(mpos, jnp.int32), 4)
    c_np = np.asarray(w.rope.cos)
    s_np = np.asarray(w.rope.sin)
    d2 = ICFG.head_dim // 2
    secs = ICFG.mrope_section
    sec_of = np.zeros(d2, np.int32)
    for s in (1, 2):
        sec_of[np.arange(s, secs[s] * 3, 3)] = s
    for t in range(4):
        for j in range(d2):
            p = mpos[sec_of[j]] + t
            assert cos[t, j] == c_np[p, j], (t, j)
            assert sin[t, j] == s_np[p, j], (t, j)


def test_interleaved_equal_reduces_to_standard(w):
    std_cfg = dataclasses.replace(CFG, mrope_section=None)
    e = jax.random.normal(jax.random.PRNGKey(3), (3, CFG.hidden_size),
                          dtype=jnp.bfloat16)
    s1, n1 = forward_chunk(std_cfg, w, init_state(std_cfg), e)
    s2, n2 = forward_chunk(ICFG, w, init_state(ICFG), e,
                           mrope_pos=jnp.asarray([0, 0, 0], jnp.int32))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


@pytest.mark.slow
def test_generate_kernel_interleaved_matches_oracle(w):
    """N-step generate kernel, INTERLEAVED lane select vs the oracle."""
    from qwen_tts_tpu.ops import generate_kernel as gk

    n = 6
    first = jnp.int32(3)
    mp0 = jnp.asarray([2, 9, 17], jnp.int32)

    state_o = init_state(ICFG)
    tok = first
    oracle_tokens = []
    for i in range(n):
        e = w.embed[tok]
        state_o, tok, _ = decode_step_with_embed(
            ICFG, w, state_o, e, mrope_pos=mp0 + i)
        oracle_tokens.append(int(tok))

    state_m, tokens = gk.generate_megakernel.__wrapped__(
        ICFG, w, init_state(ICFG), first, n, chunk=64,
        copy_cache_in=True, mrope_pos0=mp0, interpret=True)
    got = [int(t) for t in np.asarray(tokens)]
    matches = sum(a == b for a, b in zip(oracle_tokens, got))
    assert matches >= n - 1, f"oracle {oracle_tokens} vs kernel {got}"


@pytest.mark.slow
def test_generate_kernel_mrope_matches_oracle(w):
    """N-step generate kernel with M-RoPE deltas vs an oracle loop whose
    section positions advance in lockstep (interpret mode)."""
    import jax.experimental.pallas as pl
    from qwen_tts_tpu.ops import generate_kernel as gk

    n = 8
    first = jnp.int32(3)

    # warm the cache with 5 standard steps so the unequal-section pattern
    # of the generated tokens is observable against the cached keys
    state_w = init_state(CFG)
    tok = jnp.int32(1)
    for i in range(5):
        state_w, tok, _ = decode_step_with_embed(
            CFG, w, state_w, w.embed[tok],
            mrope_pos=jnp.asarray([i, i, i], jnp.int32))
    mp0 = jnp.asarray([5, 11, 19], jnp.int32)

    state_o = state_w
    tok = first
    oracle_tokens = []
    for i in range(n):
        e = w.embed[tok]
        state_o, tok, _ = decode_step_with_embed(
            CFG, w, state_o, e, mrope_pos=mp0 + i)
        oracle_tokens.append(int(tok))

    state_m = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x,
                           state_w)
    state_m, tokens = gk.generate_megakernel.__wrapped__(
        CFG, w, state_m, first, n, chunk=64,
        copy_cache_in=True, mrope_pos0=mp0, interpret=True)
    got = [int(t) for t in np.asarray(tokens)]
    matches = sum(a == b for a, b in zip(oracle_tokens, got))
    assert matches >= n - 1, f"oracle {oracle_tokens} vs kernel {got}"
