"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the (dp, tp) sharded decode compiles, executes, and produces
the same results as the unsharded path — the property that makes TP safe to
turn on (XLA inserts the collectives; reference has no multi-device story,
SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_tts_tpu.core.config import DecoderConfig
from qwen_tts_tpu.core.weights import init_decoder_weights
from qwen_tts_tpu.models.decoder import decode_step, init_state
from qwen_tts_tpu.parallel import sharding as sh
from qwen_tts_tpu.parallel.mesh import make_mesh

CFG = DecoderConfig(
    num_layers=2, hidden_size=256, intermediate_size=512,
    num_q_heads=16, num_kv_heads=8, head_dim=128,
    vocab_size=3072, max_seq_len=64)


@pytest.fixture(scope="module")
def weights():
    return init_decoder_weights(jax.random.PRNGKey(0), CFG)


def test_mesh_shapes():
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=3)


def test_tp_sharded_step_matches_unsharded(weights):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(dp=1, tp=8)

    state = init_state(CFG)
    token = jnp.int32(7)
    state_u, tok_u, hid_u = decode_step(CFG, weights, state, token)

    w_sh = sh.shard_decoder_weights(mesh, weights)
    state_sh = init_state(CFG)
    state_s, tok_s, hid_s = jax.jit(
        lambda w, s, t: decode_step(CFG, w, s, t))(w_sh, state_sh, token)

    assert int(tok_u) == int(tok_s)
    np.testing.assert_allclose(
        np.asarray(hid_u), np.asarray(hid_s), rtol=2e-3, atol=2e-3)


def test_dp_batched_step(weights):
    mesh = make_mesh(dp=2, tp=4)
    from jax.sharding import NamedSharding, PartitionSpec as P

    B = 4
    w_sh = sh.shard_decoder_weights(mesh, weights)
    batched = jax.vmap(lambda s, t: decode_step(CFG, w_sh, s, t))
    states = jax.vmap(lambda _: init_state(CFG))(jnp.arange(B))
    tokens = jnp.asarray([1, 2, 3, 4], dtype=jnp.int32)

    state_sharding = type(states)(
        k_cache=NamedSharding(mesh, P("dp", None, "tp")),
        v_cache=NamedSharding(mesh, P("dp", None, "tp")),
        position=NamedSharding(mesh, P("dp")),
    )
    fn = jax.jit(batched, in_shardings=(state_sharding, NamedSharding(mesh, P("dp"))))
    out_state, out_tokens, out_hidden = fn(states, tokens)
    assert out_tokens.shape == (B,)
    assert out_hidden.shape == (B, CFG.hidden_size)

    # per-element equality with unsharded single steps
    for b in range(B):
        s = init_state(CFG)
        _, tok, hid = decode_step(CFG, weights, s, tokens[b])
        assert int(tok) == int(out_tokens[b])
        # vmap+GSPMD reassociates reductions; allow small drift
        np.testing.assert_allclose(
            np.asarray(hid), np.asarray(out_hidden[b]), rtol=2e-2, atol=2e-2)


def test_quantized_batched_frames_dp_sharded_matches_unsharded():
    """The SERVED quantized tier (int8 weights + int8 KV + quantized CP)
    through the production batched frame path, dp-sharded vs unsharded —
    the multi-chip evidence for the config the engine actually serves
    (bf16-only sharding tests say nothing about it)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qwen_tts_tpu.core.config import tiny_test_config
    from qwen_tts_tpu.core.weights import (
        init_tts_weights,
        quantize_decoder_weights,
    )
    from qwen_tts_tpu.runtime.batch import batched_frames, batched_prefill

    mc = tiny_test_config(max_seq_len=64)
    w = init_tts_weights(jax.random.PRNGKey(0), mc)
    qt = quantize_decoder_weights(w.talker)
    qcp = w.code_predictor._replace(
        decoder=quantize_decoder_weights(w.code_predictor.decoder,
                                         quant_head=False))

    B, h, N = 4, mc.talker.hidden_size, 3
    prefill = jax.random.normal(jax.random.PRNGKey(1), (B, 8, h),
                                dtype=jnp.bfloat16)
    trailing = jax.random.normal(jax.random.PRNGKey(2), (B, 4, h),
                                 dtype=jnp.bfloat16)
    tlen = jnp.full((B,), 4, jnp.int32)
    tidx0 = jnp.zeros((B,), jnp.int32)
    pad = jnp.zeros((h,), jnp.bfloat16)
    rngs = jax.random.split(jax.random.PRNGKey(3), B)

    def run(qt_, qcp_, pre, tr):
        st, tok0, hid0 = batched_prefill(mc.talker, qt_, pre,
                                         kv_dtype=jnp.int8)
        st, codes, valid, tok, hid = batched_frames(
            mc.talker, mc.code_predictor, qt_, qcp_, st, tok0, hid0,
            tr, tlen, tidx0, pad, rngs, num_frames=N)
        return tok0, hid0, codes, valid, st

    tok0_u, hid0_u, codes_u, valid_u, st_u = run(qt, qcp, prefill, trailing)
    assert st_u.k_cache.dtype == jnp.int8

    mesh = make_mesh(dp=4, tp=2)
    repl = NamedSharding(mesh, P())
    qt_s = jax.device_put(qt, repl)          # dp-first ADR: weights replicated
    qcp_s = jax.device_put(qcp, repl)
    pre_s = jax.device_put(prefill, NamedSharding(mesh, P("dp", None, None)))
    tr_s = jax.device_put(trailing, NamedSharding(mesh, P("dp", None, None)))
    tok0_s, hid0_s, codes_s, valid_s, _ = run(qt_s, qcp_s, pre_s, tr_s)

    # GSPMD partitioning reassociates float reductions, so sampled
    # autoregressive trajectories can drift on random weights (the same
    # tolerance scheme as test_batch): prefill outputs must match exactly
    # at the token level with near-identical hiddens, the first frame must
    # agree strongly, and the sharded run must be self-deterministic.
    np.testing.assert_array_equal(np.asarray(tok0_u), np.asarray(tok0_s))
    a, b = np.asarray(hid0_u, np.float64), np.asarray(hid0_s, np.float64)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1) + 1e-9)
    assert (cos > 0.999).all(), cos
    first_agree = (np.asarray(codes_u[:, 0]) ==
                   np.asarray(codes_s[:, 0])).mean()
    assert first_agree >= 0.75, first_agree
    tok0_s2, hid0_s2, codes_s2, _v, _s = run(qt_s, qcp_s, pre_s, tr_s)
    np.testing.assert_array_equal(np.asarray(codes_s), np.asarray(codes_s2))
