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
