"""Incoherence processing (core/incoherence.py): the folded rotations must
leave the model FUNCTION unchanged (same logits up to bf16 re-rounding of
the folded weights) while actually gaussianizing the weight entries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_tts_tpu.core.config import CODEC_BOS, DecoderConfig
from qwen_tts_tpu.core.incoherence import (
    incoherent_decoder_weights,
    random_orthogonal,
)
from qwen_tts_tpu.core.weights import init_decoder_weights

CFG = DecoderConfig(
    num_layers=2, hidden_size=256, intermediate_size=512,
    num_q_heads=4, num_kv_heads=2, head_dim=128,
    vocab_size=512, max_seq_len=64)


def test_random_orthogonal_is_orthogonal():
    for n in (128, 256, 100):     # powers of two (Hadamard) + QR fallback
        q = random_orthogonal(jax.random.PRNGKey(0), n)
        np.testing.assert_allclose(q @ q.T, np.eye(n), atol=1e-4)


def _greedy_logits(cfg, w, steps=12):
    from qwen_tts_tpu.models import decoder as oracle
    from qwen_tts_tpu.models.decoder import init_state

    @jax.jit
    def step(w, st, e):
        st, normed = oracle.forward_chunk(cfg, w, st, e[None])
        return st, oracle.lm_head_logits(w, normed)[0]

    st, tok, out = init_state(cfg), CODEC_BOS % cfg.vocab_size, []
    for _ in range(steps):
        st, logits = step(w, st, w.embed[tok])
        logits = np.asarray(logits, np.float64)
        out.append(logits)
        tok = int(np.argmax(logits))
    return np.stack(out)


@pytest.mark.parametrize("rotate_vo", [False, True])
def test_transform_preserves_function(rotate_vo):
    w = init_decoder_weights(jax.random.PRNGKey(0), CFG)
    wi = incoherent_decoder_weights(w, jax.random.PRNGKey(7), CFG,
                                    rotate_vo=rotate_vo)
    lo = _greedy_logits(CFG, w)
    li = _greedy_logits(CFG, wi)
    # bf16 re-rounding of folded weights bounds the drift; the greedy
    # trajectory itself must not diverge at this scale
    cos = np.sum(lo * li, -1) / (np.linalg.norm(lo, axis=-1)
                                 * np.linalg.norm(li, axis=-1) + 1e-12)
    assert (cos > 0.995).all(), cos
    assert (lo.argmax(-1) == li.argmax(-1)).mean() >= 0.9


def test_transform_gaussianizes_heavy_tails():
    """A matrix with planted outlier rows / heavy tails must come out with
    materially smaller excess kurtosis and group-max concentration."""
    w = init_decoder_weights(jax.random.PRNGKey(0), CFG)
    # plant LLM.int8()-style outlier input rows in wqkv
    lw = w.layers
    wq = np.asarray(lw.wqkv, np.float32)
    wq[:, ::97, :] *= 12.0
    w = w._replace(layers=lw._replace(wqkv=jnp.asarray(wq, lw.wqkv.dtype)))
    wi = incoherent_decoder_weights(w, jax.random.PRNGKey(7), CFG)

    def kurt(x):
        x = np.asarray(x, np.float64).ravel()
        x = (x - x.mean()) / (x.std() + 1e-12)
        return float((x ** 4).mean() - 3.0)

    k_before = kurt(w.layers.wqkv)
    k_after = kurt(wi.layers.wqkv)
    assert k_after < k_before / 4, (k_before, k_after)

    # group-scale inflation proxy: mean over (group, col) of absmax/rms
    def group_ratio(x, g=128):
        x = np.asarray(x, np.float64)
        L, n_in, n_out = x.shape
        xg = x.reshape(L, n_in // g, g, n_out)
        return float((np.abs(xg).max(2) /
                      (np.sqrt((xg ** 2).mean(2)) + 1e-12)).mean())

    assert group_ratio(wi.layers.wqkv) < group_ratio(w.layers.wqkv)
