"""Vocoder unit tests: shape contract, determinism, save/load round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.vocoder.loader import load_vocoder, save_vocoder
from qwen_tts_tpu.vocoder.model import (
    VocoderConfig,
    init_vocoder_weights,
    vocoder_decode,
)

CFG = VocoderConfig(dim=64, prenet_blocks=1,
                    upsample_factors=(4, 4, 2), upsample_kernels=(8, 8, 4))


def test_decode_shape_and_range():
    w = init_vocoder_weights(jax.random.PRNGKey(0), CFG)
    codes = jax.random.randint(jax.random.PRNGKey(1), (7, 16), 0, 2048)
    wav = vocoder_decode(CFG, w, codes)
    assert wav.shape == (7 * CFG.hop_length,)
    assert CFG.hop_length == 32
    a = np.asarray(wav)
    assert np.abs(a).max() <= 1.0
    assert np.isfinite(a).all()


def test_decode_deterministic_and_code_sensitive():
    w = init_vocoder_weights(jax.random.PRNGKey(0), CFG)
    c1 = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 2048)
    c2 = c1.at[2, 3].set((c1[2, 3] + 1) % 2048)
    w1 = np.asarray(vocoder_decode(CFG, w, c1))
    w1b = np.asarray(vocoder_decode(CFG, w, c1))
    w2 = np.asarray(vocoder_decode(CFG, w, c2))
    assert (w1 == w1b).all()
    assert not (w1 == w2).all()


def test_save_load_roundtrip(tmp_path):
    w = init_vocoder_weights(jax.random.PRNGKey(2), CFG)
    path = os.path.join(tmp_path, "vocoder.safetensors")
    save_vocoder(path, w)
    w2 = load_vocoder(path, CFG)
    assert w2 is not None
    codes = jax.random.randint(jax.random.PRNGKey(3), (3, 16), 0, 2048)
    np.testing.assert_array_equal(
        np.asarray(vocoder_decode(CFG, w, codes)),
        np.asarray(vocoder_decode(CFG, w2, codes)))


def test_load_missing_returns_none(tmp_path):
    assert load_vocoder(os.path.join(tmp_path, "nope.safetensors"), CFG) is None


def test_convert_prefixed_checkpoint(tmp_path):
    """An externally-converted checkpoint with `speech_tokenizer.` prefixes
    loads through the converter path."""
    from safetensors.numpy import save_file
    from qwen_tts_tpu.vocoder.loader import _flatten

    w = init_vocoder_weights(jax.random.PRNGKey(4), CFG)
    flat = {f"speech_tokenizer.{k}": v for k, v in _flatten(w).items()}
    path = os.path.join(tmp_path, "vocoder.safetensors")
    save_file(flat, path)
    w2 = load_vocoder(path, CFG)
    assert w2 is not None
    codes = jax.random.randint(jax.random.PRNGKey(5), (3, 16), 0, 2048)
    np.testing.assert_array_equal(
        np.asarray(vocoder_decode(CFG, w, codes)),
        np.asarray(vocoder_decode(CFG, w2, codes)))


def test_convert_shape_matched_checkpoint(tmp_path):
    """Foreign key names resolve by unique shape; truly ambiguous or
    missing tensors abort to None instead of guessing."""
    from safetensors.numpy import save_file
    from qwen_tts_tpu.vocoder.loader import convert_vocoder_state, _flatten

    w = init_vocoder_weights(jax.random.PRNGKey(6), CFG)
    flat = _flatten(w)
    # rename the uniquely-shaped code-embedding tensor to a foreign name
    foreign = dict(flat)
    foreign["quantizer.embeddings"] = foreign.pop("code_embeds")
    w2 = convert_vocoder_state(foreign, CFG)
    assert w2 is not None
    np.testing.assert_array_equal(
        np.asarray(w2.code_embeds), flat["code_embeds"])

    # dropping a tensor entirely → None
    broken = dict(flat)
    broken.pop("code_embeds")
    assert convert_vocoder_state(broken, CFG) is None

    # wrong shape under an exact key → None
    bad = dict(flat)
    bad["code_embeds"] = bad["code_embeds"][:, :8, :]
    assert convert_vocoder_state(bad, CFG) is None
