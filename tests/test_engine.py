"""End-to-end engine tests on the tiny config (CPU): frame generation,
streaming chunking semantics, vocoder decode, metrics.

Covers the reference's e2e surface (reference: test_e2e.py:125-279) at unit
scale — something the reference could never do off-GPU.
"""

import asyncio

import numpy as np
import pytest

from qwen_tts_tpu.core.config import NUM_CODE_GROUPS
from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine


@pytest.fixture(scope="module")
def engine(request):
    tiny = __import__("qwen_tts_tpu.core.config", fromlist=["tiny_test_config"])
    mc = tiny.tiny_test_config(max_seq_len=256)
    cfg = TTSConfig(max_seq_len=256, chunk_frames=4, seed=0)
    eng = TTSEngine(cfg, model_config=mc)
    eng.initialize()
    return eng


def test_generate_codec_frames_shapes(engine):
    frames = list(engine._generate_codec_frames("hello world test"))
    assert len(frames) >= 1
    for f in frames:
        assert f.shape == (NUM_CODE_GROUPS,)
        assert f.dtype == np.int32
        assert (f >= 0).all()
        assert f[0] < 3072 and (f[1:] < 2048).all()


def test_synthesize_nonstreaming(engine):
    wav, sr = engine.synthesize("short test")
    assert sr == engine.sample_rate
    assert wav.dtype == np.float32
    # hop_length samples per frame
    hop = engine.vocoder_config.hop_length
    assert len(wav) % hop == 0 and len(wav) > 0
    assert np.abs(wav).max() <= 1.0


def test_synthesize_streaming_chunking(engine):
    async def collect():
        chunks = []
        async for audio, sr in engine.synthesize_streaming("hello world streaming test"):
            chunks.append((audio, sr))
        return chunks

    chunks = asyncio.run(collect())
    assert len(chunks) >= 2
    hop = engine.vocoder_config.hop_length
    # first-chunk-at-1-frame semantics (reference: tts_engine.py:233-235)
    assert len(chunks[0][0]) == 1 * hop
    # middle chunks are chunk_frames long
    if len(chunks) > 2:
        assert len(chunks[1][0]) == engine.config.chunk_frames * hop


def test_streaming_equals_nonstreaming_frames(engine):
    """Same seed ⇒ streaming and non-streaming produce identical codec
    streams (the audio differs only by vocoder chunk boundaries)."""
    engine._rng = __import__("jax").random.PRNGKey(123)
    frames_a = [f.copy() for f in engine._generate_codec_frames("same text")]
    engine._rng = __import__("jax").random.PRNGKey(123)
    frames_b = [f.copy() for f in engine._generate_codec_frames("same text")]
    assert len(frames_a) == len(frames_b)
    for a, b in zip(frames_a, frames_b):
        assert (a == b).all()


def test_metrics(engine):
    engine.synthesize("metrics check")
    m = engine.get_metrics()
    assert m["sample_rate"] == engine.sample_rate
    assert m["frames_generated"] >= 1
    assert m["position"] > 0


def test_chunk_boundary_invariance(engine):
    """Streaming chunking (1+10+...) and non-streaming (10+...) must produce
    identical codec frames for the same seed — the per-frame rng is keyed on
    the absolute frame index."""
    import jax

    engine._rng = jax.random.PRNGKey(77)
    a = [f for ch in engine._generate_codec_chunks("invariance check text", first_chunk=1,
                                                   chunk_size=4) for f in ch]
    engine._rng = jax.random.PRNGKey(77)
    b = [f for ch in engine._generate_codec_chunks("invariance check text", first_chunk=4,
                                                   chunk_size=4) for f in ch]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert (x == y).all()


def test_frames_chunk_eos_mask(tiny_cfg, tiny_weights):
    """A chunk beginning at CODEC_EOS must mark every frame invalid
    (reference EOS check: tts_engine.py:302-303)."""
    import jax
    import jax.numpy as jnp
    from qwen_tts_tpu.core.config import CODEC_EOS
    from qwen_tts_tpu.models.decoder import init_state
    from qwen_tts_tpu.runtime.frame_loop import frames_chunk

    mc = tiny_cfg
    state = init_state(mc.talker)
    h = mc.talker.hidden_size
    state, codes, valid, tok, hid = frames_chunk(
        mc.talker, mc.code_predictor,
        tiny_weights.talker, tiny_weights.code_predictor,
        state, jnp.int32(CODEC_EOS),
        jnp.zeros((h,), jnp.float32),
        jnp.zeros((8, h), jnp.bfloat16), jnp.int32(0), jnp.int32(0),
        jnp.zeros((h,), jnp.bfloat16), jax.random.PRNGKey(0),
        num_frames=3, do_sample=False)
    import numpy as np
    assert not np.asarray(valid).any()


def test_quantize_knob_inert_on_cpu(tiny_cfg):
    """quantize=True only activates with the mega backend; on CPU (dense)
    the engine must still initialize and synthesize."""
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    eng = TTSEngine(TTSConfig(max_seq_len=128, chunk_frames=4, quantize=True),
                    model_config=tiny_cfg)
    eng.initialize()
    wav, sr = eng.synthesize("quantize knob check")
    assert len(wav) > 0
