"""On-chip agent loop plumbing (demos/demo_local_agent.py) on tiny models.

The demo itself runs the full-size models on the TPU; here the same
`agent_turn` coroutine is driven with the tiny test configs: LM chunks
stream from an executor thread, sentences flush in order, TTS speaks each
one, and the timing fields are populated.
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "demos"))


def test_ids_to_text_groups_sentences():
    import demo_local_agent as agent

    sents = agent.ids_to_text(list(range(25)), words_per_sentence=10)
    assert len(sents) == 3
    assert all(s.endswith(".") for s in sents)
    assert len(sents[0].split()) == 10 and len(sents[2].split()) == 5


def test_encode_prompt_fixed_bucket():
    import demo_local_agent as agent

    short = agent.encode_prompt("hi")
    long = agent.encode_prompt("x" * 500)
    assert len(short) == len(long) == agent.PROMPT_BUCKET


@pytest.mark.slow
def test_agent_turn_tiny_models():
    import asyncio

    import demo_local_agent as agent
    from qwen_tts_tpu.core.config import tiny_test_config
    from qwen_tts_tpu.core.weights import init_decoder_weights
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine
    from qwen_tts_tpu.models.text_lm import TextLM

    from test_text_lm import TINY_LM

    lm = TextLM(init_decoder_weights(jax.random.PRNGKey(0), TINY_LM),
                TINY_LM)
    eng = TTSEngine(
        TTSConfig(max_seq_len=256, vocoder_mode="random", seed=0,
                  trailing_bucket=16, warmup=False),
        model_config=tiny_test_config(max_seq_len=256))
    eng.initialize()

    first_audio, wall, audio_s, spoken = asyncio.run(agent.agent_turn(
        lm, eng, "hello agent", sentences=2, words_per_sentence=4,
        lm_chunk=4))
    assert spoken == 2
    assert first_audio is not None and first_audio > 0
    assert audio_s > 0 and wall > 0
