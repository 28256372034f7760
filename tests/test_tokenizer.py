"""Fallback tokenizer structural contract + prompt formatting."""

import numpy as np

from qwen_tts_tpu.engine.tokenizer import (
    ASSISTANT,
    IM_END,
    IM_START,
    NEWLINE,
    FallbackTokenizer,
    encode_tts_prompt,
)


def test_prompt_structure():
    """role(3) + content + 5 trailing format tokens
    (reference: tts_engine.py:256-260)."""
    tok = FallbackTokenizer()
    ids = encode_tts_prompt(tok, "hi")
    assert list(ids[:3]) == [IM_START, ASSISTANT, NEWLINE]
    assert list(ids[-5:]) == [IM_END, NEWLINE, IM_START, ASSISTANT, NEWLINE]
    content = ids[3:]
    assert len(content) == 2 + 5                    # 'h', 'i' + 5 trailing
    assert ids.dtype == np.int32


def test_roundtrip_text():
    tok = FallbackTokenizer()
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"


def test_specials_not_split():
    tok = FallbackTokenizer()
    ids = tok.encode("<|im_start|>assistant\n")
    assert ids == [IM_START, ASSISTANT, NEWLINE]


def test_utf8_content():
    tok = FallbackTokenizer()
    ids = tok.encode("héllo")
    assert tok.decode(ids) == "héllo"
    assert all(i < 152000 for i in ids)
