"""Fully on-chip voice-agent turn: a local Qwen3-0.6B-architecture text LM
streams its reply while the TTS engine speaks completed sentences — both
models resident on ONE TPU chip, dispatches interleaved.

The reference's voice agent (reference: demo_voice_agent.py:159-212)
outsources the LLM to a cloud service through pipecat transports; this is
the TPU-first equivalent that runs live HERE with zero network: the text
LM (models/text_lm.py, same decoder core as the talker) produces reply
tokens chunk-by-chunk (`TextLM.generate_stream`, one fused dispatch per
chunk), a sentence assembler flushes finished sentences into
`TTSEngine.synthesize_streaming`, and speech for sentence k overlaps the
decode of sentences k+1... on the same chip.

Random-init weights produce arbitrary token ids, so reply ids are mapped
onto a pronounceable word list — timing-identical to real text of the same
token count (the engine's byte-level fallback tokenizer sees
equivalent-length content either way).

Per turn it prints: LM prefill+first-sentence latency, TTS first-audio
after the first sentence was ready, total user→first-audio, and the
full-reply wall vs produced audio (agent-turn RTF).

Usage (repo root, solo TPU process):
    python demos/demo_local_agent.py [--turns 2] [--sentences 3]
        [--words-per-sentence 10] [--lm-chunk 16] [--max-seq 1024]
"""
from __future__ import annotations

import argparse
import asyncio
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

# a small pronounceable vocabulary; reply ids index into it
WORDS = ("time flow light sound model stream chip fast audio voice "
         "signal frame token layer cache scale vector tensor phase "
         "wave").split()

USER_TURNS = [
    "What is the weather like today?",
    "Tell me something interesting about TPUs.",
]

PROMPT_BUCKET = 64   # fixed prefill length -> one LM prefill signature


def encode_prompt(text: str) -> list[int]:
    """Byte-encode the user turn, padded/truncated to PROMPT_BUCKET so the
    LM prefill has ONE jit signature across turns (same closed-signature
    discipline as the engine's text bucket)."""
    ids = [ord(c) % 256 for c in text][:PROMPT_BUCKET]
    return ids + [ord(" ")] * (PROMPT_BUCKET - len(ids))


def ids_to_text(ids: list[int], words_per_sentence: int) -> list[str]:
    """Map token ids onto words; group into sentences."""
    words = [WORDS[t % len(WORDS)] for t in ids]
    return [
        " ".join(words[i:i + words_per_sentence]) + "."
        for i in range(0, len(words), words_per_sentence)
    ]


async def agent_turn(lm, eng, user_text: str, *, sentences: int,
                     words_per_sentence: int, lm_chunk: int):
    from qwen_tts_tpu.engine.tokenizer import IM_END

    n_tokens = sentences * words_per_sentence
    prompt_ids = encode_prompt(user_text)

    t0 = time.perf_counter()
    loop = asyncio.get_running_loop()
    queue: asyncio.Queue = asyncio.Queue()

    def produce():
        """LM thread: decode reply chunks, flush finished sentences."""
        buf: list[int] = []
        flushed = 0
        for batch in lm.generate_stream(prompt_ids,
                                        max_new_tokens=n_tokens,
                                        chunk=lm_chunk,
                                        stop_ids=(IM_END,)):
            buf.extend(batch)
            while len(buf) - flushed >= words_per_sentence:
                sent = ids_to_text(
                    buf[flushed:flushed + words_per_sentence],
                    words_per_sentence)[0]
                flushed += words_per_sentence
                loop.call_soon_threadsafe(queue.put_nowait,
                                          (sent, time.perf_counter()))
        if flushed < len(buf):
            sent = ids_to_text(buf[flushed:], words_per_sentence)[0]
            loop.call_soon_threadsafe(queue.put_nowait,
                                      (sent, time.perf_counter()))
        loop.call_soon_threadsafe(queue.put_nowait, None)

    producer = asyncio.get_running_loop().run_in_executor(None, produce)

    first_sentence_t = first_audio_t = None
    audio_samples = 0
    spoken = 0
    while True:
        item = await queue.get()
        if item is None:
            break
        sent, t_ready = item
        if first_sentence_t is None:
            first_sentence_t = t_ready - t0
        async for audio, _sr in eng.synthesize_streaming(sent):
            if first_audio_t is None:
                first_audio_t = time.perf_counter() - t0
            audio_samples += int(np.asarray(audio).shape[0])
        spoken += 1
    await producer
    wall = time.perf_counter() - t0
    audio_s = audio_samples / eng.sample_rate
    print(f"  turn: '{user_text[:40]}...'  sentences={spoken}")
    print(f"    LM first sentence ready  {first_sentence_t * 1e3:8.1f} ms "
          f"({n_tokens} reply tokens total, chunk={lm_chunk})")
    print(f"    user -> first audio      {first_audio_t * 1e3:8.1f} ms")
    print(f"    full reply: {audio_s:.2f} s audio in {wall:.2f} s wall "
          f"(agent-turn RTF {wall / max(audio_s, 1e-9):.3f})")
    return first_audio_t, wall, audio_s, spoken


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2)
    ap.add_argument("--sentences", type=int, default=3)
    ap.add_argument("--words-per-sentence", type=int, default=10)
    ap.add_argument("--lm-chunk", type=int, default=16)
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--quantize", default=None,
                    choices=["int8", "int4", "mixed"])
    args = ap.parse_args()

    from qwen_tts_tpu.core.weights import init_decoder_weights
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine
    from qwen_tts_tpu.models.text_lm import TEXT_LM_CONFIG, TextLM

    print("building text LM (Qwen3-0.6B architecture, random init)...")
    t0 = time.perf_counter()
    lm_w = init_decoder_weights(jax.random.PRNGKey(7), TEXT_LM_CONFIG)
    lm = TextLM(lm_w, TEXT_LM_CONFIG, attn_impl="mega")
    # warm EXACTLY the signatures a timed turn uses: bucketed prefill plus
    # every scan length the chunking produces (incl. the tail chunk)
    n_total = args.sentences * args.words_per_sentence
    list(lm.generate_stream(encode_prompt("warm"), max_new_tokens=n_total,
                            chunk=args.lm_chunk))
    print(f"  LM ready in {time.perf_counter() - t0:.1f} s")

    print("building TTS engine...")
    t0 = time.perf_counter()
    cfg = TTSConfig(max_seq_len=args.max_seq)
    if args.quantize:
        cfg.quantize = args.quantize
        cfg.kv_cache = "int8"
    eng = TTSEngine(cfg)
    eng.initialize()
    print(f"  engine ready in {time.perf_counter() - t0:.1f} s")

    ok = True
    for i in range(args.turns):
        user = USER_TURNS[i % len(USER_TURNS)]
        first_audio, wall, audio_s, spoken = asyncio.run(agent_turn(
            lm, eng, user, sentences=args.sentences,
            words_per_sentence=args.words_per_sentence,
            lm_chunk=args.lm_chunk))
        ok &= (first_audio is not None and audio_s > 0
               and spoken >= args.sentences and wall < audio_s)
    print(f"one chip, two models, zero network -> "
          f"{'PASS' if ok else 'FAIL'}")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
