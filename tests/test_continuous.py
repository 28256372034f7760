"""Continuous batching (runtime/continuous.py): staggered admission into
fixed slots, EOS/cap slot release + reuse, determinism, cancellation, and
the closed-signature contract (no recompiles once warm)."""

import asyncio

import jax
import numpy as np
import pytest

from qwen_tts_tpu.core.config import tiny_test_config
from qwen_tts_tpu.runtime.continuous import ContinuousBatcher


def make_engine(**kw):
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    cfg = TTSConfig(max_seq_len=256, chunk_frames=4, seed=0,
                    backend="dense", **kw)
    eng = TTSEngine(cfg, model_config=tiny_test_config(max_seq_len=256))
    eng.initialize()
    return eng


@pytest.fixture(scope="module")
def eng():
    return make_engine()


def test_serve_more_requests_than_slots(eng):
    """5 texts through 2 slots: every request completes with finite,
    hop-aligned audio, so slots are recycled across admissions."""
    b = ContinuousBatcher(eng, slots=2)
    texts = ["hello continuous batching", "a second utterance",
             "third one here", "the fourth text", "and a fifth"]
    results = b.serve(texts)
    assert len(results) == len(texts)
    hop = eng.vocoder_config.hop_length
    for wav, sr in results:
        assert sr == eng.sample_rate
        assert len(wav) > 0 and len(wav) % hop == 0
        assert np.isfinite(wav).all()
    assert b.active == 0 and not b._pending


def test_staggered_admission_interleaves(eng):
    """A request submitted while another is mid-stream joins a free slot
    and both finish — the core continuous property static batching lacks."""
    b = ContinuousBatcher(eng, slots=2)

    async def staggered():
        first_chunks, second_chunks = [], []

        async def first():
            async for a, _ in b.submit("the first somewhat longer request "
                                       "keeps its slot busy for a while"):
                first_chunks.append(a)

        async def second():
            await asyncio.sleep(0)     # let first() start
            async for a, _ in b.submit("short reply"):
                second_chunks.append(a)

        await asyncio.gather(first(), second())
        return first_chunks, second_chunks

    f, s = asyncio.run(staggered())
    assert f and s
    assert all(np.isfinite(np.concatenate(f))) \
        and all(np.isfinite(np.concatenate(s)))


def test_deterministic_given_engine_rng(eng):
    """Two batchers over engines with the same seed produce identical
    audio for the same request stream (per-request rng is split from the
    engine rng at admission)."""
    w1 = ContinuousBatcher(make_engine(), slots=2).serve(["same text"])
    w2 = ContinuousBatcher(make_engine(), slots=2).serve(["same text"])
    np.testing.assert_array_equal(w1[0][0], w2[0][0])


def test_cancellation_frees_slot(eng):
    """aclose() after the first chunk marks the request cancelled; its
    slot frees at the next chunk boundary and a later request still runs."""
    b = ContinuousBatcher(eng, slots=1)

    async def cancel_then_reuse():
        agen = b.submit("a long text that would stream for many chunks "
                        "if nobody cancelled it midway through")
        async for _a, _sr in agen:
            break
        await agen.aclose()
        parts = [a async for a, _ in b.submit("short follow up")]
        return parts

    parts = asyncio.run(cancel_then_reuse())
    assert parts and b.active == 0


def test_cap_bounds_frames(eng):
    """A one-word text caps at the duration heuristic's floor: emitted
    frames never exceed the cap even though chunks are fixed-size."""
    b = ContinuousBatcher(eng, slots=1, chunk_frames=4)
    (wav, _sr), = b.serve(["hi"])
    hop = eng.vocoder_config.hop_length
    assert len(wav) // hop <= 25   # cap floor (~2 s at 12.5 Hz)


def test_closed_signature_set(eng):
    """Once one request has fully run, serving MORE traffic (staggered,
    different text lengths within the bucket) compiles nothing new —
    the production no-mid-serving-compile contract."""
    b = ContinuousBatcher(eng, slots=2)
    b.serve(["warm the three signatures"])

    compiled = []
    orig = jax.config.jax_log_compiles
    jax.config.update("jax_log_compiles", True)
    import logging

    class Grab(logging.Handler):
        def emit(self, record):
            compiled.append(record.getMessage())

    h = Grab()
    logging.getLogger("jax._src.interpreters.pxla").addHandler(h)
    try:
        b.serve(["one more text", "and another somewhat longer one",
                 "plus a third"])
    finally:
        logging.getLogger("jax._src.interpreters.pxla").removeHandler(h)
        jax.config.update("jax_log_compiles", orig)
    assert not compiled, f"mid-serving compiles: {compiled}"


def test_speculation_budget_and_owner_isolation(eng):
    """Depth-2 pipelining: a single request costs at most
    ceil(frames/chunk) + 1 chunk dispatches (one speculative chunk at
    drain), and a request admitted into a just-freed slot never receives
    the previous occupant's speculative frames (first_seq guard) — its
    audio is identical to a solo run."""
    b = ContinuousBatcher(eng, slots=1, chunk_frames=4)
    calls = {"n": 0}
    orig = b._chunk_fn

    def counting():
        calls["n"] += 1
        return orig()

    b._chunk_fn = counting
    (wav, _), = b.serve(["hi"])
    hop = eng.vocoder_config.hop_length
    n_chunks = -(-len(wav) // (hop * b.chunk))
    assert calls["n"] <= n_chunks + 1, \
        f"{calls['n']} dispatches for {n_chunks} chunks of audio"

    # back-to-back reuse of the single slot: the second request's audio
    # must match a fresh batcher serving it alone with the same rng state
    eng2 = make_engine()
    b2 = ContinuousBatcher(eng2, slots=1, chunk_frames=4)
    served = b2.serve(["first occupant speaks", "second occupant text"])
    eng3 = make_engine()
    eng3._rng, _ = jax.random.split(eng3._rng)  # consume occupant 1's split
    b3 = ContinuousBatcher(eng3, slots=1, chunk_frames=4)
    solo = b3.serve(["second occupant text"])
    np.testing.assert_array_equal(served[1][0], solo[0][0])


def test_repark_before_ring_boundary(eng):
    """An idle slot's position mirror is refreshed before it can reach
    max_seq_len (the static-shape hazard the docstring calls out)."""
    b = ContinuousBatcher(eng, slots=2, chunk_frames=4)
    # drive many chunks through slot 0 while slot 1 idles
    texts = [f"text number {i} padded with words" for i in range(6)]
    b.serve(texts)
    limit = b._cfg.max_seq_len
    assert all(p + 2 * b.chunk + 16 < limit + b.chunk for p in b._pos)
