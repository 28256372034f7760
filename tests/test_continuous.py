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
    orig = b._chunk_call

    def counting(n):
        calls["n"] += 1
        return orig(n)

    b._chunk_call = counting
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


# ── round-5: fast admission + fused code2wav (VERDICT r4 items 1 & 3) ──────


def test_fast_admission_first_chunk_is_small(eng):
    """The dispatch right after an admission is `admit_chunk_frames`
    frames: a fresh request's FIRST audio chunk is small (low latency),
    later chunks are full-size — the batched first-chunk-at-1-frame."""
    b = ContinuousBatcher(eng, slots=2, chunk_frames=4, admit_chunk_frames=2)
    hop = eng.vocoder_config.hop_length

    async def one():
        sizes = []
        async for a, _sr in b.submit("a long enough utterance to stream "
                                     "several chunks of audio frames"):
            sizes.append(len(a) // hop)
        return sizes

    sizes = asyncio.run(one())
    assert sizes[0] == 2, f"first chunk {sizes[0]} frames, want 2"
    assert max(sizes) == 4, "steady chunks must be full-size"
    assert sum(sizes) > 2


def test_fast_admission_disabled(eng):
    """admit_chunk_frames=0 restores single-size dispatching."""
    b = ContinuousBatcher(eng, slots=1, chunk_frames=4, admit_chunk_frames=0)
    hop = eng.vocoder_config.hop_length

    async def one():
        sizes = []
        async for a, _sr in b.submit("hello with no fast admission path"):
            sizes.append(len(a) // hop)
        return sizes

    sizes = asyncio.run(one())
    assert sizes[0] == 4


def test_fast_admission_mid_stream_other_slots_unaffected(eng):
    """A small chunk dispatched for a late arrival also advances the
    already-streaming slot by the small amount; totals still line up and
    both requests complete with finite audio."""
    b = ContinuousBatcher(eng, slots=2, chunk_frames=4, admit_chunk_frames=2)

    async def staggered():
        first_parts, second_parts = [], []

        async def first():
            async for a, _ in b.submit("the first long utterance keeps "
                                       "going while a new caller arrives"):
                first_parts.append(a)

        async def second():
            await asyncio.sleep(0.05)    # arrive mid-stream of first
            async for a, _ in b.submit("late arrival"):
                second_parts.append(a)

        await asyncio.gather(first(), second())
        return first_parts, second_parts

    f, s = asyncio.run(staggered())
    assert f and s
    assert np.isfinite(np.concatenate(f)).all()
    assert np.isfinite(np.concatenate(s)).all()


def _c2w_engine():
    from qwen_tts_tpu.vocoder.code2wav import Code2WavConfig

    # tiny code2wav so the conv stack compiles fast on CPU
    c2c = Code2WavConfig(hidden_size=64, num_attention_heads=4,
                         num_key_value_heads=2, intermediate_size=128,
                         num_hidden_layers=2, decoder_dim=64,
                         codebook_size=64, num_quantizers=16)
    return make_engine(vocoder_backend="code2wav", code2wav_config=c2c,
                       code2wav_impl="reference")


def test_code2wav_fused_matches_host_decode():
    """The fused per-slot code2wav audio (one dispatch per chunk for all
    slots) must equal the engine's host-side left-context chunk decode on
    the same codes: first chunk via the utterance-start form, later
    chunks decoded against the previous chunk's codes (gapless)."""
    eng = _c2w_engine()
    b = ContinuousBatcher(eng, slots=1, chunk_frames=4, admit_chunk_frames=2)
    recorded = []
    orig = b._chunk_call

    def recording(n):
        out = orig(n)
        recorded.append((n, out[1]))      # (chunk size, codes [B, n, 16])
        return out

    b._chunk_call = recording
    (wav, _sr), = b.serve(["fused vocoder parity check text"])
    hop = eng.vocoder_config.hop_length

    # host reference decode over the recorded per-dispatch codes, engine
    # left-context semantics (tts_engine._load_code2wav frames_decode)
    parts, prev = [], None
    produced = 0
    want_frames = len(wav) // hop
    for n, codes in recorded:
        if produced >= want_frames:
            break                          # speculative drain chunk
        c = np.asarray(codes[0])
        take = min(n, want_frames - produced)
        full = np.asarray(eng._voc_ctx_jit(eng.vocoder_weights,
                                           c, prev)
                          if prev is not None else
                          eng._voc_frames_decode(eng.vocoder_weights, c))
        parts.append(full[: take * hop])
        produced += take
        prev = c
    host = np.concatenate(parts)[: len(wav)]
    np.testing.assert_allclose(wav, host, atol=2e-4, rtol=1e-3)


def test_code2wav_second_occupant_never_sees_predecessors_ctx():
    """A request admitted into a just-freed slot must decode its first
    chunk with the utterance-start form, NOT against the previous
    occupant's codes — its audio equals a solo run on a fresh batcher
    with the same rng state."""
    eng2 = _c2w_engine()
    b2 = ContinuousBatcher(eng2, slots=1, chunk_frames=4,
                           admit_chunk_frames=2)
    served = b2.serve(["first occupant speaks", "second occupant text"])

    eng3 = _c2w_engine()
    eng3._rng, _ = jax.random.split(eng3._rng)  # consume occupant 1's split
    b3 = ContinuousBatcher(eng3, slots=1, chunk_frames=4,
                           admit_chunk_frames=2)
    solo = b3.serve(["second occupant text"])
    np.testing.assert_array_equal(served[1][0], solo[0][0])


def test_warm_compiles_all_signatures_then_serves_clean(eng):
    """warm() pre-compiles every (chunk size × ctx shape) signature and
    re-parks; traffic afterwards compiles nothing new."""
    b = ContinuousBatcher(eng, slots=2, chunk_frames=4, admit_chunk_frames=2)
    b.warm()
    b.serve(["after warm, admission-path signatures"])  # admit/insert warm

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
        b.serve(["clean traffic one", "and a second staggered text"])
    finally:
        logging.getLogger("jax._src.interpreters.pxla").removeHandler(h)
        jax.config.update("jax_log_compiles", orig)
    assert not compiled, f"mid-serving compiles after warm(): {compiled}"


def test_dispatch_loop_failure_propagates_to_waiters(eng):
    """If the dispatch loop dies (device fault, kernel bug), every waiting
    submit() is woken and the first-audio waiter gets the error instead of
    hanging forever; the batcher recovers on the next request."""
    b = ContinuousBatcher(eng, slots=1)
    boom = RuntimeError("simulated device fault")
    orig = b._chunk_call

    def exploding(n):
        raise boom

    b._chunk_call = exploding

    async def drive():
        with pytest.raises(RuntimeError) as ei:
            async for _a, _sr in b.submit("this request hits the fault"):
                pass
        assert ei.value.__cause__ is boom
        # loop restarted clean on the next request
        b._chunk_call = orig
        return [a async for a, _ in b.submit("recovery request")]

    parts = asyncio.run(drive())
    assert parts and b.active == 0
