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


@pytest.mark.slow
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


@pytest.mark.slow
def test_quantize_dense_path(tiny_cfg):
    """quantize=True on the CPU dense backend runs the quant-aware
    dequant-on-the-fly paths end to end (round 3: quantization is no longer
    mega-only — prefills and steps all consume the single int8 copy)."""
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    eng = TTSEngine(TTSConfig(max_seq_len=128, chunk_frames=4, quantize=True),
                    model_config=tiny_cfg)
    eng.initialize()
    # exactly one (quantized) talker weight copy is resident
    assert hasattr(eng.weights.talker.layers, "wqkv_q")
    assert eng.weights.talker.lm_head.dtype.name == "int8"
    wav, sr = eng.synthesize("quantize knob check")
    assert len(wav) > 0


@pytest.mark.slow
def test_cp_int4_dense_path(tiny_cfg):
    """cp_quantize="int4": the code predictor serves from group-wise int4
    decoder matrices through the same quant-aware dense path (quality
    evidence recorded via validate_kernel --backend cp-int4)."""
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    eng = TTSEngine(TTSConfig(max_seq_len=128, chunk_frames=4,
                              quantize="int4", cp_quantize="int4"),
                    model_config=tiny_cfg)
    eng.initialize()
    cp_layers = eng.weights.code_predictor.decoder.layers
    assert hasattr(cp_layers, "wqkv_q")
    # int4 marker: packed nibbles halve the stored in-dim
    assert cp_layers.wqkv_q.shape[1] * 2 == eng.model_config.code_predictor.hidden_size
    wav, sr = eng.synthesize("cp int4 knob check")
    assert len(wav) > 0


@pytest.mark.slow
def test_quantize_mixed_dense_path(tiny_cfg):
    """quantize="mixed": int8 attention + packed-int4 MLP through the same
    quant-aware serving path (prefills AND steps on one weight copy)."""
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    eng = TTSEngine(TTSConfig(max_seq_len=128, chunk_frames=4,
                              quantize="mixed"),
                    model_config=tiny_cfg)
    eng.initialize()
    tl = eng.weights.talker.layers
    h = eng.model_config.talker.hidden_size
    assert tl.wqkv_q.shape[1] == h                # attention: int8 rows
    assert tl.w_gate_up_q.shape[1] * 2 == h       # MLP: packed nibbles
    wav, sr = eng.synthesize("mixed tier knob check")
    assert len(wav) > 0


@pytest.mark.slow
def test_cp_mixed_dense_path(tiny_cfg):
    """cp_quantize="mixed": the code predictor serves int8-attention +
    packed-int4-MLP decoder matrices through the quant-aware dense path
    (quality evidence recorded via validate_kernel --backend cp-mixed)."""
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    eng = TTSEngine(TTSConfig(max_seq_len=128, chunk_frames=4,
                              quantize="mixed", cp_quantize="mixed"),
                    model_config=tiny_cfg)
    eng.initialize()
    cp_layers = eng.weights.code_predictor.decoder.layers
    h = eng.model_config.code_predictor.hidden_size
    assert cp_layers.wqkv_q.shape[1] == h             # attention: int8 rows
    assert cp_layers.w_gate_up_q.shape[1] * 2 == h    # MLP: packed nibbles
    wav, sr = eng.synthesize("cp mixed knob check")
    assert len(wav) > 0


@pytest.mark.slow
def test_mrope_engine_bit_identical_to_standard(tiny_cfg):
    """Text-only M-RoPE (zero per-section deltas — the real Qwen3-TTS decode
    scheme) must produce BIT-identical codec frames to standard RoPE: the
    engine threads live position streams through every step, and equal
    section positions reproduce the standard rotation exactly."""
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    text = "the quick brown fox jumps over the lazy dog again"
    frames = {}
    for mrope in (False, True):
        eng = TTSEngine(
            TTSConfig(max_seq_len=128, chunk_frames=4, seed=0, mrope=mrope,
                      fused_chunks=False, vocoder_mode="silence"),
            model_config=tiny_cfg)
        eng.initialize()
        frames[mrope] = list(eng._generate_codec_frames(text))
    assert len(frames[True]) == len(frames[False]) > 0
    for a, b in zip(frames[True], frames[False]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_mrope_deltas_are_live(tiny_cfg):
    """Nonzero per-section deltas must CHANGE generation — proves the
    engine's M-RoPE plumbing reaches the attention math (not dead config)."""
    import jax.numpy as jnp
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    text = "some words to speak aloud for this check"
    eng = TTSEngine(
        TTSConfig(max_seq_len=128, chunk_frames=4, seed=0, mrope=True,
                  fused_chunks=False, vocoder_mode="silence"),
        model_config=tiny_cfg)
    eng.initialize()
    base = list(eng._generate_codec_frames(text))
    eng._mrope_deltas = jnp.asarray([0, 64, 128], jnp.int32)
    shifted = list(eng._generate_codec_frames(text))
    assert any(not np.array_equal(a, b) for a, b in zip(base, shifted))


def test_engine_stops_on_eos_before_cap(tiny_cfg, monkeypatch):
    """EOS is the PRIMARY stop; the word-count cap is a fallback
    (VERDICT r2 #2 — the reference can only cap, README.md:204-208).
    Force CODEC_EOS at frame 3 and check generation halts there, far
    below the cap."""
    import jax.numpy as jnp
    import qwen_tts_tpu.engine.tts_engine as te
    from qwen_tts_tpu.core.config import CODEC_EOS
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    real = te.frame_step
    n_calls = {"n": 0}

    def eos_at_3(*a, **k):
        r = real(*a, **k)
        n_calls["n"] += 1
        if n_calls["n"] >= 3:
            r = r._replace(next_token=jnp.int32(CODEC_EOS))
        return r

    eng = TTSEngine(
        TTSConfig(max_seq_len=128, chunk_frames=4, seed=0,
                  fused_chunks=False, vocoder_mode="silence"),
        model_config=tiny_cfg)
    eng.initialize()                          # warmup uses the real step
    monkeypatch.setattr(te, "frame_step", eos_at_3)
    text = " ".join(["word"] * 20)            # cap = 20/2.5*12.5*2 = 200 → 25+
    word_cap = max(int(20 / 2.5 * 12.5 * 2.0), 25)
    frames = list(eng._generate_codec_frames(text))
    assert len(frames) == 3, f"stopped at {len(frames)}, want EOS at 3"
    assert len(frames) < word_cap


@pytest.fixture(scope="module")
def c2w_engine():
    """Engine with the Code2Wav (real-architecture) vocoder backend on a
    tiny Code2WavConfig."""
    import jax
    from qwen_tts_tpu.core.config import tiny_test_config
    from qwen_tts_tpu.vocoder.code2wav import Code2WavConfig

    c2c = Code2WavConfig(
        codebook_size=2048, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, sliding_window=8, intermediate_size=96,
        num_hidden_layers=2, num_quantizers=16,
        upsample_rates=(4, 3), upsampling_ratios=(2,), decoder_dim=32)
    mc = tiny_test_config(max_seq_len=256)
    cfg = TTSConfig(max_seq_len=256, chunk_frames=4, seed=0,
                    vocoder_backend="code2wav", code2wav_config=c2c)
    eng = TTSEngine(cfg, model_config=mc)
    eng.initialize()
    return eng


@pytest.mark.slow
def test_code2wav_streaming_chunk_lengths(c2w_engine):
    """Streaming with the code2wav backend: first chunk = 1*hop (front-padded
    by the conv-trim deficit), every full chunk exactly chunk_frames*hop —
    gapless, unlike upstream chunked_decode's per-chunk sample holes."""
    eng = c2w_engine
    hop = eng.vocoder_config.hop_length

    async def collect():
        return [a async for a, _ in eng.synthesize_streaming(
            "hello code2wav streaming test")]

    chunks = asyncio.run(collect())
    assert len(chunks) >= 2
    assert len(chunks[0]) == 1 * hop
    for c in chunks[1:-1]:
        assert len(c) == eng.config.chunk_frames * hop


@pytest.mark.slow
def test_code2wav_streaming_matches_manual_chunked(c2w_engine):
    """Each streamed chunk must equal a manual re-decode of
    [prev-chunk codes; this chunk's codes] sliced at ctx*hop - deficit —
    i.e. the engine's fused ctx threading and slicing are exactly the
    documented chunked-decode semantics."""
    import jax
    import jax.numpy as jnp
    # the engine's default code2wav_impl is "packed" — the manual
    # re-decode must use the same (parity-tested) packed apply
    from qwen_tts_tpu.vocoder.code2wav_fast import (
        code2wav_apply_packed as code2wav_apply,
    )

    eng = c2w_engine
    c2c = eng.vocoder_config
    hop, deficit = c2c.hop_length, c2c.output_deficit

    eng._rng = jax.random.PRNGKey(5)
    chunks = list(eng._generate_audio_chunks(
        "deterministic stream compare", eng.config.chunk_frames))
    assert len(chunks) >= 3
    prev_frames = None
    # the terminal chunk may be partial (EOS/cap inside it) — it re-decodes
    # exact-length via _decode_to_audio, a different (also correct) path
    for audio, frames in chunks[:-1]:
        # the engine clips codes to the codebook (talker specials >= 2048)
        codes = np.stack(frames).clip(0, c2c.codebook_size - 1)
        if prev_frames is None:
            ref = np.asarray(code2wav_apply(
                c2c, eng.vocoder_weights,
                jnp.asarray(codes.T[None], jnp.int32)))[0]
            ref = np.concatenate([np.zeros(deficit, np.float32), ref])
        else:
            ctx = np.stack(prev_frames)
            both = np.concatenate([ctx, codes])
            wav = np.asarray(code2wav_apply(
                c2c, eng.vocoder_weights,
                jnp.asarray(both.T[None], jnp.int32)))[0]
            off = len(ctx) * hop - deficit
            ref = wav[off: off + len(codes) * hop]
        if len(audio) != len(ref):
            break  # terminal partial chunk re-decodes via _decode_to_audio
        np.testing.assert_allclose(audio, ref, rtol=2e-4, atol=2e-5)
        prev_frames = codes  # already clipped


@pytest.mark.slow
def test_code2wav_custom_chunk_stream_gapless(c2w_engine):
    """Non-default chunk_frames must still decode with left context (the
    fused fast path only covers the configured chunk size): each streamed
    chunk equals the manual [prev; cur] decode sliced at ctx*hop - deficit."""
    import jax
    import jax.numpy as jnp
    # the engine's default code2wav_impl is "packed" — the manual
    # re-decode must use the same (parity-tested) packed apply
    from qwen_tts_tpu.vocoder.code2wav_fast import (
        code2wav_apply_packed as code2wav_apply,
    )

    eng = c2w_engine
    c2c = eng.vocoder_config
    hop, deficit = c2c.hop_length, c2c.output_deficit
    cs = 3
    assert cs != eng.config.chunk_frames
    text = "custom chunk size gapless check"

    eng._rng = jax.random.PRNGKey(11)
    code_chunks = [np.stack(c) for c in eng._generate_codec_chunks(
        text, first_chunk=1, chunk_size=cs) if c]

    async def collect():
        eng._rng = jax.random.PRNGKey(11)
        return [a async for a, _ in eng.synthesize_streaming(
            text, chunk_frames=cs)]

    audio_chunks = asyncio.run(collect())
    assert len(audio_chunks) == len(code_chunks) >= 2
    assert len(audio_chunks[0]) == len(code_chunks[0]) * hop

    prev = None
    for audio, codes in zip(audio_chunks, code_chunks):
        n = len(codes)
        assert len(audio) == n * hop
        cl = codes.clip(0, c2c.codebook_size - 1)
        if prev is None:
            ref = np.asarray(code2wav_apply(
                c2c, eng.vocoder_weights, jnp.asarray(cl.T[None], jnp.int32)))[0]
            ref = np.concatenate([np.zeros(deficit, np.float32), ref])
        else:
            dec = cl
            if n < cs:   # engine repeat-pads the terminal partial chunk to
                         # the fixed signature, then slices n*hop samples
                pad = np.broadcast_to(dec[-1], (cs - n, dec.shape[1]))
                dec = np.concatenate([dec, pad])
            both = np.concatenate([prev, dec])
            wav = np.asarray(code2wav_apply(
                c2c, eng.vocoder_weights,
                jnp.asarray(both.T[None], jnp.int32)))[0]
            off = len(prev) * hop - deficit
            ref = wav[off: off + n * hop]
        np.testing.assert_allclose(audio, ref, rtol=2e-4, atol=2e-5)
        prev = cl


@pytest.mark.slow
def test_code2wav_nonstreaming(c2w_engine):
    wav, sr = c2w_engine.synthesize("short code2wav test")
    hop = c2w_engine.vocoder_config.hop_length
    assert len(wav) % hop == 0 and len(wav) > 0
    assert np.abs(wav).max() <= 1.0


@pytest.mark.slow
def test_code2wav_window_buckets_match_full_window(c2w_engine):
    """The round-4 bucketed final window (pad to W/4, W/2, or W instead of
    always W) must reproduce the fixed-W decode exactly: the repeat-padded
    tail content is identical, only its length differs, and kept samples
    only look a bounded distance ahead. T values here are strictly inside
    a bucket (not exact fits) so both forms see the same padded content
    within every kept sample's dependency cone."""
    eng = c2w_engine
    g = eng.model_config.num_code_groups
    rng = np.random.default_rng(7)
    W = eng._c2w_window
    assert eng._c2w_buckets == (W // 4, W // 2, W)
    for T in (W // 8, W // 3, W + W // 8):   # bucket W/4, W/2, multi-window
        stacked = rng.integers(
            0, eng.vocoder_config.codebook_size, (T, g)).astype(np.int32)
        out_bucketed = eng._c2w_decode_full(stacked)
        try:
            eng._c2w_buckets = (W,)          # legacy fixed-W padding
            out_full = eng._c2w_decode_full(stacked)
        finally:
            eng._c2w_buckets = (W // 4, W // 2, W)
        assert out_bucketed.shape == out_full.shape == (T * eng.vocoder_config.hop_length,)
        np.testing.assert_allclose(out_bucketed, out_full, rtol=2e-4,
                                   atol=2e-5)


@pytest.mark.slow
def test_code2wav_quantizer_mismatch_raises():
    from qwen_tts_tpu.core.config import tiny_test_config
    from qwen_tts_tpu.vocoder.code2wav import Code2WavConfig

    c2c = Code2WavConfig(num_quantizers=4, hidden_size=32,
                         num_attention_heads=2, num_key_value_heads=2,
                         num_hidden_layers=1, upsample_rates=(2,),
                         upsampling_ratios=(2,), decoder_dim=8)
    eng = TTSEngine(TTSConfig(max_seq_len=64, vocoder_backend="code2wav",
                              code2wav_config=c2c),
                    model_config=tiny_test_config(max_seq_len=64))
    with pytest.raises(ValueError, match="num_quantizers"):
        eng.initialize()


@pytest.mark.slow
def test_streaming_speculation_budget(engine):
    """The depth-2 streaming pipeline keeps a BOUNDED speculative budget on
    early generator close: exactly 1 in-flight chunk when closed at the
    first yield (the TTFC-probe path — unchanged from depth-1), and exactly
    2 unread chunks at any later yield (the pre-read refill). Serving
    cancellation (`test_serving.py` mid-stream disconnect) assumes
    `drain_device()` only ever has to absorb this much."""
    real = engine._chunk_audio_fn
    calls = 0

    def counting(*a, **k):
        nonlocal calls
        calls += 1
        return real(*a, **k)

    async def consume(n_yields):
        nonlocal calls
        calls = 0
        agen = engine.synthesize_streaming(
            "a reasonably long streaming speculation budget test sentence")
        got = 0
        try:
            async for _audio, _sr in agen:
                got += 1
                if got == n_yields:
                    break
        finally:
            await agen.aclose()
        return got

    engine._chunk_audio_fn = counting
    try:
        assert asyncio.run(consume(1)) == 1
        # initial depth-1 speculation only; the post-first-yield refill must
        # NOT have run (GeneratorExit lands at the yield point)
        assert calls == 1, calls
        assert asyncio.run(consume(3)) == 3
        # 1 initial + 1 post-first-yield refill + 2 pre-read refills; the
        # chunks consumed at yields 2 and 3 leave 2 unread in flight
        assert calls == 4, calls
    finally:
        engine._chunk_audio_fn = real


def test_closed_signature_set_across_text_lengths(engine):
    """The engine's jit-signature set is CLOSED after initialize():
    streaming texts of any length within one trailing bucket triggers ZERO
    new XLA compilations. Round-3 regression this guards: 64-token
    geometric buckets left a 347-token text compiling first_fn + the chunk
    fn mid-request (12 s observed TTFC), and the never-warmed
    jit(_threefry_split)/jit(_unstack) helpers compiled inside the first
    request of the process."""
    import logging

    import jax

    from qwen_tts_tpu.engine.tokenizer import encode_tts_prompt

    texts = ["Hi!",
             "The quick brown fox jumps over the lazy dog.",
             " ".join(["abcdefghijklmnopqrstuvwxy"] * 12)]  # ~310 tokens
    bucket = engine.config.trailing_bucket
    for t in texts:  # all three must land in the first (warmed) bucket
        assert len(encode_tts_prompt(engine.tokenizer, t)) <= bucket + 8

    async def consume(text):
        async for _audio, _sr in engine.synthesize_streaming(text):
            pass

    records = []
    handler = logging.Handler()
    handler.emit = lambda r: records.append(r.getMessage())
    logger = logging.getLogger("jax._src.interpreters.pxla")
    old_level = logger.level
    logger.addHandler(handler)
    logger.setLevel(logging.WARNING)
    jax.config.update("jax_log_compiles", True)
    try:
        for t in texts:
            asyncio.run(consume(t))
    finally:
        jax.config.update("jax_log_compiles", False)
        logger.removeHandler(handler)
        logger.setLevel(old_level)
    compiles = [m for m in records if "Compiling" in m]
    assert not compiles, f"engine compiled mid-request: {compiles[:3]}"


@pytest.mark.slow
def test_text_beyond_one_bucket_still_streams(engine):
    """Texts longer than one trailing bucket (384 tokens) bucket UP and pay
    a one-time compile, but must still stream correctly end-to-end (the
    fallback path the fixed-bucket warmup deliberately leaves cold)."""
    bucket = engine.config.trailing_bucket
    # few words (small frame cap, fits max_seq=256) but > bucket TOKENS
    # under the byte-level fallback tokenizer (1 token per char)
    word = "abcdefghijklmnopqrstuvwxyzabcdefghijklmnopqrstuvwxyz"  # 52 chars
    text = " ".join([word] * 9)                                    # ~477 tokens

    from qwen_tts_tpu.engine.tokenizer import encode_tts_prompt
    n_ids = len(encode_tts_prompt(engine.tokenizer, text))
    assert n_ids > bucket, n_ids

    async def consume():
        chunks = []
        async for audio, _sr in engine.synthesize_streaming(text):
            chunks.append(audio)
        return chunks

    chunks = asyncio.run(consume())
    hop = engine.vocoder_config.hop_length
    assert len(chunks) >= 2
    assert len(chunks[0]) == 1 * hop       # first-chunk-at-1-frame holds
    assert all(np.isfinite(c).all() for c in chunks)
