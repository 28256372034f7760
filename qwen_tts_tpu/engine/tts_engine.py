"""TTS engine: text → talker → code predictor → vocoder → streamed audio.

TPU-native rebuild of the reference `MegakernelTTSEngine`
(reference: tts_engine.py:56-357) with the same public surface —
`initialize()`, `synthesize(text)`, async `synthesize_streaming(text)`,
`get_metrics()` — but a TPU-first execution plan:

- Prefill (8 conditioning positions) + the first CODEC_BOS decode run as ONE
  batched causal forward + step, fused in a single jit dispatch
  (reference does 9 sequential kernel launches, tts_engine.py:281-289).
- Each audio frame is ONE jitted `frame_step` call (CP scan over 15 groups +
  Σ-embedding next-input + next talker step), replacing the reference's ~33
  Python-dispatched GPU calls per frame (tts_engine.py:301-335).
- Sampling stays on device (jax.random); the only per-frame host readbacks
  are the EOS scalar check and the frame's 16 codes for the vocoder buffer —
  matching the reference's per-frame sync points.
- Trailing-text embeddings are padded to 64-length buckets so jit signatures
  stay static across utterances.
"""

from __future__ import annotations

import asyncio
import time
from dataclasses import dataclass
from functools import partial
from typing import AsyncGenerator, Generator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import (
    CODEC_BOS,
    CODEC_EOS,
    CODEC_NOTHINK,
    CODEC_PAD,
    CODEC_THINK_BOS,
    CODEC_THINK_EOS,
    TTS_BOS,
    TTS_EOS,
    TTS_PAD,
    TTSModelConfig,
)
from ..core.weights import TTSWeights, init_tts_weights, load_tts_weights
from ..models.decoder import init_state
from ..models.text_projection import embed_text_ids
from ..runtime.frame_loop import frame_step, frames_chunk, talker_prefill
from ..vocoder.code2wav import (
    Code2WavConfig,
    code2wav_apply,
    init_code2wav_weights,
)
from ..vocoder.loader import load_code2wav, load_vocoder
from ..vocoder.model import (
    VocoderConfig,
    init_vocoder_weights,
    vocoder_decode,
)
from .tokenizer import encode_tts_prompt, load_tokenizer


@dataclass
class TTSConfig:
    """Engine configuration (reference: tts_engine.py:37-53)."""

    model_path: Optional[str] = None      # None → random-init (hermetic mode)
    vocoder_path: Optional[str] = None
    sample_rate: int = 24000
    chunk_frames: int = 10                # ~0.8 s per chunk at 12.5 Hz
    # Generation params — RESERVED for the talker: talker tokens are always
    # greedy argmax, matching the reference kernel's fused in-kernel argmax
    # (reference: kernel.cu:1022-1185). Only the subtalker_* fields below
    # control sampling (the code predictor), as in the reference.
    do_sample: bool = True                # reserved (talker is greedy-only)
    temperature: float = 0.9              # reserved (talker is greedy-only)
    top_k: int = 50                       # reserved (talker is greedy-only)
    repetition_penalty: float = 1.05      # reserved (reference never applies it)
    max_new_tokens: int = 2048
    # Code predictor params
    subtalker_do_sample: bool = True
    subtalker_temperature: float = 0.9
    subtalker_top_k: int = 50
    # Hermetic-mode knobs
    seed: int = 0
    max_seq_len: int = 8192               # talker KV-cache length
    vocoder_mode: str = "auto"            # auto | random | silence
    # Vocoder backend: "fast" = this repo's lightweight codec decoder
    # (vocoder/model.py); "code2wav" = the faithful port of the public
    # Qwen3-Omni Code2Wav architecture (vocoder/code2wav.py) — same model
    # family as the reference's Qwen3TTSTokenizerV2 speech tokenizer.
    vocoder_backend: str = "fast"
    vocoder_dtype: str = "float32"        # code2wav only: float32 | bfloat16
    # code2wav execution form: "packed" = matmul-form NHC fast path
    # (vocoder/code2wav_fast.py, parity-tested; bf16 matrices unless
    # vocoder_dtype=float32); "reference" = the torch-layout port.
    code2wav_impl: str = "packed"
    code2wav_config: Optional[Code2WavConfig] = None  # override (tests/tuning)
    code2wav_window: int = 160            # non-streaming decode window (frames)
    code2wav_ctx: int = 25                # left-context frames (upstream: 25)
    # Text-capacity bucket: prompt ids / trailing embeds are padded to a
    # multiple of this, and the jit signatures include that padded shape.
    # One big bucket (384 tokens ≈ 45 s of speech) means every realistic
    # text shares the SAME warm signature — small geometric buckets (the
    # old 64 default) left longer texts compiling first_fn + the chunk fn
    # mid-request (observed 12 s TTFC on a 347-token text). Texts beyond
    # one bucket still work; they pay a one-time compile per new multiple.
    trailing_bucket: int = 384
    backend: str = "auto"                 # auto | dense | pallas | mega
    fused_chunks: bool = True             # one dispatch per audio chunk
    # Skip the single-stream warmup compiles at initialize(). For hosts
    # that only use the engine's weights/vocoder/tokenizer — e.g. the
    # continuous batcher, which warms its OWN three signatures — the
    # single-stream first_fn/chunk_fn compiles are pure wasted init time
    # (minutes each on the TPU for quantized dense configs).
    warmup: bool = True
    # Weight-only quantization for the WHOLE serving path — decode steps,
    # code-predictor steps, AND the T>1 prefills (quant-aware dense path
    # dequantizes one layer slab at a time), so quantize mode keeps exactly
    # ONE weight copy in HBM like the reference (model_tts.py:56-179).
    #   False → bf16; True | "int8" → per-channel int8 (+ int8 LM head);
    #   "int4" → group-128 int4 talker (CP stays int8 — 5 layers, quality-
    #   sensitive heads; quality numbers: README results table);
    #   "mixed" → int8 attention + int4-g128 MLP (60% of layer bytes at
    #   int4 with int8-grade attention/cache numerics — the middle tier).
    quantize: bool | str = False
    # Talker KV-cache dtype: "bf16" | "int8". int8 halves the position-
    # proportional cache read traffic (per-row f32 scales; docs/02).
    kv_cache: str = "bf16"
    # Code-predictor weight tier when `quantize` is on. Default "int8"
    # (5 layers, quality-sensitive lm heads); "int4" = group-128 int4
    # decoder matrices for maximum bandwidth saving; "mixed" = int8
    # attention + int4 MLP (same tradeoff as the talker's mixed tier) —
    # quality evidence via `validate_kernel.py --backend cp-int4` /
    # `cp-mixed` before serving with it.
    cp_quantize: str = "int8"
    # M-RoPE: the real Qwen3-TTS talker uses mrope_section [24, 20, 20]
    # in the Qwen3-Omni INTERLEAVED layout; the reference kernel only does
    # standard RoPE, which is why its EOS never fires and it caps frames by
    # word count (reference: README.md:204-208, docs/02-kernel-adaptation).
    # Here M-RoPE is on by default: per-section position streams thread
    # through prefill + every decode step (public scheme: all sections
    # advance together during decode, offset by per-section deltas from the
    # prefill — text-only deltas are zero, making the rotation values
    # bit-identical to standard RoPE while keeping the mechanism live).
    # The word-count cap remains as a pure FALLBACK stop.
    mrope: bool = True
    mrope_section: tuple = (24, 20, 20)


class TTSEngine:
    """TPU TTS engine (reference surface: MegakernelTTSEngine)."""

    def __init__(self, config: Optional[TTSConfig] = None,
                 model_config: Optional[TTSModelConfig] = None):
        self.config = config or TTSConfig()
        import dataclasses as _dc

        mc = model_config or TTSModelConfig()
        if self.config.max_seq_len != mc.talker.max_seq_len:
            mc = _dc.replace(
                mc, talker=_dc.replace(mc.talker,
                                       max_seq_len=self.config.max_seq_len))
        if self.config.mrope and mc.talker.mrope_section is None:
            secs = tuple(self.config.mrope_section)
            if sum(secs) != mc.talker.head_dim // 2:
                raise ValueError(
                    f"mrope_section {secs} must sum to head_dim//2 "
                    f"({mc.talker.head_dim // 2})")
            mc = _dc.replace(
                mc, talker=_dc.replace(mc.talker, mrope_section=secs,
                                       mrope_interleaved=True))
        self.model_config = mc
        self._initialized = False
        self.sample_rate = self.config.sample_rate

    # ── initialization ───────────────────────────────────────────────────

    def initialize(self, weights: Optional[TTSWeights] = None):
        """Load weights, build jitted paths, precompute constant embeddings,
        and warm up every compiled signature (reference: tts_engine.py:73-156)."""
        if self._initialized:
            return
        cfg, mc = self.config, self.model_config

        if weights is not None:
            self.weights = weights
        elif cfg.model_path:
            self.weights = load_tts_weights(cfg.model_path, mc)
        else:
            self.weights = init_tts_weights(jax.random.PRNGKey(cfg.seed), mc)

        self.tokenizer = load_tokenizer(cfg.model_path)
        self._load_vocoder()

        self._rng = jax.random.PRNGKey(cfg.seed)
        self._frames_generated = 0
        self._fused_chunks = cfg.fused_chunks
        if cfg.backend == "auto":
            self._attn_impl = (
                "mega" if jax.default_backend() not in ("cpu",) else "dense")
        else:
            self._attn_impl = cfg.backend
        if cfg.kv_cache not in ("bf16", "int8"):
            raise ValueError(f"unknown kv_cache {cfg.kv_cache!r}")
        self._kv_dtype = jnp.int8 if cfg.kv_cache == "int8" else jnp.bfloat16
        if self._kv_dtype == jnp.int8 and self._attn_impl == "mega":
            from ..core.config import ATTN_CHUNK

            if ATTN_CHUNK % 128:
                raise ValueError(
                    "kv_cache='int8' with the megakernel backend needs "
                    f"QWEN_TTS_TPU_ATTN_CHUNK ({ATTN_CHUNK}) % 128 == 0 "
                    "(scale slices are lane-dim)")
        self._talker_state = init_state(mc.talker, self._kv_dtype)
        # Per-section M-RoPE position deltas vs the cache position. Zeros =
        # the text-only Qwen3-TTS scheme (sections advance together); a
        # multimodal prefix would set these from its get_rope_index output.
        self._mrope_deltas = None
        if mc.talker.mrope_section is not None:
            self._mrope_deltas = jnp.zeros(
                (len(mc.talker.mrope_section),), jnp.int32)

        # Precompute constant embeddings (reference: tts_engine.py:106-137)
        tp_w = self.weights.text_projection
        special = embed_text_ids(
            tp_w, jnp.asarray([TTS_PAD, TTS_BOS, TTS_EOS], dtype=jnp.int32))
        self._tts_pad_embed = special[0]
        self._tts_eos_embed = special[2]

        role_ids = encode_tts_prompt(self.tokenizer, "")[:3]
        self._role_embeds = embed_text_ids(tp_w, jnp.asarray(role_ids))

        codec_ids = jnp.asarray(
            [CODEC_NOTHINK, CODEC_THINK_BOS, CODEC_THINK_EOS, CODEC_PAD, CODEC_BOS],
            dtype=jnp.int32)
        codec_embeds = self.weights.talker.embed[codec_ids].astype(jnp.bfloat16)
        tts_prefix = jnp.concatenate(
            [jnp.broadcast_to(special[0], (3, special.shape[1])), special[1:2]])
        self._fused_tags = (tts_prefix + codec_embeds[:4]).astype(jnp.bfloat16)
        self._codec_bos_embed = codec_embeds[4]

        # Weight-only quantization for the WHOLE serving path (steps AND
        # prefills — the dense path dequantizes layer slabs on the fly), so
        # the bf16 copies are DROPPED and exactly one weight copy stays in
        # HBM (round-2 kept resident bf16 for the prefills; VERDICT r2 #4).
        qmode = cfg.quantize
        if qmode is True:
            qmode = "int8"
        if qmode not in (False, "int8", "int4", "mixed"):
            raise ValueError(f"unknown quantize mode {cfg.quantize!r}")
        self._quant_mode = qmode
        if qmode:
            from ..core.weights import (
                quantize_decoder_weights,
                quantize_decoder_weights_int4,
                quantize_decoder_weights_mixed,
            )

            quantizer = {"int8": quantize_decoder_weights,
                         "int4": quantize_decoder_weights_int4,
                         "mixed": quantize_decoder_weights_mixed}[qmode]
            qt = quantizer(self.weights.talker)
            if cfg.cp_quantize not in ("int8", "int4", "mixed"):
                raise ValueError(
                    f"unknown cp_quantize mode {cfg.cp_quantize!r}")
            cp_quantizer = {"int8": quantize_decoder_weights,
                            "int4": quantize_decoder_weights_int4,
                            "mixed": quantize_decoder_weights_mixed}[
                                cfg.cp_quantize]
            qcp = cp_quantizer(self.weights.code_predictor.decoder,
                               quant_head=False)
            self.weights = self.weights._replace(
                talker=qt,
                code_predictor=self.weights.code_predictor._replace(
                    decoder=qcp))
        self._talker_step_w = self.weights.talker
        self._cp_step_w = None   # CP decoder itself is quantized now

        self._build_fused_fns()
        if cfg.warmup:
            self._warmup()
        self._initialized = True

    def _build_fused_fns(self):
        """Jit the chunk+vocoder composition (frames_chunk → vocoder_decode
        in ONE dispatch). Weights are passed as jit ARGUMENTS — closing over
        large arrays would embed them as XLA constants, which this platform
        handles pathologically (observed compile wedges)."""
        mc, cfg = self.model_config, self.config
        vc = self.vocoder_config
        attn_impl = self._attn_impl
        has_vocoder = self.vocoder_weights is not None
        voc = self._voc_frames_decode
        use_ctx = self._voc_kind == "code2wav"  # left-context chunk decode

        md = self._mrope_deltas   # tiny [3] int32 constant (or None)

        def fn(tw, cw, cs, vw, pad, ctx, state, tok, hid, trailing, tlen,
               tidx0, rng, n):
            state, codes, valid, tok, hid = frames_chunk(
                mc.talker, mc.code_predictor, tw, cw, state, tok, hid,
                trailing, tlen, tidx0, pad, rng, num_frames=n,
                do_sample=cfg.subtalker_do_sample,
                temperature=cfg.subtalker_temperature,
                top_k=cfg.subtalker_top_k, attn_impl=attn_impl,
                cp_step_w=cs, mrope_deltas=md)
            if has_vocoder:
                audio = voc(vw, codes, ctx if use_ctx else None)
            else:
                audio = jnp.zeros((codes.shape[0] * vc.hop_length,), jnp.float32)
            return state, codes, valid, tok, hid, audio

        jitted = jax.jit(fn, static_argnames=("n",), donate_argnames=("state",))
        self._dummy_ctx = jnp.zeros((1, mc.num_code_groups), jnp.int32)

        def call(state, tok, hid, trailing, tlen, tidx0, rng, n, ctx=None):
            if ctx is None:
                ctx = self._dummy_ctx
            return jitted(self._talker_step_w, self.weights.code_predictor,
                          self._cp_step_w,
                          self.vocoder_weights, self._tts_pad_embed, ctx,
                          state, tok, hid, trailing, tlen, tidx0, rng, n)

        self._chunk_audio_fn = call

        # ── cold-path fusion: tokenized ids → FIRST audio chunk, one dispatch
        # (text projection + conditioning prefix + batched prefill + first
        # decode + first frame + vocoder). This is the whole TTFC path after
        # host tokenization; it also emits the padded trailing-text embeds
        # reused by every subsequent chunk dispatch.
        from ..core.config import CODEC_BOS
        from ..models.decoder import forward_chunk, decode_step_with_embed

        kv_dtype = self._kv_dtype

        def first_fn(tw, cw, cs, vw, tp_w, role_embeds, fused_tags,
                     codec_bos_embed, tts_eos, tts_pad,
                     content_ids, n_content, rng):
            content_embeds = embed_text_ids(tp_w, content_ids)   # [Tpad, H]
            first_text_bos = content_embeds[:1] + codec_bos_embed[None]
            prefill_embeds = jnp.concatenate(
                [role_embeds, fused_tags, first_text_bos])       # [8, H]

            # trailing[i] = content[i+1] for i < n-6; tts_eos at i == n-6.
            # The eos index is clamped to 0 so degenerate inputs (content =
            # just the 5 trailing format tokens) still emit [tts_eos],
            # agreeing with the non-fused _build_prefill path.
            Tpad = content_ids.shape[0]
            idx = jnp.arange(Tpad)[:, None]
            shifted = jnp.roll(content_embeds, -1, axis=0)
            eos_pos = jnp.maximum(n_content - 6, 0)
            trailing = jnp.where(
                idx < eos_pos, shifted,
                jnp.where(idx == eos_pos, tts_eos[None],
                          jnp.zeros_like(shifted)))
            t_len = jnp.maximum(n_content - 5, 1).astype(jnp.int32)

            state = init_state(mc.talker, kv_dtype)
            mp = None if md is None else state.position + md
            state, _ = forward_chunk(mc.talker, tw, state, prefill_embeds,
                                     attn_impl=attn_impl, mrope_pos=mp)
            mp = None if md is None else state.position + md
            state, tok, hid = decode_step_with_embed(
                mc.talker, tw, state, tw.embed[CODEC_BOS],
                attn_impl=attn_impl, mrope_pos=mp)
            state, codes, valid, tok, hid = frames_chunk(
                mc.talker, mc.code_predictor, tw, cw, state, tok, hid,
                trailing, t_len, jnp.int32(0), tts_pad, rng, num_frames=1,
                do_sample=cfg.subtalker_do_sample,
                temperature=cfg.subtalker_temperature,
                top_k=cfg.subtalker_top_k, attn_impl=attn_impl,
                cp_step_w=cs, mrope_deltas=md)
            if has_vocoder:
                audio = voc(vw, codes, None)   # utterance start: no context
            else:
                audio = jnp.zeros((codes.shape[0] * vc.hop_length,), jnp.float32)
            return state, codes, valid, tok, hid, audio, trailing, t_len

        first_jitted = jax.jit(first_fn)

        def first_call(content_ids, n_content, rng):
            return first_jitted(
                self.weights.talker,
                self.weights.code_predictor, self._cp_step_w,
                self.vocoder_weights, self.weights.text_projection,
                self._role_embeds, self._fused_tags, self._codec_bos_embed,
                self._tts_eos_embed, self._tts_pad_embed,
                content_ids, n_content, rng)

        self._first_audio_fn = first_call

    def _load_vocoder(self):
        cfg = self.config
        self._voc_kind = cfg.vocoder_backend
        mode = cfg.vocoder_mode
        if self._voc_kind == "code2wav":
            self._load_code2wav()
            return
        if self._voc_kind != "fast":
            raise ValueError(f"unknown vocoder_backend {self._voc_kind!r}")
        self.vocoder_config = VocoderConfig(sample_rate=cfg.sample_rate)
        self.vocoder_weights = None
        if mode in ("auto",) and cfg.vocoder_path:
            self.vocoder_weights = load_vocoder(cfg.vocoder_path, self.vocoder_config)
        if self.vocoder_weights is None and mode in ("auto", "random"):
            self.vocoder_weights = init_vocoder_weights(
                jax.random.PRNGKey(cfg.seed + 1), self.vocoder_config)
            self._vocoder_is_random = True
        else:
            self._vocoder_is_random = False
        vc = self.vocoder_config
        # (vw, codes [T,16], ctx ignored) → [T*hop]; traced into fused fns
        self._voc_frames_decode = lambda vw, codes, ctx=None: vocoder_decode(
            vc, vw, codes)
        self._vocoder_fn = jax.jit(partial(vocoder_decode, vc))
        self.sample_rate = vc.sample_rate

    def _load_code2wav(self):
        """Code2Wav backend: the public Qwen3-Omni codec decoder architecture
        (vocoder/code2wav.py), torch-parity-tested. Streaming semantics mirror
        the upstream `chunked_decode` (left-context re-decode per chunk,
        modeling_qwen3_omni_moe.py:3752-3762) but improve on it: keeping
        samples from offset ctx*hop - deficit yields EXACTLY n*hop gapless
        samples per chunk instead of upstream's 555-sample hole per chunk."""
        cfg = self.config
        c2c = cfg.code2wav_config or Code2WavConfig(sample_rate=cfg.sample_rate)
        if c2c.num_quantizers != self.model_config.num_code_groups:
            raise ValueError(
                f"code2wav num_quantizers ({c2c.num_quantizers}) must match "
                f"the model's code groups ({self.model_config.num_code_groups})")
        self.vocoder_config = c2c
        self.vocoder_weights = None
        mode = cfg.vocoder_mode
        if mode in ("auto",) and cfg.vocoder_path:
            self.vocoder_weights = load_code2wav(cfg.vocoder_path, c2c)
        if self.vocoder_weights is None and mode in ("auto", "random"):
            self.vocoder_weights = init_code2wav_weights(
                jax.random.PRNGKey(cfg.seed + 1), c2c)
            self._vocoder_is_random = True
        else:
            self._vocoder_is_random = False
        use_packed = cfg.code2wav_impl == "packed"
        if self.vocoder_weights is not None and use_packed:
            from ..vocoder.code2wav_fast import (
                code2wav_apply_packed,
                pack_code2wav_weights,
            )

            pdt = (jnp.bfloat16 if cfg.vocoder_dtype == "bfloat16"
                   else jnp.float32)
            self.vocoder_weights = pack_code2wav_weights(
                c2c, self.vocoder_weights, dtype=pdt)
            apply_fn = code2wav_apply_packed
        else:
            if (self.vocoder_weights is not None
                    and cfg.vocoder_dtype == "bfloat16"):
                self.vocoder_weights = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16), self.vocoder_weights)
            apply_fn = code2wav_apply
        hop, deficit = c2c.hop_length, c2c.output_deficit

        def raw_decode(vw, codes):
            """codes [T,16] → [output_samples(T)] f32."""
            cl = jnp.clip(codes, 0, c2c.codebook_size - 1).astype(jnp.int32)
            return apply_fn(c2c, vw, cl.T[None])[0].astype(jnp.float32)

        def frames_decode(vw, codes, ctx=None):
            """codes [T,16] (+ left-context codes [C,16]) → EXACTLY [T*hop].

            With context: decode [ctx; codes], keep hop-aligned samples
            starting at ctx*hop - deficit — consecutive chunks are gapless
            and globally offset by one constant `deficit`. Without context
            (utterance start): front-pad the deficit with silence."""
            n = codes.shape[0]
            if ctx is None:
                return jnp.pad(raw_decode(vw, codes), (deficit, 0))
            wav = raw_decode(vw, jnp.concatenate([ctx, codes], axis=0))
            off = ctx.shape[0] * hop - deficit
            return jax.lax.dynamic_slice_in_dim(wav, off, n * hop)

        self._voc_frames_decode = frames_decode
        # host-callable form for non-default chunk sizes (jit retraces per
        # (ctx_len, n) shape pair — the fused default-chunk path stays the
        # fast one; this keeps custom-chunk streams gapless too)
        self._voc_ctx_jit = jax.jit(frames_decode)
        self._vocoder_fn = jax.jit(raw_decode)
        # Non-streaming decode runs in FIXED windows of `code2wav_window`
        # frames with `code2wav_ctx` frames of left context (upstream
        # chunked_decode semantics, modeling_qwen3_omni_moe.py:3752-3762).
        # The FINAL (or only) window pads to the smallest of a few fixed
        # BUCKETS (W/4, W/2, W) instead of always W — a 50-frame utterance
        # otherwise pays a full 160-frame window of conv compute (3.2×
        # waste, measured round 4: bf16+code2wav RTF 0.094 → most of the
        # gap vs the fast backend). All bucket shapes are warmed at init
        # so the closed-signature contract holds.
        self._c2w_window = max(cfg.code2wav_window, cfg.code2wav_ctx + 1)
        self._c2w_ctx = cfg.code2wav_ctx
        W = self._c2w_window
        self._c2w_buckets = tuple(sorted(
            {max(W // 4, 1), max(W // 2, 1), W}))

        def window_ctx_decode(vw, both):
            """both [CTX+B, 16] → the window's [B*hop] samples (B is the
            bucket size, static per compiled shape)."""
            wav = raw_decode(vw, both)
            w_len = both.shape[0] - self._c2w_ctx
            return jax.lax.dynamic_slice_in_dim(
                wav, self._c2w_ctx * hop - deficit, w_len * hop)

        self._c2w_ctx_fn = jax.jit(window_ctx_decode)
        self.sample_rate = c2c.sample_rate

    def _c2w_decode_full(self, stacked: np.ndarray) -> np.ndarray:
        """Whole-utterance code2wav decode via fixed windows; returns
        exactly T*hop samples (tail zero-padded by the conv-trim deficit)."""
        c2c = self.vocoder_config
        hop = c2c.hop_length
        W, CTX = self._c2w_window, self._c2w_ctx
        T, q = stacked.shape
        parts = []
        s = 0
        while s < T:
            end = min(s + W, T)
            window = stacked[s:end]
            if end - s < W:  # repeat-pad the last window to its BUCKET
                bucket = next(b for b in self._c2w_buckets if b >= end - s)
                pad = np.broadcast_to(window[-1], (bucket - (end - s), q))
                window = np.concatenate([window, pad])
            if s == 0:
                wav = self._vocoder_fn(self.vocoder_weights,
                                       jnp.asarray(window))
            else:
                both = np.concatenate([stacked[s - CTX: s], window])
                wav = self._c2w_ctx_fn(self.vocoder_weights,
                                       jnp.asarray(both))
            parts.append(wav)       # async dispatch: enqueue ALL windows
            s = end
        # ONE readback — serializing an np.asarray per window would pay a
        # full tunnel round trip each (~26 ms) and lose overlap
        out = np.concatenate(
            [np.asarray(w, dtype=np.float32) for w in jax.device_get(parts)])
        need = T * hop
        if len(out) < need:
            out = np.concatenate([out, np.zeros(need - len(out), np.float32)])
        return out[:need]

    def _warmup(self):
        """Compile + warm every hot signature (the reference's hard-won
        lesson: warm argmax AND sampling AND vocoder — tts_engine.py:139-153)."""
        cfg, mc = self.config, self.model_config
        h = mc.talker.hidden_size
        state = init_state(mc.talker, self._kv_dtype)
        dummy_prefill = jnp.zeros((8, h), dtype=jnp.bfloat16)
        state, token, hidden = talker_prefill(
            mc.talker, self.weights.talker, state, dummy_prefill,
            attn_impl=self._attn_impl, mrope_deltas=self._mrope_deltas)
        trailing = jnp.zeros((cfg.trailing_bucket, h), dtype=jnp.bfloat16)
        do_sample = cfg.subtalker_do_sample
        # warm the host-side RNG helpers (jit(_threefry_split)/jit(_unstack))
        # that every streaming call runs before its first dispatch — left
        # cold, they compile inside the first request's TTFC (~1 s via the
        # compile relay)
        _wk1, _wk2 = jax.random.split(jax.random.PRNGKey(0))  # unpack → _unstack
        if self._fused_chunks:
            # warm the fused cold path AND the per-chunk signature sequence.
            # The chunk fn's signature includes the trailing SHAPE; with one
            # big text bucket (trailing_bucket default 384) every realistic
            # text shares this single warmed signature, so only mult=1 needs
            # warming (texts beyond one bucket pay a one-time compile). For
            # code2wav the ctx shape grows [1,16] then [chunk,16], so warm
            # both ctx shapes.
            warm_ns = (1, cfg.chunk_frames)
            if self._voc_kind == "code2wav":
                warm_ns = (1, cfg.chunk_frames, cfg.chunk_frames)
            for mult in (1,):
                dummy_ids = jnp.zeros((cfg.trailing_bucket * mult,),
                                      dtype=jnp.int32)
                state, codes, valid, token, hidden, audio, trailing, t_len = \
                    self._first_audio_fn(dummy_ids, jnp.int32(10),
                                         jax.random.PRNGKey(0))
                prev = codes
                for n in warm_ns:
                    state, codes, valid, token, hidden, audio = \
                        self._chunk_audio_fn(
                            state, token, hidden, trailing,
                            jnp.int32(0), jnp.int32(0),
                            jax.random.PRNGKey(0), n,
                            ctx=prev if self._voc_kind == "code2wav" else None)
                    prev = codes
            np.asarray(audio)
            if self._voc_kind == "code2wav" and self.vocoder_weights is not None:
                # terminal-partial-chunk redecode signatures (ctx ∈ {1, cs})
                g = mc.num_code_groups
                cs = cfg.chunk_frames
                for ctx_len in (1, cs):
                    np.asarray(self._voc_ctx_jit(
                        self.vocoder_weights, jnp.zeros((cs, g), jnp.int32),
                        jnp.zeros((ctx_len, g), jnp.int32)))
        else:
            r = frame_step(
                mc.talker, mc.code_predictor,
                self._talker_step_w, self.weights.code_predictor,
                state, token, hidden,
                trailing, jnp.int32(0), jnp.int32(0),
                self._tts_pad_embed, jax.random.PRNGKey(0),
                do_sample=do_sample,
                temperature=cfg.subtalker_temperature,
                top_k=cfg.subtalker_top_k,
                attn_impl=self._attn_impl,
                cp_step_w=self._cp_step_w,
                mrope_deltas=self._mrope_deltas,
            )
            np.asarray(r.codes)
        del state
        if self.vocoder_weights is not None and self._voc_kind == "code2wav":
            # code2wav non-streaming path: every window BUCKET, with and
            # without left context (first vs continuation windows), so no
            # utterance length compiles at request time
            g = mc.num_code_groups
            for b in self._c2w_buckets:
                np.asarray(self._vocoder_fn(
                    self.vocoder_weights, jnp.zeros((b, g), jnp.int32)))
                np.asarray(self._c2w_ctx_fn(
                    self.vocoder_weights,
                    jnp.zeros((self._c2w_ctx + b, g), jnp.int32)))
        elif self.vocoder_weights is not None:
            # warm vocoder shape buckets up to ~13s of audio (longer
            # utterances compile their bucket on first use)
            sizes = [1, cfg.chunk_frames]
            b = cfg.chunk_frames
            while b < 160:
                b *= 2
                sizes.append(b)
            for n in sizes:
                dummy = jnp.zeros((n, mc.num_code_groups), dtype=jnp.int32)
                np.asarray(self._vocoder_fn(self.vocoder_weights, dummy))
        # fresh state for real use
        self._talker_state = init_state(mc.talker, self._kv_dtype)

    # ── synthesis ────────────────────────────────────────────────────────

    def synthesize(self, text: str) -> tuple[np.ndarray, int]:
        """Non-streaming synthesis → (waveform f32, sample_rate)
        (reference: tts_engine.py:211-218)."""
        self.initialize()
        if (self._fused_chunks and self.vocoder_weights is not None
                and self._voc_kind == "code2wav"):
            # code2wav chunks are gapless by construction (left-context
            # decode), so the utterance waveform is their concatenation —
            # identical to the streamed output, and the (dominant-FLOPs)
            # vocoder runs once instead of per-chunk-plus-full-redecode
            parts = [audio for audio, _fr in
                     self._generate_audio_chunks(text, self.config.chunk_frames)]
            if not parts:
                return np.array([], dtype=np.float32), self.sample_rate
            return np.concatenate(parts), self.sample_rate
        if self._fused_chunks and self.vocoder_weights is not None:
            # ride the warmed streaming signatures; per-chunk audio is
            # discarded and the waveform is decoded ONCE over all frames —
            # the reference's non-streaming semantics (tts_engine.py:211-218)
            frames = [f for _audio, fr in
                      self._generate_audio_chunks(text, self.config.chunk_frames)
                      for f in fr]
        elif self._fused_chunks:
            frames = [f for chunk in self._generate_codec_chunks(
                text, first_chunk=self.config.chunk_frames) for f in chunk]
        else:
            frames = list(self._generate_codec_frames(text))
        if not frames:
            return np.array([], dtype=np.float32), self.sample_rate
        return self._decode_to_audio(frames)

    async def synthesize_streaming(
        self, text: str, chunk_frames: Optional[int] = None,
    ) -> AsyncGenerator[tuple[np.ndarray, int], None]:
        """Streaming synthesis: first chunk after 1 frame, then
        `chunk_frames`-frame chunks (reference: tts_engine.py:220-244)."""
        self.initialize()
        chunk_size = chunk_frames or self.config.chunk_frames
        if (self._fused_chunks and self.vocoder_weights is not None
                and chunk_size == self.config.chunk_frames):
            # Fully fused + pipelined: frames AND vocoder in one dispatch per
            # chunk, next chunk speculatively enqueued before reading the
            # current one — steady-state host↔device latency is hidden.
            for audio, _frames in self._generate_audio_chunks(text, chunk_size):
                yield audio, self.sample_rate
                await asyncio.sleep(0)
            return
        if self._fused_chunks:
            # One fused dispatch per chunk: 1-frame first chunk for TTFC,
            # then chunk_size-frame dispatches (~0.8 s of audio per call).
            # code2wav chunks decode with the previous chunk as left
            # context so non-default chunk sizes stay gapless too. The
            # context stays DEVICE-resident (one upload per chunk, not
            # two), and a terminal partial chunk is repeat-padded to the
            # fixed chunk size so the jit signature set is closed — no
            # mid-stream vocoder compile on the final chunk.
            use_ctx = (self._voc_kind == "code2wav"
                       and self.vocoder_weights is not None)
            prev_dev = None
            for chunk in self._generate_codec_chunks(
                    text, first_chunk=1, chunk_size=chunk_size):
                if not chunk:
                    continue
                if use_ctx:
                    n = len(chunk)
                    cur = np.stack(chunk)
                    if prev_dev is not None and n < chunk_size:
                        pad = np.broadcast_to(cur[-1], (chunk_size - n,
                                                        cur.shape[1]))
                        cur = np.concatenate([cur, pad])
                    cur_dev = jnp.asarray(cur)
                    wav = self._voc_ctx_jit(self.vocoder_weights, cur_dev,
                                            prev_dev)
                    hop = self.vocoder_config.hop_length
                    yield (np.asarray(wav, dtype=np.float32)[: n * hop],
                           self.sample_rate)
                    prev_dev = cur_dev
                else:
                    yield self._decode_to_audio(chunk)
                await asyncio.sleep(0)
            return
        buffer: list[np.ndarray] = []
        first_chunk = True
        for frame in self._generate_codec_frames(text):
            buffer.append(frame)
            target = 1 if first_chunk else chunk_size
            if len(buffer) >= target:
                audio, sr = self._decode_to_audio(buffer)
                buffer = []
                first_chunk = False
                yield audio, sr
                await asyncio.sleep(0)
        if buffer:
            yield self._decode_to_audio(buffer)

    def synthesize_batch(
        self, texts: list[str], mesh=None,
    ) -> list[tuple[np.ndarray, int]]:
        """Batched non-streaming synthesis — a TPU-first extension (the
        reference is strictly batch-1, SURVEY.md §2.3). B utterances run as
        one vmapped prefill + one vmapped frames dispatch on the dense path;
        with a `jax.sharding.Mesh` carrying a "dp" axis, the batch is
        data-parallel across devices (utterances are independent, so no
        collectives are inserted)."""
        self.initialize()
        if not texts:
            return []
        cfg, mc = self.config, self.model_config
        from ..runtime.batch import batched_frames, batched_prefill

        prefills, trailings, tlens, caps = [], [], [], []
        for text in texts:
            pe, tr, tl = self._build_prefill(text)
            prefills.append(pe)
            trailings.append(tr)
            tlens.append(tl)
            words = max(len(text.split()), 1)
            caps.append(min(max(int(words / 2.5 * 12.5 * 2.0), 25),
                            cfg.max_new_tokens))
        B = len(texts)
        Tmax = max(t.shape[0] for t in trailings)
        trailing = jnp.stack([
            jnp.pad(t, ((0, Tmax - t.shape[0]), (0, 0))) for t in trailings])
        prefill_embeds = jnp.stack(prefills)
        tlen = jnp.asarray(tlens, jnp.int32)
        max_frames = max(caps)

        self._rng, loop_rng = jax.random.split(self._rng)
        rngs = jax.random.split(loop_rng, B)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = mesh.shape.get("dp", 1)
            if B % dp:
                raise ValueError(
                    f"batch size {B} must be divisible by the mesh dp "
                    f"axis ({dp}); pad the text list")
            dpB = NamedSharding(mesh, P("dp"))
            dpR = lambda nd: NamedSharding(mesh, P("dp", *([None] * nd)))
            prefill_embeds = jax.device_put(prefill_embeds, dpR(2))
            trailing = jax.device_put(trailing, dpR(2))
            tlen = jax.device_put(tlen, dpB)
            rngs = jax.device_put(rngs, dpR(1))

        state, tok, hid = batched_prefill(
            mc.talker, self.weights.talker, prefill_embeds, attn_impl="dense",
            kv_dtype=self._kv_dtype, mrope_deltas=self._mrope_deltas)
        state, codes, valid, tok, hid = batched_frames(
            mc.talker, mc.code_predictor,
            self.weights.talker, self.weights.code_predictor,
            state, tok, hid, trailing, tlen,
            jnp.zeros((B,), jnp.int32), self._tts_pad_embed, rngs,
            num_frames=max_frames, do_sample=cfg.subtalker_do_sample,
            temperature=cfg.subtalker_temperature,
            top_k=cfg.subtalker_top_k, attn_impl="dense",
            mrope_deltas=self._mrope_deltas)

        codes_np, valid_np = jax.device_get((codes, valid))
        results = []
        for b in range(B):
            keep = min(int(valid_np[b].sum()), caps[b])
            frames = [codes_np[b, i] for i in range(keep)]
            results.append(self._decode_to_audio(frames))
        self._frames_generated = int(sum(min(int(v.sum()), c)
                                         for v, c in zip(valid_np, caps)))
        return results

    # ── core generation loop ─────────────────────────────────────────────

    def _build_prefill(self, text: str):
        """Tokenize + build the 8-position conditioning prefix and padded
        trailing-text embeddings (reference: tts_engine.py:256-278,
        model_tts.py:776-864)."""
        cfg = self.config
        tp_w = self.weights.text_projection
        text_ids = encode_tts_prompt(self.tokenizer, text)
        content_ids = jnp.asarray(text_ids[3:], dtype=jnp.int32)
        content_embeds = embed_text_ids(tp_w, content_ids)          # [N, H] bf16

        first_text_with_bos = content_embeds[:1] + self._codec_bos_embed[None]
        prefill_embeds = jnp.concatenate(
            [self._role_embeds, self._fused_tags, first_text_with_bos])  # [8, H]

        # Trailing: content[1:-5] + tts_eos, padded to a bucket
        trailing = jnp.concatenate(
            [content_embeds[1:-5], self._tts_eos_embed[None]])
        t_len = trailing.shape[0]
        bucket = cfg.trailing_bucket
        padded_len = max(((t_len + bucket - 1) // bucket) * bucket, bucket)
        trailing = jnp.pad(trailing, ((0, padded_len - t_len), (0, 0)))
        return prefill_embeds, trailing, t_len

    def _generate_audio_chunks(self, text: str, chunk_size: int):
        """Pipelined fused generation: each dispatch runs `frames_chunk` AND
        the vocoder on device, returning ~0.8 s of audio per round trip; the
        next chunk is enqueued *before* the current result is read, so the
        host↔device round trip overlaps the next chunk's compute (JAX async
        dispatch — the TPU equivalent of the reference's queued CUDA launches,
        reference: kernel.cu:1555-1613).

        Yields (audio_f32, frames list). Full chunks are decoded at their
        true length; a terminal partial chunk is re-decoded from its valid
        frames (one extra round trip once per utterance) through the bucket
        padding in `_decode_to_audio`, so its tail is close to but not
        bit-exact vs a true-length decode."""
        from collections import deque

        cfg, mc = self.config, self.model_config
        hop = self.vocoder_config.hop_length

        # Host tokenization only; everything from text projection to the
        # first audio chunk is ONE fused dispatch (the TTFC path).
        text_ids = encode_tts_prompt(self.tokenizer, text)
        content = np.asarray(text_ids[3:], dtype=np.int32)
        bucket = cfg.trailing_bucket
        Tpad = max(((len(content) + bucket - 1) // bucket) * bucket, bucket)
        content_ids = np.zeros(Tpad, dtype=np.int32)
        content_ids[:len(content)] = content

        word_count = max(len(text.split()), 1)
        max_frames = max(int(word_count / 2.5 * 12.5 * 2.0), 25)
        max_frames = min(max_frames, cfg.max_new_tokens)

        self._rng, loop_rng = jax.random.split(self._rng)
        q: deque = deque()

        # one batched host→device upload (separate uploads each pay a full
        # round trip on high-latency links)
        ids_dev, n_dev = jax.device_put(
            (content_ids, np.int32(len(content))))
        state, codes, valid, prev_token, hidden, audio, trailing, t_len = \
            self._first_audio_fn(ids_dev, n_dev, loop_rng)
        q.append((codes, valid, audio, 1, 0))
        planned = 1
        # code2wav decodes each chunk with the PREVIOUS chunk's codes as left
        # context (device-resident — no upload), keeping chunks gapless.
        prev_codes = codes

        def enqueue(n):
            nonlocal state, prev_token, hidden, planned, prev_codes
            state, codes, valid, prev_token, hidden, audio = \
                self._chunk_audio_fn(
                    state, prev_token, hidden, trailing,
                    t_len, jnp.int32(planned), loop_rng, n,
                    ctx=prev_codes if self._voc_kind == "code2wav" else None)
            q.append((codes, valid, audio, n, planned))
            prev_codes = codes
            planned += n

        if planned < max_frames:
            enqueue(chunk_size)                      # depth-1 speculation

        produced = 0
        prev_np = None        # previous FULL chunk's codes (terminal redecode)
        while q:
            codes, valid, audio, n, base = q.popleft()
            if base >= max_frames:
                break
            # depth-2 pipeline: enqueue the NEXT chunk BEFORE the blocking
            # read, so this chunk's readback round trip (~1 tunnel RTT)
            # overlaps the next chunk's device compute — steady-state chunk
            # wall drops from compute+RTT to max(compute, RTT). The first
            # chunk is excluded so the TTFC path and the early-close
            # speculative budget (one chunk in flight at first yield) are
            # unchanged; from the second yield on, an early generator close
            # leaves at most TWO speculative chunks, which `drain_device`
            # already absorbs.
            if base > 0 and planned < max_frames:
                enqueue(chunk_size)
            codes_np, valid_np, audio_np = jax.device_get((codes, valid, audio))
            keep = min(int(valid_np.sum()), max_frames - base)
            frames = [codes_np[i] for i in range(keep)]
            produced = base + keep
            self._frames_generated = produced
            if keep == n:
                yield audio_np[: keep * hop].astype(np.float32), frames
                prev_np = codes_np[:n]
                # refill the pipe to depth 2 after the first chunk's yield
                # (steady-state refills happen pre-read above)
                if base == 0 and planned < max_frames:
                    enqueue(chunk_size)
            else:
                if keep > 0:
                    yield self._terminal_chunk_audio(frames, n, prev_np), frames
                break                                 # EOS inside this chunk
            if keep < n or produced >= max_frames:
                break
        self._talker_state = state

    def _terminal_chunk_audio(self, frames, n, prev_np):
        """Audio for a PARTIAL terminal chunk.

        code2wav: repeat-pad to the chunk signature and decode with the
        previous chunk as left context, slicing the valid samples — same
        timeline convention (front-padded by `deficit`) and same gapless
        joint as every preceding chunk (re-decoding via the raw/tail-pad
        window path would shift this chunk ~23 ms and lose its history).
        Other backends re-decode exactly via _decode_to_audio."""
        if (self._voc_kind == "code2wav" and self.vocoder_weights is not None
                and prev_np is not None):
            hop = self.vocoder_config.hop_length
            cur = np.stack(frames)
            k = len(frames)
            if k < n:
                pad = np.broadcast_to(cur[-1], (n - k, cur.shape[1]))
                cur = np.concatenate([cur, pad])
            wav = self._voc_ctx_jit(self.vocoder_weights, jnp.asarray(cur),
                                    jnp.asarray(prev_np))
            return np.asarray(wav, dtype=np.float32)[: k * hop]
        audio_exact, _ = self._decode_to_audio(frames)
        return audio_exact

    def _generate_codec_chunks(
        self, text: str, first_chunk: int = 1, chunk_size: Optional[int] = None,
    ) -> Generator[list, None, None]:
        """Yield lists of [16] int32 frames, one fused dispatch per chunk
        (`frames_chunk` scans the whole chunk on device). TPU-first version
        of the reference's per-frame loop (reference: tts_engine.py:301-335):
        throughput no longer depends on host dispatch latency."""
        cfg, mc = self.config, self.model_config
        chunk_size = chunk_size or cfg.chunk_frames

        prefill_embeds, trailing, trailing_len = self._build_prefill(text)
        state, prev_token, hidden = talker_prefill(
            mc.talker, self.weights.talker,
            init_state(mc.talker, self._kv_dtype),
            prefill_embeds, attn_impl=self._attn_impl,
            mrope_deltas=self._mrope_deltas)

        word_count = max(len(text.split()), 1)
        max_frames = max(int(word_count / 2.5 * 12.5 * 2.0), 25)
        max_frames = min(max_frames, cfg.max_new_tokens)

        self._rng, loop_rng = jax.random.split(self._rng)
        produced = 0
        sizes = [first_chunk]
        alive = True
        while alive and produced < max_frames:
            n = sizes.pop(0) if sizes else chunk_size
            state, codes, valid, prev_token, hidden = frames_chunk(
                mc.talker, mc.code_predictor,
                self._talker_step_w, self.weights.code_predictor,
                state, prev_token, hidden,
                trailing, jnp.int32(trailing_len), jnp.int32(produced),
                self._tts_pad_embed, loop_rng,
                num_frames=n, do_sample=cfg.subtalker_do_sample,
                temperature=cfg.subtalker_temperature,
                top_k=cfg.subtalker_top_k, attn_impl=self._attn_impl,
                cp_step_w=self._cp_step_w, mrope_deltas=self._mrope_deltas)
            codes_np = np.asarray(codes)
            valid_np = np.asarray(valid)
            keep = int(valid_np.sum())
            keep = min(keep, max_frames - produced)
            alive = bool(valid_np.all()) and produced + keep < max_frames
            produced += keep
            self._frames_generated = produced
            yield [codes_np[i] for i in range(keep)]

        self._talker_state = state

    def _generate_codec_frames(self, text: str) -> Generator[np.ndarray, None, None]:
        """Yield one [16] int32 frame at a time (reference: tts_engine.py:246-335)."""
        cfg, mc = self.config, self.model_config

        prefill_embeds, trailing, trailing_len = self._build_prefill(text)

        # talker_prefill/frame_step donate their state: work on a local and
        # only assign self._talker_state once the loop ends, so an early
        # generator close never leaves a deleted array behind.
        state, prev_token, hidden = talker_prefill(
            mc.talker, self.weights.talker,
            init_state(mc.talker, self._kv_dtype),
            prefill_embeds, attn_impl=self._attn_impl,
            mrope_deltas=self._mrope_deltas)

        # Frame cap: with M-RoPE wired (cfg.mrope, the default) EOS is the
        # primary stop and this word-count heuristic is a runaway FALLBACK;
        # with mrope=False it is the stop condition, exactly the preserved
        # reference limitation (tts_engine.py:295-299, README.md:204-208).
        word_count = max(len(text.split()), 1)
        max_frames = max(int(word_count / 2.5 * 12.5 * 2.0), 25)
        max_frames = min(max_frames, cfg.max_new_tokens)

        self._rng, loop_rng = jax.random.split(self._rng)
        trailing_idx = 0
        for step in range(max_frames):
            if int(prev_token) == CODEC_EOS:
                break
            result = frame_step(
                mc.talker, mc.code_predictor,
                self._talker_step_w, self.weights.code_predictor,
                state, prev_token, hidden,
                trailing, jnp.int32(trailing_len), jnp.int32(trailing_idx),
                self._tts_pad_embed,
                jax.random.fold_in(loop_rng, step),
                do_sample=cfg.subtalker_do_sample,
                temperature=cfg.subtalker_temperature,
                top_k=cfg.subtalker_top_k,
                attn_impl=self._attn_impl,
                cp_step_w=self._cp_step_w,
                mrope_deltas=self._mrope_deltas,
            )
            state = result.state
            prev_token = result.next_token
            hidden = result.next_hidden
            trailing_idx += 1
            self._frames_generated = step + 1
            yield np.asarray(result.codes)

        self._talker_state = state

    # ── vocoder ──────────────────────────────────────────────────────────

    def _decode_to_audio(self, frames: list[np.ndarray]) -> tuple[np.ndarray, int]:
        """Codec frames → waveform (reference: tts_engine.py:337-350).

        Frame counts are padded up to {1, chunk_frames, 2×chunk_frames, ...}
        buckets so the jitted vocoder never sees a new shape mid-stream (a
        fresh conv-stack compile costs seconds); the waveform is sliced back
        to the exact length. Padding repeats the last valid frame — code 0
        is a real codebook entry, and the vocoder's SAME-padded (non-causal)
        convs bleed pad frames back into the tail of the valid region, so
        repeat-padding keeps the tail continuous. The result is still not
        bit-exact vs a true-length decode near the final frame boundary."""
        if not frames:
            return np.array([], dtype=np.float32), self.sample_rate
        T = len(frames)
        if self._voc_kind == "code2wav" and self.vocoder_weights is not None:
            return (self._c2w_decode_full(np.stack(frames)),
                    self.sample_rate)
        bucket = self._vocoder_bucket(T)
        stacked = np.stack(frames)
        codes = np.broadcast_to(
            stacked[-1], (bucket, stacked.shape[1])).copy()
        codes[:T] = stacked
        codes = jnp.asarray(codes)
        if self.vocoder_weights is not None:
            wav = self._vocoder_fn(self.vocoder_weights, codes)
            wav = np.asarray(wav, dtype=np.float32)
            return wav[: T * self.vocoder_config.hop_length], self.sample_rate
        duration_sec = len(frames) / self.model_config.frame_rate_hz
        return (np.zeros(int(duration_sec * self.sample_rate), dtype=np.float32),
                self.sample_rate)

    def _vocoder_bucket(self, T: int) -> int:
        """Geometric shape buckets (all pre-warmed) so the jitted vocoder
        never compiles mid-request; output is sliced to the exact length."""
        cf = self.config.chunk_frames
        if T == 1:
            return 1
        b = cf
        while b < T:
            b *= 2
        return b

    def get_metrics(self) -> dict:
        position = 0
        if self._initialized:
            try:
                position = int(self._talker_state.position)
            except RuntimeError:
                # state buffer was donated into an in-flight generation
                # (e.g. a streaming generator closed early)
                position = -1
        return {
            "sample_rate": self.sample_rate,
            "position": position,
            "frames_generated": getattr(self, "_frames_generated", 0),
        }


# Alias for reference-API familiarity
MegakernelTTSEngine = TTSEngine
