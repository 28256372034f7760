"""Fused per-frame decode: one jitted call per 80 ms audio frame.

The reference spends a frame on 1 talker megakernel launch + 16 code-predictor
launches + 15 torch sampling ops + 16 embedding gathers, all dispatched from
Python (reference: tts_engine.py:301-335, model_tts.py:728-773). On TPU,
per-dispatch latency would dominate at that granularity, so the WHOLE frame —
code-predictor predict (scan over 15 groups), Σ-of-16-codec-embeddings next
input construction, trailing-text advance, and the next talker step — is one
jitted function with donated KV-cache state.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import DecoderConfig
from ..core.weights import CodePredictorWeights, DecoderWeights
from ..models.code_predictor import cp_predict
from ..models.decoder import DecodeState, decode_step_with_embed, forward_chunk, lm_head_logits
from ..ops.sampling import sample_logits


class FrameResult(NamedTuple):
    state: DecodeState        # talker state after the next talker step
    codes: jax.Array          # [16] int32 — this frame's codebook tokens
    next_token: jax.Array     # int32 — talker codebook-0 token for next frame
    next_hidden: jax.Array    # [H] f32 — talker hidden for next frame's CP


def _sum_code_embeddings(
    codes: jax.Array,               # [16] int32
    talker_embed: jax.Array,        # [3072, H]
    cp_codec_embeds: jax.Array,     # [15, 2048, H]
) -> jax.Array:
    """Σ of all 16 codec-group embeddings (reference: tts_engine.py:317-326),
    as one vectorised gather instead of 16 sequential F.embedding calls."""
    e0 = talker_embed[codes[0]].astype(jnp.float32)                       # [H]
    rest = cp_codec_embeds[jnp.arange(15), codes[1:16]].astype(jnp.float32)  # [15, H]
    return e0 + jnp.sum(rest, axis=0)


@partial(
    jax.jit,
    static_argnames=("talker_cfg", "cp_cfg", "do_sample", "temperature", "top_k", "attn_impl"),
    donate_argnames=("state",),
)
def frame_step(
    talker_cfg: DecoderConfig,
    cp_cfg: DecoderConfig,
    talker_w: DecoderWeights,
    cp_w: CodePredictorWeights,
    state: DecodeState,
    prev_token: jax.Array,        # int32 — talker token from previous step
    hidden: jax.Array,            # [H] f32 — talker hidden from previous step
    trailing: jax.Array,          # [T_pad, H] — padded trailing-text embeddings
    trailing_len: jax.Array,      # int32
    trailing_idx: jax.Array,      # int32
    tts_pad_embed: jax.Array,     # [H]
    rng: jax.Array,
    do_sample: bool = True,
    temperature: float = 0.9,
    top_k: int = 50,
    attn_impl: str = "dense",
    cp_step_w=None,               # optional quantized CP decoder for T=1 steps
    mrope_deltas=None,            # [n_sections] int32 — M-RoPE per-section
                                  # position offsets vs the cache position
                                  # (zeros = the text-only Qwen3-TTS scheme,
                                  # where all sections advance together)
) -> FrameResult:
    """One full frame (reference loop body: tts_engine.py:301-335)."""
    codes = cp_predict(
        cp_cfg, cp_w, hidden, prev_token, talker_w.embed, rng,
        do_sample=do_sample, temperature=temperature, top_k=top_k,
        attn_impl=attn_impl, step_w=cp_step_w,
    )  # [16] int32

    embed_sum = _sum_code_embeddings(codes, talker_w.embed, cp_w.codec_embeds)

    # Trailing text advance (reference: tts_engine.py:329-333)
    idx = jnp.minimum(trailing_idx, trailing.shape[0] - 1)
    text_embed = jnp.where(
        trailing_idx < trailing_len,
        trailing[idx].astype(jnp.float32),
        tts_pad_embed.astype(jnp.float32),
    )
    next_input = embed_sum + text_embed

    mrope_pos = None
    if mrope_deltas is not None and talker_cfg.mrope_section is not None:
        mrope_pos = state.position + mrope_deltas
    state, next_token, next_hidden = decode_step_with_embed(
        talker_cfg, talker_w, state, next_input, attn_impl=attn_impl,
        mrope_pos=mrope_pos)
    return FrameResult(state=state, codes=codes,
                       next_token=next_token, next_hidden=next_hidden)


@partial(
    jax.jit,
    static_argnames=("talker_cfg", "cp_cfg", "do_sample", "temperature",
                     "top_k", "attn_impl", "num_frames"),
    donate_argnames=("state",),
)
def frames_chunk(
    talker_cfg: DecoderConfig,
    cp_cfg: DecoderConfig,
    talker_w: DecoderWeights,
    cp_w: CodePredictorWeights,
    state: DecodeState,
    prev_token: jax.Array,
    hidden: jax.Array,
    trailing: jax.Array,
    trailing_len: jax.Array,
    trailing_idx0: jax.Array,
    tts_pad_embed: jax.Array,
    rng: jax.Array,
    num_frames: int = 10,
    do_sample: bool = True,
    temperature: float = 0.9,
    top_k: int = 50,
    attn_impl: str = "dense",
    cp_step_w=None,               # optional quantized CP decoder for T=1 steps
    mrope_deltas=None,            # [n_sections] int32 (see frame_step)
):
    """`num_frames` frames in ONE dispatch — `lax.scan` over the frame body.

    The streaming engine emits one chunk per dispatch (10 frames ≈ 800 ms of
    audio per call), so end-to-end throughput is independent of host→device
    dispatch latency. Frames after CODEC_EOS are still computed (scan cannot
    break) but flagged via the returned `valid` mask and dropped host-side —
    bounded waste of < one chunk, matching the reference's EOS check
    granularity (reference: tts_engine.py:302-303).

    Returns (state, codes [num_frames, 16], valid [num_frames] bool,
    next_token, next_hidden).
    """
    from ..core.config import CODEC_EOS

    def body(carry, i):
        state, tok, hid, alive = carry
        r = frame_step(
            talker_cfg, cp_cfg, talker_w, cp_w, state, tok, hid,
            trailing, trailing_len, trailing_idx0 + i, tts_pad_embed,
            jax.random.fold_in(rng, trailing_idx0 + i),   # absolute frame index:
            # sampling streams are invariant to chunk boundaries, so
            # streaming (1+10+10...) and non-streaming (10+10...) chunkings
            # produce byte-identical codec frames for the same seed.
            do_sample=do_sample, temperature=temperature, top_k=top_k,
            attn_impl=attn_impl, cp_step_w=cp_step_w,
            mrope_deltas=mrope_deltas)
        still_alive = jnp.logical_and(alive, tok != CODEC_EOS)
        return ((r.state, r.next_token, r.next_hidden, still_alive),
                (r.codes, still_alive))

    (state, tok, hid, _), (codes, valid) = jax.lax.scan(
        body, (state, prev_token, hidden, jnp.bool_(True)),
        jnp.arange(num_frames, dtype=jnp.int32))
    return state, codes, valid, tok, hid


@partial(jax.jit, static_argnames=("cfg", "attn_impl"), donate_argnames=("state",))
def talker_prefill(
    cfg: DecoderConfig,
    w: DecoderWeights,
    state: DecodeState,
    embeds: jax.Array,            # [T, H]
    attn_impl: str = "dense",
    mrope_deltas=None,            # [n_sections] int32 (see frame_step)
):
    """Batched prefill + the first decode step from CODEC_BOS fused into one
    dispatch (reference: tts_engine.py:281-289 does 8 sequential steps then a
    9th). Returns (state, first_token, first_hidden)."""
    mrope = mrope_deltas is not None and cfg.mrope_section is not None
    mp = (state.position + mrope_deltas) if mrope else None
    state, _ = forward_chunk(cfg, w, state, embeds, mrope_pos=mp)
    from ..core.config import CODEC_BOS

    bos_embed = w.embed[CODEC_BOS]
    mp = (state.position + mrope_deltas) if mrope else None
    state, token, hidden = decode_step_with_embed(cfg, w, state, bos_embed,
                                                  attn_impl=attn_impl,
                                                  mrope_pos=mp)
    return state, token, hidden
