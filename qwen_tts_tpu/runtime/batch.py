"""Batched (B>1) generation — a TPU-first capability extension.

The reference is strictly batch-1 (single hidden_buffer[1024], no batch dim
anywhere in kernel.cu — reference: SURVEY.md §2.3, model_tts.py:236). On
TPU, batch is the natural dp axis: everything here is `jax.vmap` over the
single-utterance frame path, so a `jax.sharding.Mesh` with batch-sharded
inputs runs B utterances data-parallel across chips with XLA inserting the
collectives (none are needed — utterances are independent).

Used by `TTSEngine.synthesize_batch` and exercised under an 8-virtual-device
CPU mesh in tests and by `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.config import DecoderConfig
from ..core.weights import CodePredictorWeights, DecoderWeights
from ..models.decoder import init_state
from .frame_loop import frames_chunk, talker_prefill


@partial(jax.jit, static_argnames=("cfg", "attn_impl", "kv_dtype"))
def batched_prefill(
    cfg: DecoderConfig,
    w: DecoderWeights,
    prefill_embeds: jax.Array,     # [B, 8, H]
    attn_impl: str = "dense",
    kv_dtype=jnp.bfloat16,         # jnp.int8 → per-row-scaled int8 KV cache
    mrope_deltas=None,             # [n_sections] int32, shared across batch
):
    """Fresh-state prefill + first CODEC_BOS decode for B utterances.

    Returns (state [B, ...], first_token [B], first_hidden [B, H])."""
    B = prefill_embeds.shape[0]

    def one(embeds):
        return talker_prefill(cfg, w, init_state(cfg, kv_dtype), embeds,
                              attn_impl=attn_impl,
                              mrope_deltas=mrope_deltas)

    return jax.vmap(one)(prefill_embeds)


@partial(jax.jit, static_argnames=(
    "talker_cfg", "cp_cfg", "num_frames", "do_sample", "temperature",
    "top_k", "attn_impl"), donate_argnames=("state",))
def batched_frames(
    talker_cfg: DecoderConfig,
    cp_cfg: DecoderConfig,
    talker_w: DecoderWeights,
    cp_w: CodePredictorWeights,
    state,                        # [B, ...] DecodeState
    prev_token: jax.Array,        # [B] int32
    hidden: jax.Array,            # [B, H] f32
    trailing: jax.Array,          # [B, T_pad, H]
    trailing_len: jax.Array,      # [B] int32
    trailing_idx0: jax.Array,     # [B] int32
    tts_pad_embed: jax.Array,     # [H]
    rng: jax.Array,               # [B, 2] per-utterance keys
    num_frames: int = 10,
    do_sample: bool = True,
    temperature: float = 0.9,
    top_k: int = 50,
    attn_impl: str = "dense",
    mrope_deltas=None,            # [n_sections] int32, shared across batch
):
    """`num_frames` frames for B utterances in ONE dispatch.

    Returns (state, codes [B, N, 16], valid [B, N], next_token [B],
    next_hidden [B, H])."""

    def one(state, tok, hid, trail, tlen, tidx0, key):
        return frames_chunk(
            talker_cfg, cp_cfg, talker_w, cp_w, state, tok, hid,
            trail, tlen, tidx0, tts_pad_embed, key,
            num_frames=num_frames, do_sample=do_sample,
            temperature=temperature, top_k=top_k, attn_impl=attn_impl,
            mrope_deltas=mrope_deltas)

    return jax.vmap(one)(state, prev_token, hidden, trailing,
                         trailing_len, trailing_idx0, rng)
