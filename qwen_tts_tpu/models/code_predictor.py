"""Code predictor — 5-layer transformer producing codebook groups 1..15.

TPU-native redesign of the reference's two implementations
(reference: model_tts.py:377-619 pure-torch, model_tts.py:622-773 kernel
path). Key differences, all TPU-first:

- The whole `predict` (2-token prefill + 15 sample→embed→step iterations) is
  ONE function traced under jit — `lax.scan` over the 15 groups replaces the
  reference's 16 separate megakernel launches + torch sampling per frame
  (reference: tts_engine.py:301-335 call stack).
- The 2-token prefill runs as a single batched causal forward instead of two
  sequential steps (reference: model_tts.py:744-748).
- The per-group LM heads `[15, H, 2048]` and codec embeddings `[15, 2048, H]`
  ride through the scan as `xs`, so each iteration streams exactly one
  group's head from HBM.
- The KV cache is allocated fresh inside the function (max_seq 64), so the
  reference's `reset()` (model_tts.py:706-709) is implicit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.config import DecoderConfig
from ..core.weights import CodePredictorWeights
from ..ops.sampling import sample_logits
from .decoder import (
    DecodeState,
    forward_chunk,
    init_state,
)


@partial(jax.jit, static_argnames=(
    "cfg", "do_sample", "temperature", "top_k", "num_groups", "return_logits",
    "attn_impl", "interpret"))
def cp_predict(
    cfg: DecoderConfig,
    w: CodePredictorWeights,
    talker_hidden: jax.Array,      # [H] f32 — talker post-final-norm hidden
    first_token: jax.Array,        # int32 — talker's codebook-0 token
    talker_embed_table: jax.Array, # [3072, H] bf16 — talker codec embedding
    rng: jax.Array,
    do_sample: bool = True,
    temperature: float = 0.9,
    top_k: int = 50,
    num_groups: int = 15,
    return_logits: bool = False,
    attn_impl: str = "dense",
    step_w=None,                   # optional DecoderWeights override for the
                                   # 15 single-token steps only (A/B tests).
                                   # Serving passes step_w=None with
                                   # `w.decoder` ALREADY quantized, so both
                                   # the 2-token prefill (quant-aware dense
                                   # path, decoder.forward_chunk per-layer
                                   # dequant) and the steps read the same
                                   # int8/int4 weights — no bf16 copy exists
                                   # (engine/tts_engine.py initialize()).
    interpret: bool = False,       # Pallas interpret mode (CPU tests)
) -> jax.Array:
    """Predict all 16 codebook groups for one audio frame.

    Returns `[16]` int32: `[first_token, predicted_1..15]`
    (reference: model_tts.py:728-773).
    """
    state = init_state(cfg)
    sw = w.decoder if step_w is None else step_w

    # Prefill positions 0-1: [talker_hidden, embed(first_token)] in ONE forward
    first_embed = talker_embed_table[first_token].astype(jnp.float32)
    prefill_embeds = jnp.stack([talker_hidden, first_embed])        # [2, H]
    state, normed = forward_chunk(cfg, w.decoder, state, prefill_embeds)
    last_hidden = normed[-1]                                        # [H] f32

    def body(carry, xs):
        state, last_hidden = carry
        lm_head, codec_embed, g = xs                 # [H,2048], [2048,H], int32
        logits = jnp.dot(last_hidden.astype(jnp.bfloat16), lm_head,
                         preferred_element_type=jnp.float32)        # [2048]
        token = sample_logits(logits, jax.random.fold_in(rng, g),
                              do_sample, temperature, top_k)
        embed = codec_embed[token].astype(jnp.float32)              # [H]
        state, normed = forward_chunk(cfg, sw, state, embed[None],
                                      attn_impl=attn_impl,
                                      interpret=interpret)
        return (state, normed[0]), (token, logits)

    xs = (w.lm_heads, w.codec_embeds, jnp.arange(num_groups, dtype=jnp.int32))
    (_, _), (tokens, logits) = jax.lax.scan(body, (state, last_hidden), xs)

    codes = jnp.concatenate([first_token[None].astype(jnp.int32), tokens])
    if return_logits:
        return codes, logits
    return codes
