"""Sharding rules: how the TTS decoder maps onto a (dp, tp) mesh.

TPU-native extension beyond the single-chip reference (SURVEY.md §2.3: the
reference has no multi-device parallelism). Layout choices:

- ``tp`` shards attention over KV heads (8-way max for 8 KV heads — each tp
  shard owns whole GQA groups, so attention needs no communication) and the
  MLP over the intermediate dim; XLA inserts the reduce-scatter/all-reduce
  for `wo`/`w_down` contractions over ICI.
- ``dp`` shards a batch of independent utterances (the reference is
  hard-wired to batch 1; batching is a TPU-first capability extension).
- Norms and embeddings are replicated; the LM head is sharded over vocab.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import DecoderConfig
from ..core.weights import CodePredictorWeights, DecoderWeights, LayerWeights, RopeTable
from ..models.decoder import DecodeState


def layer_weight_specs() -> LayerWeights:
    """PartitionSpecs for the stacked per-layer weights."""
    return LayerWeights(
        input_norm=P(),
        wqkv=P(None, None, "tp"),       # [L, H, Q+2KV] — fused out dim
        q_norm=P(),
        k_norm=P(),
        wo=P(None, "tp", None),         # [L, Q, H]  — contract over sharded Q
        post_norm=P(),
        w_gate_up=P(None, None, "tp"),  # [L, H, 2I]
        w_down=P(None, "tp", None),     # [L, I, H]
    )


def decoder_weight_specs() -> DecoderWeights:
    return DecoderWeights(
        layers=layer_weight_specs(),
        final_norm=P(),
        embed=P(),
        lm_head=P(None, "tp"),       # [H, V] — shard vocab
        rope=RopeTable(cos=P(), sin=P()),
    )


def cp_weight_specs() -> CodePredictorWeights:
    return CodePredictorWeights(
        decoder=decoder_weight_specs(),
        lm_heads=P(None, None, "tp"),
        codec_embeds=P(),
    )


def batched_state_specs() -> DecodeState:
    """KV cache [B, L, KVH, S, D]: batch over dp, KV heads over tp."""
    return DecodeState(
        k_cache=P("dp", None, "tp"),
        v_cache=P("dp", None, "tp"),
        position=P(),
    )


def named(mesh: Mesh, spec_tree):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), spec_tree,
        is_leaf=lambda x: isinstance(x, P))


def shard_decoder_weights(mesh: Mesh, w: DecoderWeights) -> DecoderWeights:
    return jax.device_put(w, named(mesh, decoder_weight_specs()))


def shard_cp_weights(mesh: Mesh, w: CodePredictorWeights) -> CodePredictorWeights:
    return jax.device_put(w, named(mesh, cp_weight_specs()))
