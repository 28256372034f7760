"""Original Qwen3-0.6B text language model on the same decoder core.

JAX equivalent of the reference's original text-LM path
(reference: qwen_megakernel/model.py:1-247): same 28-layer architecture as
the TTS talker but with the 151936 text vocab, tied embeddings/LM head, and
rope_theta 10000. One decoder implementation serves all three model
families (text LM / talker / code predictor) — the TPU analog of the
reference's runtime `num_layers` + compile-time `LDG_VOCAB_SIZE` tricks
(reference: csrc/kernel.cu:1251, build.py:17-63 vs build_tts.py:22-43).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DecoderConfig
from ..core.weights import (
    DecoderWeights,
    _stack_layers,
    make_rope_table,
)

TEXT_LM_CONFIG = DecoderConfig(
    num_layers=28,
    vocab_size=151936,
    max_seq_len=2048,
    rope_theta=10000.0,
)


def load_text_lm_weights(
    model_path: str = "Qwen/Qwen3-0.6B",
    cfg: DecoderConfig = TEXT_LM_CONFIG,
    dtype=jnp.bfloat16,
    verbose: bool = True,
):
    """Load Qwen3-0.6B from a local dir / HF hub (reference: model.py:23-96).

    Returns (DecoderWeights, tokenizer-or-None). Embeddings are tied:
    lm_head = embed.T (reference: model.py:92 `lm_head_weight=embed_weight`).
    """
    import os

    if os.path.isdir(model_path):
        st_path = os.path.join(model_path, "model.safetensors")
    else:
        from huggingface_hub import hf_hub_download

        st_path = hf_hub_download(model_path, "model.safetensors")
    if verbose:
        print(f"Loading text LM from {st_path}...")

    from safetensors import safe_open

    state: dict[str, np.ndarray] = {}
    with safe_open(st_path, framework="np") as f:
        for k in f.keys():
            state[k] = f.get_tensor(k)

    layers = _stack_layers(state, "model.layers.", cfg.num_layers, dtype)
    embed = jnp.asarray(state["model.embed_tokens.weight"], dtype=dtype)
    w = DecoderWeights(
        layers=layers,
        final_norm=jnp.asarray(state["model.norm.weight"], dtype=dtype),
        embed=embed,
        lm_head=embed.T,   # tied
        rope=make_rope_table(cfg),
    )
    tokenizer = None
    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_path)
    except Exception:
        pass
    return w, tokenizer


import functools


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl", "kv_dtype"))
def _prefill_ids(cfg: DecoderConfig, w: DecoderWeights, ids: jax.Array,
                 attn_impl: str = "dense", kv_dtype=jnp.bfloat16):
    """Embed + fresh-state prefill + first greedy token, ONE dispatch.

    `prefill`/`forward_chunk` are deliberately un-jitted building blocks
    (the engine fuses them into its own closed-signature functions); called
    bare they execute eagerly — hundreds of per-op tunnel round trips,
    ~1.2 s measured (benchmarks/exp_lm_stream_timing.py). This wrapper is
    the text-LM's single fused prefill boundary."""
    from ..models.decoder import init_state, prefill

    state = init_state(cfg, kv_dtype)
    return prefill(cfg, w, state, w.embed[ids], attn_impl=attn_impl)


class TextLM:
    """Prompt-in, tokens-out text generation (reference: model.py:168-247).

    `kv_cache="int8"` stores the KV cache per-row-quantized (the same
    int8-KV machinery as the talker serve path) — cache reads are the
    position-proportional term of the per-token bytes, so the win grows
    with context length."""

    def __init__(self, weights: DecoderWeights, cfg: DecoderConfig = TEXT_LM_CONFIG,
                 tokenizer=None, attn_impl: str = "dense",
                 kv_cache: str = "bf16"):
        self.cfg = cfg
        self.w = weights
        self.tokenizer = tokenizer
        self.attn_impl = attn_impl
        self.kv_dtype = jnp.int8 if kv_cache == "int8" else jnp.bfloat16

    def generate(self, prompt_ids, max_new_tokens: int = 64) -> list[int]:
        """Greedy generation: batched prefill of the prompt, then a fused
        `lax.scan` decode (the generate_nosync equivalent,
        reference: model.py:209-247, kernel.cu:1555-1613)."""
        from ..runtime.generate import generate_tokens

        ids = jnp.asarray(np.asarray(prompt_ids), dtype=jnp.int32)
        state, first, _ = _prefill_ids(self.cfg, self.w, ids,
                                       attn_impl=self.attn_impl,
                                       kv_dtype=self.kv_dtype)
        state, tokens = generate_tokens(
            self.cfg, self.w, state, first, max_new_tokens - 1,
            attn_impl=self.attn_impl)
        return [int(first)] + [int(t) for t in np.asarray(tokens)]

    def generate_stream(self, prompt_ids, max_new_tokens: int = 256,
                        chunk: int = 32, stop_ids: tuple = ()):
        """Greedy generation yielding `chunk`-token batches as they decode.

        Each batch is ONE fused device dispatch (the same scan as
        `generate`, jit-specialized once for the fixed chunk length), so
        streaming costs one host round trip per `chunk` tokens instead of
        per token. Stops early when a token in `stop_ids` appears (the
        stop token is not yielded). Greedy determinism makes the streamed
        sequence identical to `generate`'s, chunking-invariant.

        This is the producer side of the on-chip agent loop
        (demos/demo_local_agent.py): the consumer hands finished sentences
        to the TTS engine while later chunks are still decoding.
        """
        ids = jnp.asarray(np.asarray(prompt_ids), dtype=jnp.int32)
        state, first, _ = _prefill_ids(self.cfg, self.w, ids,
                                       attn_impl=self.attn_impl,
                                       kv_dtype=self.kv_dtype)
        tok = first
        emitted = int(np.asarray(first))
        if emitted in stop_ids:
            return
        yield [emitted]
        produced = 1
        from ..runtime.generate import generate_tokens

        while produced < max_new_tokens:
            n = min(chunk, max_new_tokens - produced)
            state, tokens = generate_tokens(self.cfg, self.w, state, tok,
                                            n, attn_impl=self.attn_impl)
            tok = tokens[-1]
            host = [int(t) for t in np.asarray(tokens)]
            for i, t in enumerate(host):
                if t in stop_ids:
                    if i:
                        yield host[:i]
                    return
            yield host
            produced += n
