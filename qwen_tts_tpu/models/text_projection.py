"""Text embedding + projection MLP (151936 → 2048 → SiLU → 1024).

JAX port of the reference TextProjection (reference: model_tts.py:348-374):
`embedding(ids) → SiLU(fc1) → fc2`, bf16 weights, batched over the whole
token sequence in one call (reference: tts_engine.py:263).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.weights import TextProjectionWeights


def embed_text_ids(w: TextProjectionWeights, token_ids: jax.Array) -> jax.Array:
    """[T] int32 → [T, hidden_size] bf16."""
    x = w.text_embedding[token_ids]                                    # [T, 2048]
    x = jax.nn.silu(jnp.dot(x, w.fc1_w, preferred_element_type=jnp.float32)
                    + w.fc1_b.astype(jnp.float32))
    x = (jnp.dot(x.astype(w.fc2_w.dtype), w.fc2_w,
                 preferred_element_type=jnp.float32)
         + w.fc2_b.astype(jnp.float32))
    return x.astype(jnp.bfloat16)
