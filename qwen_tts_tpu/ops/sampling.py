"""On-device sampling — top-k / temperature / categorical without host syncs.

TPU-native equivalent of the reference's GPU-resident sampling
(reference: model_tts.py:756-764 — top-k + multinomial with no `.item()`
round-trips). Uses `jax.lax.top_k` + Gumbel-max so the whole sampler stays
inside the jitted frame function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_logits(
    logits: jax.Array,        # [V] f32
    rng: jax.Array,
    do_sample: bool,
    temperature: float = 0.9,
    top_k: int = 50,
) -> jax.Array:
    """Return an int32 token. `do_sample`/`temperature`/`top_k` are static
    (compile-time) — matching the reference's per-call Python flags
    (reference: model_tts.py:729-764)."""
    if not do_sample or temperature <= 0.0:
        return jnp.argmax(logits).astype(jnp.int32)

    scaled = logits / temperature
    if top_k > 0 and top_k < logits.shape[-1]:
        vals, idxs = jax.lax.top_k(scaled, top_k)       # [k], [k]
        gumbel = jax.random.gumbel(rng, vals.shape, dtype=vals.dtype)
        choice = jnp.argmax(vals + gumbel)
        return idxs[choice].astype(jnp.int32)
    gumbel = jax.random.gumbel(rng, scaled.shape, dtype=scaled.dtype)
    return jnp.argmax(scaled + gumbel).astype(jnp.int32)
