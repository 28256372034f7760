"""Multi-step generation with zero host syncs — `lax.scan` over decode steps.

TPU-native equivalent of the reference's `generate_nosync` (N back-to-back
kernel launches with on-device token feedback and a single stream sync at the
end; reference: csrc/kernel.cu:1555-1613, torch_bindings.cpp:93-127). In JAX
the idiomatic form is a scan inside one jitted function: the token feedback
`lm_head → next input` never leaves the device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.config import DecoderConfig
from ..core.weights import DecoderWeights
from ..models.decoder import DecodeState, decode_step


@partial(jax.jit, static_argnames=("cfg", "num_steps", "attn_impl"),
         donate_argnames=("state",))
def generate_tokens(
    cfg: DecoderConfig,
    w: DecoderWeights,
    state: DecodeState,
    first_token: jax.Array,    # int32
    num_steps: int,
    attn_impl: str = "dense",
):
    """Greedy-decode `num_steps` tokens. Returns (state, tokens [num_steps] i32)."""

    def body(carry, _):
        state, token = carry
        state, next_token, _ = decode_step(cfg, w, state, token, attn_impl=attn_impl)
        return (state, next_token), next_token

    (state, _), tokens = jax.lax.scan(
        body, (state, first_token.astype(jnp.int32)), None, length=num_steps)
    return state, tokens
