"""Stateful TTSDecoder wrapper — API parity with the reference decoder.

Mirrors the reference `TTSDecoder` surface exactly — `step(token_id)`,
`step_with_embed(embed)`, `reset()`, `position`, `embed_weight`
(reference: model_tts.py:196-345) — on top of the functional JAX core. The
KV cache lives on device as a donated pytree; each step is one jitted
dispatch. The TTS engine's hot loop does NOT go through this class (it uses
the fused frame function in runtime/frame_loop.py); this wrapper exists for
parity, validation and benchmarks.

`backend="xla"` uses the pure-JAX scan-over-layers step;
`backend="pallas"` uses the chunked Pallas attention inside the XLA step;
`backend="mega"` uses the fully fused Pallas megakernel (ops/decode_step.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.config import DecoderConfig, TALKER_CONFIG
from ..core.weights import DecoderWeights
from ..models import decoder as _oracle
from ..models.decoder import DecodeState, init_state


def _get_step_fns(cfg: DecoderConfig, backend: str):
    if backend == "xla":
        step = partial(_oracle.decode_step, cfg)
        step_embed = partial(_oracle.decode_step_with_embed, cfg)
        prefill = partial(_oracle.prefill, cfg)
    elif backend in ("pallas", "mega"):
        step = partial(_oracle.decode_step, cfg, attn_impl=backend)
        step_embed = partial(_oracle.decode_step_with_embed, cfg, attn_impl=backend)
        prefill = partial(_oracle.prefill, cfg, attn_impl=backend)
    else:
        raise ValueError(f"unknown backend {backend!r}")
    return (
        jax.jit(step, donate_argnames=("state",)),
        jax.jit(step_embed, donate_argnames=("state",)),
        jax.jit(prefill, donate_argnames=("state",)),
    )


class TTSDecoder:
    """Stateful talker decoder (reference API: model_tts.py:196-345)."""

    def __init__(
        self,
        weights: DecoderWeights,
        cfg: DecoderConfig = TALKER_CONFIG,
        backend: str = "xla",
    ):
        self.cfg = cfg
        self.backend = backend
        self._w = weights
        self._step, self._step_embed, self._prefill = _get_step_fns(cfg, backend)
        self._state = init_state(cfg)

    # ── reference-parity API ─────────────────────────────────────────────

    def step(self, token_id: int) -> tuple[int, jax.Array]:
        """One decode step from a token id → (next_token, hidden_f32 [H])."""
        self._state, token, hidden = self._step(
            self._w, self._state, jnp.int32(token_id))
        return int(token), hidden

    def step_with_embed(self, embed) -> tuple[int, jax.Array]:
        """One decode step from a precomputed embedding (sentinel path,
        reference: model_tts.py:287-330)."""
        self._state, token, hidden = self._step_embed(self._w, self._state, embed)
        return int(token), hidden

    def prefill(self, embeds) -> tuple[int, jax.Array]:
        """Batched causal prefill of [T, H] embeddings (TPU-first extension —
        replaces T sequential step_with_embed calls)."""
        self._state, token, hidden = self._prefill(self._w, self._state, embeds)
        return int(token), hidden

    def reset(self):
        self._state = _reset(self._state)

    @property
    def position(self) -> int:
        return int(self._state.position)

    @property
    def embed_weight(self) -> jax.Array:
        """Codec embedding table [3072, 1024] bf16."""
        return self._w.embed

    # ── functional access (used by engine / tests) ──────────────────────

    @property
    def state(self) -> DecodeState:
        return self._state

    @state.setter
    def state(self, s: DecodeState):
        self._state = s


@jax.jit
def _reset(state: DecodeState) -> DecodeState:
    return DecodeState(
        k_cache=jnp.zeros_like(state.k_cache),
        v_cache=jnp.zeros_like(state.v_cache),
        position=jnp.zeros((), dtype=jnp.int32),
    )
