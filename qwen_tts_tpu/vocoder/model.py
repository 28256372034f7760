"""JAX vocoder: 16-group codec frames @12.5 Hz → 24 kHz PCM.

The reference imports `Qwen3TTSTokenizerV2Model` from the external `qwen-tts`
package and calls `.decode([{"audio_codes": codes}])`
(reference: tts_engine.py:158-209, 337-350) — the vocoder's own code is NOT
part of the reference repo. This module provides the TPU-native equivalent
surface: a neural codec decoder that runs fully on-chip under jit.

Architecture (config-driven, HiFi-GAN/DAC-family):
  per-group codebook embeddings (16 × [2048, D]) summed per frame
  → pre-net of ConvNeXt-style blocks at frame rate
  → transposed-conv upsampling chain (prod(factors) × 12.5 Hz = 24 kHz)
  → residual conv blocks per stage → final conv + tanh.

Weights load from a safetensors file when available (`loader.py`); in
hermetic environments the engine falls back to random-init (timing-accurate)
or silence, mirroring the reference's vocoder-unavailable degraded mode
(reference: tts_engine.py:204-209).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VocoderConfig:
    num_code_groups: int = 16
    codebook_size: int = 2048
    dim: int = 512
    prenet_blocks: int = 4
    upsample_factors: tuple[int, ...] = (8, 6, 5, 4, 2)   # prod = 1920 = 24000/12.5
    upsample_kernels: tuple[int, ...] = (16, 12, 10, 8, 4)
    resblock_kernel: int = 7
    sample_rate: int = 24000

    @property
    def hop_length(self) -> int:
        out = 1
        for f in self.upsample_factors:
            out *= f
        return out


class ConvNeXtBlock(NamedTuple):
    dw_kernel: jax.Array    # [K, 1, D]  depthwise
    norm_scale: jax.Array   # [D]
    norm_bias: jax.Array    # [D]
    pw1: jax.Array          # [D, 4D]
    pw1_b: jax.Array        # [4D]
    pw2: jax.Array          # [4D, D]
    pw2_b: jax.Array        # [D]


class UpsampleStage(NamedTuple):
    ct_kernel: jax.Array    # [K, Cout, Cin] conv_transpose kernel
    ct_bias: jax.Array      # [Cout]
    res1: jax.Array         # [K, Cout, Cout]
    res1_b: jax.Array       # [Cout]
    res2: jax.Array         # [K, Cout, Cout]
    res2_b: jax.Array       # [Cout]


class VocoderWeights(NamedTuple):
    code_embeds: jax.Array             # [G, codebook, D]
    prenet: tuple[ConvNeXtBlock, ...]
    stages: tuple[UpsampleStage, ...]
    out_kernel: jax.Array              # [K, C_last, 1]
    out_bias: jax.Array                # [1]


def init_vocoder_weights(key: jax.Array, cfg: VocoderConfig,
                         dtype=jnp.float32) -> VocoderWeights:
    ks = iter(jax.random.split(key, 64))

    def mat(shape, fan_in):
        return (jax.random.normal(next(ks), shape, dtype=jnp.float32)
                / np.sqrt(fan_in)).astype(dtype)

    d = cfg.dim
    prenet = tuple(
        ConvNeXtBlock(
            dw_kernel=mat((7, 1, d), 7),
            norm_scale=jnp.ones((d,), dtype=dtype),
            norm_bias=jnp.zeros((d,), dtype=dtype),
            pw1=mat((d, 4 * d), d),
            pw1_b=jnp.zeros((4 * d,), dtype=dtype),
            pw2=mat((4 * d, d), 4 * d),
            pw2_b=jnp.zeros((d,), dtype=dtype),
        )
        for _ in range(cfg.prenet_blocks)
    )
    stages = []
    c_in = d
    for f, k in zip(cfg.upsample_factors, cfg.upsample_kernels):
        c_out = max(c_in // 2, 16)
        rk = cfg.resblock_kernel
        stages.append(UpsampleStage(
            ct_kernel=mat((k, c_out, c_in), c_in * k // f),
            ct_bias=jnp.zeros((c_out,), dtype=dtype),
            res1=mat((rk, c_out, c_out), c_out * rk),
            res1_b=jnp.zeros((c_out,), dtype=dtype),
            res2=mat((rk, c_out, c_out), c_out * rk),
            res2_b=jnp.zeros((c_out,), dtype=dtype),
        ))
        c_in = c_out
    return VocoderWeights(
        code_embeds=mat((cfg.num_code_groups, cfg.codebook_size, d), d),
        prenet=prenet,
        stages=tuple(stages),
        out_kernel=mat((7, c_in, 1), c_in * 7),
        out_bias=jnp.zeros((1,), dtype=dtype),
    )


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                eps: float = 1e-6) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _conv1d(x: jax.Array, kernel: jax.Array, bias: jax.Array,
            groups: int = 1) -> jax.Array:
    """x: [T, C_in], kernel: [K, C_in//groups, C_out] → [T, C_out] (SAME pad)."""
    out = jax.lax.conv_general_dilated(
        x[None], kernel,
        window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )[0]
    return out + bias


def _conv_transpose1d(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                      stride: int) -> jax.Array:
    """x: [T, C_in], kernel: [K, C_out, C_in] → [T*stride, C_out]."""
    out = jax.lax.conv_transpose(
        x[None], kernel,
        strides=(stride,), padding="SAME",   # SAME ⇒ out_len = T * stride
        dimension_numbers=("NWC", "WOI", "NWC"),
    )[0]
    return out + bias


def _convnext_block(x: jax.Array, b: ConvNeXtBlock) -> jax.Array:
    h = _conv1d(x, b.dw_kernel, jnp.zeros((x.shape[-1],), x.dtype),
                groups=x.shape[-1])
    h = _layer_norm(h, b.norm_scale, b.norm_bias)
    h = jnp.dot(h, b.pw1, preferred_element_type=jnp.float32) + b.pw1_b
    h = jax.nn.gelu(h)
    h = jnp.dot(h, b.pw2, preferred_element_type=jnp.float32) + b.pw2_b
    return x + h


def vocoder_decode(cfg: VocoderConfig, w: VocoderWeights,
                   codes: jax.Array) -> jax.Array:
    """codes [T, 16] int32 → waveform [T * hop_length] f32 in [-1, 1]."""
    T = codes.shape[0]
    g_ids = jnp.arange(cfg.num_code_groups)[:, None]                      # [G, 1]
    x = jnp.sum(w.code_embeds[g_ids, codes.T.astype(jnp.int32)], axis=0)  # [T, D]

    for blk in w.prenet:
        x = _convnext_block(x, blk)

    for stage, f in zip(w.stages, cfg.upsample_factors):
        x = jax.nn.leaky_relu(x, 0.1)
        x = _conv_transpose1d(x, stage.ct_kernel, stage.ct_bias, f)
        r = _conv1d(jax.nn.leaky_relu(x, 0.1), stage.res1, stage.res1_b)
        r = _conv1d(jax.nn.leaky_relu(r, 0.1), stage.res2, stage.res2_b)
        x = x + r

    x = _conv1d(jax.nn.leaky_relu(x, 0.1), w.out_kernel, w.out_bias)
    return jnp.tanh(x[:, 0])
