"""Qwen3-Omni Code2Wav vocoder — faithful JAX/TPU port of the public
`Qwen3OmniMoeCode2Wav` architecture (transformers ≥4.57,
models/qwen3_omni_moe/modeling_qwen3_omni_moe.py:3209-3763).

Why this architecture: the reference engine's vocoder is
`Qwen3TTSTokenizerV2Model` from the external `qwen-tts` package
(reference: tts_engine.py:158-209), whose code is not present in the
reference repo or this environment. Code2Wav is the same model family's
public codec decoder with the exact contract the TTS pipeline needs —
16 residual-codebook groups (`num_quantizers=16`, `codebook_size=2048`)
at 12.5 Hz, total upsample `prod((8,5,4,3)+(2,2)) = 1920` = the 24 kHz
hop this engine produces. Numerical parity with the torch module is
tested layer-by-layer in tests/test_code2wav.py (torch-cpu is a test
dependency only).

Structure (torch names in parens, for the checkpoint converter):
  codes [B, Q, T] → offset residual-codebook embedding, mean over Q
    (`code_embedding`, `code_offset`)
  → 8-layer sliding-window causal transformer @frame rate
    (`pre_transformer`: GQA attention + RoPE, SwiGLU MLP, RMSNorm,
     LayerScale residuals)
  → ×2×2 transposed-conv upsampling, each followed by a ConvNeXt block
    (`upsample.{i}.{0,1}`)
  → BigVGAN-style decoder: pre conv, 4 blocks of
    [SnakeBeta → strided transposed conv → 3 dilated residual units],
    SnakeBeta, post conv, clamp to [-1, 1] (`decoder.{i}`)

All convs are causal (left-padded); transposed convs trim (K - stride)
from BOTH sides, so each decoder block maps length L → L*r - r. For T
input frames the waveform length is T*1920 - 555 (555 = the telescoped
per-block trims) — `output_samples()` computes this exactly.

TPU notes: everything lowers to XLA `conv_general_dilated` / dots (MXU);
the module is one jittable pure function of (config, weights, codes).
Weights stay in torch's conv layouts ([O, I/g, K] / [I, O, K]) — XLA
re-lays them out at compile time, and keeping them verbatim makes the
checkpoint converter a transpose-free key mapping for convs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclasses.dataclass(frozen=True)
class Code2WavConfig:
    """Defaults mirror Qwen3OmniMoeCode2WavConfig (configuration_qwen3_omni_moe.py:1095-1117)."""

    codebook_size: int = 2048
    hidden_size: int = 1024
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    sliding_window: int = 72
    intermediate_size: int = 3072
    layer_scale_initial_scale: float = 0.01
    rms_norm_eps: float = 1e-5
    num_hidden_layers: int = 8
    num_quantizers: int = 16
    upsample_rates: tuple[int, ...] = (8, 5, 4, 3)
    upsampling_ratios: tuple[int, ...] = (2, 2)
    decoder_dim: int = 1536
    rope_theta: float = 10000.0
    sample_rate: int = 24000

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates + self.upsampling_ratios))

    @property
    def hop_length(self) -> int:
        """Engine-facing alias: nominal samples per codec frame."""
        return self.total_upsample

    @property
    def output_deficit(self) -> int:
        """Constant shortfall of the waveform vs T*hop_length, from the
        per-block transposed-conv trims: output_samples(T) = T*hop - deficit."""
        return self.hop_length - self.output_samples(1)

    def output_samples(self, frames: int) -> int:
        """Waveform samples produced for `frames` codec frames."""
        t = frames * int(np.prod(self.upsampling_ratios))
        for r in self.upsample_rates:
            t = t * r - r
        return t


class Conv(NamedTuple):
    w: jax.Array  # [O, I/groups, K] (torch Conv1d layout)
    b: jax.Array  # [O]


class TransConv(NamedTuple):
    w: jax.Array  # [I, O, K] (torch ConvTranspose1d layout)
    b: jax.Array  # [O]


class TransformerLayer(NamedTuple):
    wq: jax.Array        # [H, nh*hd]
    wk: jax.Array        # [H, kvh*hd]
    wv: jax.Array        # [H, kvh*hd]
    wo: jax.Array        # [nh*hd, H]
    w_gate: jax.Array    # [H, I]
    w_up: jax.Array      # [H, I]
    w_down: jax.Array    # [I, H]
    ln1: jax.Array       # [H] input RMSNorm
    ln2: jax.Array       # [H] post-attention RMSNorm
    scale_attn: jax.Array  # [H] LayerScale
    scale_mlp: jax.Array   # [H] LayerScale


class ConvNeXtBlock(NamedTuple):
    dw: Conv             # depthwise k=7, groups=dim
    ln_scale: jax.Array  # [C] LayerNorm (eps 1e-6)
    ln_bias: jax.Array   # [C]
    pw1: jax.Array       # [C, 4C]
    pw1_b: jax.Array     # [4C]
    pw2: jax.Array       # [4C, C]
    pw2_b: jax.Array     # [C]
    gamma: jax.Array     # [C]


class UpsampleStage(NamedTuple):
    up: TransConv        # k = stride = ratio (no trim)
    convnext: ConvNeXtBlock


class ResidualUnit(NamedTuple):
    alpha1: jax.Array    # [C] SnakeBeta
    beta1: jax.Array
    conv1: Conv          # k=7, dilation d
    alpha2: jax.Array
    beta2: jax.Array
    conv2: Conv          # k=1


class DecoderBlock(NamedTuple):
    alpha: jax.Array     # [in_dim] SnakeBeta
    beta: jax.Array
    up: TransConv        # k=2r, stride=r → trims r both sides
    units: tuple         # 3 × ResidualUnit at dilations (1, 3, 9)


class Code2WavWeights(NamedTuple):
    embed: jax.Array            # [codebook_size * Q, H]
    layers: tuple               # num_hidden_layers × TransformerLayer
    final_norm: jax.Array       # [H]
    upsample: tuple             # len(upsampling_ratios) × UpsampleStage
    dec_pre: Conv               # H → decoder_dim, k=7
    dec_blocks: tuple           # len(upsample_rates) × DecoderBlock
    dec_alpha: jax.Array        # [decoder_dim / 2^n]
    dec_beta: jax.Array
    dec_post: Conv              # → 1 channel, k=7


# ---------------------------------------------------------------------------
# primitives


def causal_conv(x: jax.Array, c: Conv, *, dilation: int = 1,
                groups: int = 1) -> jax.Array:
    """torch Qwen3OmniMoeCausalConvNet for stride=1: left-pad (K-1)*d, conv.

    (The torch module's extra right padding is 0 whenever stride == 1,
    which is every Conv1d use in this model.)
    """
    k = c.w.shape[-1]
    pad = (k - 1) * dilation
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, 0)))
    y = lax.conv_general_dilated(
        x, c.w, window_strides=(1,), padding=[(0, 0)],
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y + c.b[None, :, None]


def trans_conv(x: jax.Array, c: TransConv, *, stride: int) -> jax.Array:
    """torch Qwen3OmniMoeCausalTransConvNet: ConvTranspose1d(k, stride),
    then trim (k - stride) from both sides."""
    k = c.w.shape[-1]
    w = jnp.flip(c.w, axis=-1).transpose(1, 0, 2)  # → [O, I, K] correlation form
    y = lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=("NCH", "OIH", "NCH"))
    y = y + c.b[None, :, None]
    trim = k - stride
    if trim:
        y = y[..., trim:-trim]
    return y


def snake_beta(x: jax.Array, alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """SnakeBeta: x + 1/(e^beta + 1e-9) * sin^2(x * e^alpha), channelwise [B,C,T]."""
    a = jnp.exp(alpha)[None, :, None]
    b = jnp.exp(beta)[None, :, None]
    return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(x * a))


def _rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * lax.rsqrt(var + eps)).astype(x.dtype) * scale


def convnext_block(x: jax.Array, blk: ConvNeXtBlock) -> jax.Array:
    """x [B, C, T]; depthwise causal conv → LayerNorm → MLP(GELU) → gamma, residual."""
    c = x.shape[1]
    h = causal_conv(x, blk.dw, groups=c)
    h = h.transpose(0, 2, 1)  # [B, T, C]
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.var(h, axis=-1, keepdims=True)
    h = (h - mean) * lax.rsqrt(var + 1e-6) * blk.ln_scale + blk.ln_bias
    h = jax.nn.gelu(h @ blk.pw1 + blk.pw1_b, approximate=False)
    h = h @ blk.pw2 + blk.pw2_b
    h = blk.gamma * h
    return x + h.transpose(0, 2, 1)


def _rope_rows(cfg: Code2WavConfig, t: int) -> tuple[jax.Array, jax.Array]:
    d = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    freqs = jnp.arange(t, dtype=jnp.float32)[:, None] * inv[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _attention(cfg: Code2WavConfig, lw: TransformerLayer, x: jax.Array,
               cos: jax.Array, sin: jax.Array, mask: jax.Array) -> jax.Array:
    b, t, _ = x.shape
    nh, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = (x @ lw.wq).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = (x @ lw.wk).reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
    v = (x @ lw.wv).reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
    q = q * cos[None, None] + _rotate_half(q) * sin[None, None]
    k = k * cos[None, None] + _rotate_half(k) * sin[None, None]
    if nh != kvh:
        rep = nh // kvh
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd) @ lw.wo


def _transformer(cfg: Code2WavConfig, w: Code2WavWeights, x: jax.Array) -> jax.Array:
    t = x.shape[1]
    cos, sin = _rope_rows(cfg, t)
    cos, sin = cos.astype(x.dtype), sin.astype(x.dtype)
    idx = jnp.arange(t)
    # sliding-window causal: j <= i and i - j < window
    mask = (idx[None, :] <= idx[:, None]) & (
        idx[:, None] - idx[None, :] < cfg.sliding_window)
    for lw in w.layers:
        h = _rms_norm(x, lw.ln1, cfg.rms_norm_eps)
        x = x + lw.scale_attn * _attention(cfg, lw, h, cos, sin, mask)
        h = _rms_norm(x, lw.ln2, cfg.rms_norm_eps)
        h = (jax.nn.silu(h @ lw.w_gate) * (h @ lw.w_up)) @ lw.w_down
        x = x + lw.scale_mlp * h
    return _rms_norm(x, w.final_norm, cfg.rms_norm_eps)


# ---------------------------------------------------------------------------
# forward


def code2wav_apply(cfg: Code2WavConfig, w: Code2WavWeights,
                   codes: jax.Array) -> jax.Array:
    """codes [B, Q, T] int32 → waveform [B, output_samples(T)] in [-1, 1].

    Mirrors Qwen3OmniMoeCode2Wav.forward (modeling_qwen3_omni_moe.py:3738-3750).
    """
    offset = (jnp.arange(cfg.num_quantizers, dtype=codes.dtype)
              * cfg.codebook_size)[None, :, None]
    h = jnp.take(w.embed, codes + offset, axis=0)          # [B, Q, T, H]
    h = jnp.mean(h, axis=1)                                # [B, T, H]
    h = _transformer(cfg, w, h)
    h = h.transpose(0, 2, 1)                               # [B, H, T]
    for stage, ratio in zip(w.upsample, cfg.upsampling_ratios):
        h = trans_conv(h, stage.up, stride=ratio)
        h = convnext_block(h, stage.convnext)
    h = causal_conv(h, w.dec_pre)
    for blk, rate in zip(w.dec_blocks, cfg.upsample_rates):
        h = snake_beta(h, blk.alpha, blk.beta)
        h = trans_conv(h, blk.up, stride=rate)
        for unit, dil in zip(blk.units, (1, 3, 9)):
            r = h
            r = snake_beta(r, unit.alpha1, unit.beta1)
            r = causal_conv(r, unit.conv1, dilation=dil)
            r = snake_beta(r, unit.alpha2, unit.beta2)
            r = causal_conv(r, unit.conv2)
            h = h + r
    h = snake_beta(h, w.dec_alpha, w.dec_beta)
    h = causal_conv(h, w.dec_post)
    return jnp.clip(h[:, 0, :], -1.0, 1.0)


def chunked_decode(cfg: Code2WavConfig, w: Code2WavWeights, codes: jax.Array,
                   *, chunk_size: int = 300, left_context_size: int = 25,
                   apply_fn=None) -> jax.Array:
    """Streaming decode mirroring Qwen3OmniMoeCode2Wav.chunked_decode
    (modeling_qwen3_omni_moe.py:3752-3762): re-decode `left_context_size`
    frames of context per chunk, keep only the new samples."""
    fn = apply_fn or code2wav_apply
    total = cfg.total_upsample
    t = codes.shape[-1]
    wavs = []
    start = 0
    while start < t:
        end = min(start + chunk_size, t)
        ctx = left_context_size if start - left_context_size > 0 else start
        chunk = codes[..., start - ctx:end]
        wav = fn(cfg, w, chunk)
        wavs.append(wav[..., ctx * total:])
        start = end
    return jnp.concatenate(wavs, axis=-1)


# ---------------------------------------------------------------------------
# init + torch-checkpoint conversion


def init_code2wav_weights(key: jax.Array, cfg: Code2WavConfig,
                          dtype=jnp.float32) -> Code2WavWeights:
    """Random init with torch-matching shapes (magnitudes ~ fan-in normal)."""
    keys = iter(jax.random.split(key, 4096))

    def mat(shape, scale=None):
        s = scale if scale is not None else 1.0 / math.sqrt(shape[0])
        return (jax.random.normal(next(keys), shape) * s).astype(dtype)

    def conv(o, i, k):
        return Conv(mat((o, i, k), scale=1.0 / math.sqrt(i * k)),
                    jnp.zeros((o,), dtype))

    def tconv(i, o, k):
        return TransConv(mat((i, o, k), scale=1.0 / math.sqrt(i * k)),
                         jnp.zeros((o,), dtype))

    h, inter = cfg.hidden_size, cfg.intermediate_size
    nh, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    ls = cfg.layer_scale_initial_scale

    def layer():
        return TransformerLayer(
            wq=mat((h, nh * hd)), wk=mat((h, kvh * hd)), wv=mat((h, kvh * hd)),
            wo=mat((nh * hd, h)), w_gate=mat((h, inter)), w_up=mat((h, inter)),
            w_down=mat((inter, h)), ln1=jnp.ones((h,), dtype),
            ln2=jnp.ones((h,), dtype),
            scale_attn=jnp.full((h,), ls, dtype),
            scale_mlp=jnp.full((h,), ls, dtype))

    def convnext(c):
        return ConvNeXtBlock(
            dw=conv(c, 1, 7), ln_scale=jnp.ones((c,), dtype),
            ln_bias=jnp.zeros((c,), dtype), pw1=mat((c, 4 * c)),
            pw1_b=jnp.zeros((4 * c,), dtype), pw2=mat((4 * c, c)),
            pw2_b=jnp.zeros((c,), dtype), gamma=jnp.full((c,), 1e-6, dtype))

    def unit(c):
        return ResidualUnit(
            alpha1=jnp.zeros((c,), dtype), beta1=jnp.zeros((c,), dtype),
            conv1=conv(c, c, 7), alpha2=jnp.zeros((c,), dtype),
            beta2=jnp.zeros((c,), dtype), conv2=conv(c, c, 1))

    blocks = []
    for i, rate in enumerate(cfg.upsample_rates):
        i_dim = cfg.decoder_dim // (2 ** i)
        o_dim = cfg.decoder_dim // (2 ** (i + 1))
        blocks.append(DecoderBlock(
            alpha=jnp.zeros((i_dim,), dtype), beta=jnp.zeros((i_dim,), dtype),
            up=tconv(i_dim, o_dim, 2 * rate),
            units=tuple(unit(o_dim) for _ in range(3))))
    out_dim = cfg.decoder_dim // (2 ** len(cfg.upsample_rates))

    return Code2WavWeights(
        embed=mat((cfg.codebook_size * cfg.num_quantizers, h), scale=0.02),
        layers=tuple(layer() for _ in range(cfg.num_hidden_layers)),
        final_norm=jnp.ones((h,), dtype),
        upsample=tuple(UpsampleStage(up=tconv(h, h, r), convnext=convnext(h))
                       for r in cfg.upsampling_ratios),
        dec_pre=conv(cfg.decoder_dim, h, 7),
        dec_blocks=tuple(blocks),
        dec_alpha=jnp.zeros((out_dim,), dtype),
        dec_beta=jnp.zeros((out_dim,), dtype),
        dec_post=conv(1, out_dim, 7))


def convert_code2wav_state(state: dict, cfg: Code2WavConfig,
                           dtype=jnp.float32) -> Code2WavWeights:
    """Map a torch Qwen3OmniMoeCode2Wav state_dict (key names from
    modeling_qwen3_omni_moe.py:3704-3736) onto Code2WavWeights.

    `state` maps names → array-likes (torch tensors or numpy). Linear
    weights are transposed to this repo's [in, out] convention; conv
    weights keep torch layout (see module docstring).
    """

    def get(name):
        t = state[name]
        t = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        return jnp.asarray(t, dtype)

    def lin(name):
        return get(name).T

    def conv(prefix):
        return Conv(get(f"{prefix}.conv.weight"), get(f"{prefix}.conv.bias"))

    def tconv(prefix):
        return TransConv(get(f"{prefix}.conv.weight"), get(f"{prefix}.conv.bias"))

    def layer(i):
        p = f"pre_transformer.layers.{i}"
        return TransformerLayer(
            wq=lin(f"{p}.self_attn.q_proj.weight"),
            wk=lin(f"{p}.self_attn.k_proj.weight"),
            wv=lin(f"{p}.self_attn.v_proj.weight"),
            wo=lin(f"{p}.self_attn.o_proj.weight"),
            w_gate=lin(f"{p}.mlp.gate_proj.weight"),
            w_up=lin(f"{p}.mlp.up_proj.weight"),
            w_down=lin(f"{p}.mlp.down_proj.weight"),
            ln1=get(f"{p}.input_layernorm.weight"),
            ln2=get(f"{p}.post_attention_layernorm.weight"),
            scale_attn=get(f"{p}.self_attn_layer_scale.scale"),
            scale_mlp=get(f"{p}.mlp_layer_scale.scale"))

    def convnext(prefix):
        return ConvNeXtBlock(
            dw=conv(f"{prefix}.dwconv"),
            ln_scale=get(f"{prefix}.norm.weight"),
            ln_bias=get(f"{prefix}.norm.bias"),
            pw1=lin(f"{prefix}.pwconv1.weight"),
            pw1_b=get(f"{prefix}.pwconv1.bias"),
            pw2=lin(f"{prefix}.pwconv2.weight"),
            pw2_b=get(f"{prefix}.pwconv2.bias"),
            gamma=get(f"{prefix}.gamma"))

    def unit(prefix):
        return ResidualUnit(
            alpha1=get(f"{prefix}.act1.alpha"), beta1=get(f"{prefix}.act1.beta"),
            conv1=conv(f"{prefix}.conv1"),
            alpha2=get(f"{prefix}.act2.alpha"), beta2=get(f"{prefix}.act2.beta"),
            conv2=conv(f"{prefix}.conv2"))

    n_blocks = len(cfg.upsample_rates)
    blocks = []
    for i in range(n_blocks):
        p = f"decoder.{1 + i}.block"
        blocks.append(DecoderBlock(
            alpha=get(f"{p}.0.alpha"), beta=get(f"{p}.0.beta"),
            up=tconv(f"{p}.1"),
            units=tuple(unit(f"{p}.{2 + u}") for u in range(3))))

    return Code2WavWeights(
        embed=get("code_embedding.weight"),
        layers=tuple(layer(i) for i in range(cfg.num_hidden_layers)),
        final_norm=get("pre_transformer.norm.weight"),
        upsample=tuple(
            UpsampleStage(up=tconv(f"upsample.{i}.0"),
                          convnext=convnext(f"upsample.{i}.1"))
            for i in range(len(cfg.upsampling_ratios))),
        dec_pre=conv("decoder.0"),
        dec_blocks=tuple(blocks),
        dec_alpha=get(f"decoder.{1 + n_blocks}.alpha"),
        dec_beta=get(f"decoder.{1 + n_blocks}.beta"),
        dec_post=conv(f"decoder.{2 + n_blocks}"))
