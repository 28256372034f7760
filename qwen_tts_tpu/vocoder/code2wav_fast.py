"""Packed (MXU-form) Code2Wav forward — the TPU-fast path.

`code2wav.py` keeps the faithful torch-layout port ([B, C, T] NCH convs,
transposed convs via `lhs_dilation`) for checkpoint conversion and torch
parity. This module re-expresses the SAME network as plain matmuls in
NHC layout ([B, T, C], channels on lanes), which is how the TPU wants it:

- **Transposed convs → phase matmuls.** A ConvTranspose1d(k=2s, stride=s)
  with the causal trim (k - s both sides) is exactly
      out[j*s + p] = x[j+1] @ W[p] + x[j] @ W[s+p],   p ∈ [0, s)
  i.e. ONE matmul `concat(x[1:], x[:-1]) [T-1, 2I] @ Wp [2I, s*O]` and a
  reshape. The lhs_dilation form computes the same thing by zero-stuffing
  the input — at stride 8 that is 87.5% multiplies-by-zero. The k=s
  upsample stages are the 1-tap case: `x @ Wp [I, s*O]`, no trim.
- **Causal k-tap convs → unfold + one matmul.** Left-pad (k-1)*d, gather
  the k dilated shifts on the channel axis, multiply [T, k*I] @ [k*I, O].
  Depthwise convs (ConvNeXt) stay elementwise shifted MACs on the VPU.
- **bf16 matrices, f32 accumulation/statistics.** Norm scales, biases,
  and SnakeBeta parameters stay f32; every dot accumulates f32
  (`preferred_element_type`); Snake/LayerNorm/RMSNorm compute in f32 and
  cast back, which XLA fuses into the surrounding elementwise chain.

Parity: `pack_code2wav_weights(..., dtype=float32)` matches
`code2wav_apply` to float32 round-off (structure parity); the bf16
packing is the production path (tests/test_code2wav.py).

Reference for the architecture being packed: vocoder/code2wav.py
(itself a tested port of transformers' Qwen3OmniMoeCode2Wav,
modeling_qwen3_omni_moe.py:3209-3763).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .code2wav import (
    Code2WavConfig,
    Code2WavWeights,
    TransformerLayer,
    _transformer,
)


@jax.tree_util.register_pytree_node_class
class PackedConv:
    """Matmul-form causal conv; (k, dilation) are STATIC pytree aux data
    so `range(k)` unrolls at trace time."""

    def __init__(self, w, b, k, dilation=1):
        self.w = w          # [K*I, O] (tap-major rows)
        self.b = b          # [O] f32
        self.k = k
        self.dilation = dilation

    def tree_flatten(self):
        return (self.w, self.b), (self.k, self.dilation)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


@jax.tree_util.register_pytree_node_class
class PackedTransConv:
    """Phase-matmul transposed conv; (stride, taps) are STATIC aux data."""

    def __init__(self, w, b, stride, taps):
        self.w = w          # [I, s*O] (1-tap) or [2I, s*O] (2-tap)
        self.b = b          # [O] f32
        self.stride = stride
        self.taps = taps    # k // stride: 1 (upsample stages) or 2 (decoder)

    def tree_flatten(self):
        return (self.w, self.b), (self.stride, self.taps)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


class PackedConvNeXt(NamedTuple):
    dw_w: jax.Array     # [K, C] depthwise taps, f32
    dw_b: jax.Array     # [C] f32
    ln_scale: jax.Array  # [C] f32
    ln_bias: jax.Array   # [C] f32
    pw1: jax.Array      # [C, 4C]
    pw1_b: jax.Array    # [4C] f32
    pw2: jax.Array      # [4C, C]
    pw2_b: jax.Array    # [C] f32
    gamma: jax.Array    # [C] f32


class PackedUpsample(NamedTuple):
    up: PackedTransConv
    convnext: PackedConvNeXt


class PackedUnit(NamedTuple):
    alpha1: jax.Array   # [C] f32 (SnakeBeta)
    beta1: jax.Array
    conv1: PackedConv   # k=7, dilation d
    alpha2: jax.Array
    beta2: jax.Array
    conv2: PackedConv   # k=1 → plain matmul


class PackedDecBlock(NamedTuple):
    alpha: jax.Array    # [I] f32
    beta: jax.Array
    up: PackedTransConv
    units: tuple        # 3 × PackedUnit (dilations 1, 3, 9)


class PackedCode2Wav(NamedTuple):
    embed: jax.Array    # [codebook_size*Q, H]
    layers: tuple       # TransformerLayer (dtype-cast) — reuses _transformer
    final_norm: jax.Array
    upsample: tuple     # PackedUpsample
    dec_pre: PackedConv
    dec_blocks: tuple   # PackedDecBlock
    dec_alpha: jax.Array
    dec_beta: jax.Array
    dec_post: PackedConv


# ---------------------------------------------------------------------------
# packing


def pack_code2wav_weights(cfg: Code2WavConfig, w: Code2WavWeights,
                          dtype=jnp.bfloat16) -> PackedCode2Wav:
    """Transform torch-layout Code2WavWeights into matmul form.

    `dtype` sets the matrix dtype (bf16 production, f32 for structural
    parity tests); biases / norm / Snake parameters always stay f32."""
    f32 = jnp.float32

    def conv(c, dilation=1):
        # torch Conv1d [O, I, K] → [K*I, O], tap-major
        o, i, k = c.w.shape
        wm = jnp.transpose(c.w, (2, 1, 0)).reshape(k * i, o)
        return PackedConv(wm.astype(dtype), c.b.astype(f32), k, dilation)

    def tconv(c, stride):
        # torch ConvTranspose1d [I, O, K]; K == stride → 1 tap,
        # K == 2*stride → 2 taps ordered (x[j+1]-taps, x[j]-taps)
        i, o, k = c.w.shape
        taps = k // stride
        if taps == 1:
            wm = jnp.transpose(c.w, (0, 2, 1)).reshape(i, stride * o)
        else:
            top = jnp.transpose(c.w[:, :, :stride], (0, 2, 1)).reshape(
                i, stride * o)
            bot = jnp.transpose(c.w[:, :, stride:], (0, 2, 1)).reshape(
                i, stride * o)
            wm = jnp.concatenate([top, bot], axis=0)
        return PackedTransConv(wm.astype(dtype), c.b.astype(f32), stride, taps)

    def convnext(blk):
        c, _, k = blk.dw.w.shape
        dw = jnp.transpose(blk.dw.w[:, 0, :], (1, 0))      # [K, C]
        return PackedConvNeXt(
            dw.astype(f32), blk.dw.b.astype(f32),
            blk.ln_scale.astype(f32), blk.ln_bias.astype(f32),
            blk.pw1.astype(dtype), blk.pw1_b.astype(f32),
            blk.pw2.astype(dtype), blk.pw2_b.astype(f32),
            blk.gamma.astype(f32))

    def unit(u, dil):
        return PackedUnit(
            u.alpha1.astype(f32), u.beta1.astype(f32), conv(u.conv1, dil),
            u.alpha2.astype(f32), u.beta2.astype(f32), conv(u.conv2))

    def layer(lw):
        return TransformerLayer(*[x.astype(dtype) for x in lw])

    return PackedCode2Wav(
        embed=w.embed.astype(dtype),
        layers=tuple(layer(lw) for lw in w.layers),
        final_norm=w.final_norm.astype(dtype),
        upsample=tuple(
            PackedUpsample(tconv(st.up, r), convnext(st.convnext))
            for st, r in zip(w.upsample, cfg.upsampling_ratios)),
        dec_pre=conv(w.dec_pre),
        dec_blocks=tuple(
            PackedDecBlock(
                blk.alpha.astype(f32), blk.beta.astype(f32),
                tconv(blk.up, r),
                tuple(unit(u, d) for u, d in zip(blk.units, (1, 3, 9))))
            for blk, r in zip(w.dec_blocks, cfg.upsample_rates)),
        dec_alpha=w.dec_alpha.astype(f32),
        dec_beta=w.dec_beta.astype(f32),
        dec_post=conv(w.dec_post))


# ---------------------------------------------------------------------------
# packed primitives — all on [B, T, C]


def _mm_conv(x: jax.Array, c: PackedConv) -> jax.Array:
    """Causal k-tap (dilated) conv as unfold + one matmul. Returns f32."""
    b_, t, _ = x.shape
    if c.k == 1:
        y = jnp.dot(x, c.w, preferred_element_type=jnp.float32)
        return y + c.b
    pad = (c.k - 1) * c.dilation
    xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    cols = jnp.concatenate(
        [lax.slice_in_dim(xp, j * c.dilation, j * c.dilation + t, axis=1)
         for j in range(c.k)], axis=-1)
    y = jnp.dot(cols, c.w, preferred_element_type=jnp.float32)
    return y + c.b


def _mm_tconv(x: jax.Array, c: PackedTransConv) -> jax.Array:
    """Phase-matmul transposed conv (see module docstring). Returns f32
    [B, T*s, O] (1 tap) or [B, (T-1)*s, O] (2 taps, trim folded in)."""
    b_, t, _ = x.shape
    s = c.stride
    if c.taps == 1:
        y = jnp.dot(x, c.w, preferred_element_type=jnp.float32)
        o = y.shape[-1] // s
        y = y.reshape(b_, t, s, o) + c.b
        return y.reshape(b_, t * s, o)
    pair = jnp.concatenate([x[:, 1:], x[:, :-1]], axis=-1)   # [B, T-1, 2I]
    y = jnp.dot(pair, c.w, preferred_element_type=jnp.float32)
    o = y.shape[-1] // s
    y = y.reshape(b_, t - 1, s, o) + c.b
    return y.reshape(b_, (t - 1) * s, o)


def _snake(x: jax.Array, alpha: jax.Array, beta: jax.Array,
           out_dtype) -> jax.Array:
    """SnakeBeta on [B, T, C], f32 internal math (sin² is precision-
    sensitive; the cast chain fuses into neighbouring elementwise ops)."""
    xf = x.astype(jnp.float32)
    a = jnp.exp(alpha)
    b = jnp.exp(beta)
    return (xf + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(xf * a))).astype(
        out_dtype)


def _dw_conv(x: jax.Array, c: PackedConvNeXt) -> jax.Array:
    """Depthwise causal k-tap conv as shifted elementwise MACs (VPU)."""
    b_, t, _ = x.shape
    k = c.dw_w.shape[0]
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (k - 1, 0), (0, 0)))
    y = c.dw_b + sum(
        lax.slice_in_dim(xp, j, j + t, axis=1) * c.dw_w[j] for j in range(k))
    return y


def _convnext(x: jax.Array, c: PackedConvNeXt) -> jax.Array:
    """ConvNeXt block on [B, T, C] — LayerNorm needs no transpose here."""
    h = _dw_conv(x, c)                                     # f32
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.var(h, axis=-1, keepdims=True)
    h = ((h - mean) * lax.rsqrt(var + 1e-6) * c.ln_scale + c.ln_bias)
    h = h.astype(x.dtype)
    h = jax.nn.gelu(
        jnp.dot(h, c.pw1, preferred_element_type=jnp.float32) + c.pw1_b,
        approximate=False).astype(x.dtype)
    h = jnp.dot(h, c.pw2, preferred_element_type=jnp.float32) + c.pw2_b
    return x + (c.gamma * h).astype(x.dtype)


# ---------------------------------------------------------------------------
# forward


def code2wav_apply_packed(cfg: Code2WavConfig, pw: PackedCode2Wav,
                          codes: jax.Array) -> jax.Array:
    """codes [B, Q, T] int32 → waveform [B, output_samples(T)] f32.

    Same network as code2wav.code2wav_apply (parity-tested), in packed
    matmul form. Activation dtype follows the packed matrix dtype."""
    dt = pw.embed.dtype
    offset = (jnp.arange(cfg.num_quantizers, dtype=codes.dtype)
              * cfg.codebook_size)[None, :, None]
    h = jnp.take(pw.embed, codes + offset, axis=0)          # [B, Q, T, H]
    h = jnp.mean(h.astype(jnp.float32), axis=1).astype(dt)  # [B, T, H]
    h = _transformer(cfg, pw, h)                            # reuses .layers
    for stage in pw.upsample:
        h = _mm_tconv(h, stage.up).astype(dt)
        h = _convnext(h, stage.convnext)
    h = _mm_conv(h, pw.dec_pre).astype(dt)
    for blk in pw.dec_blocks:
        h = _snake(h, blk.alpha, blk.beta, dt)
        h = _mm_tconv(h, blk.up).astype(dt)
        for unit in blk.units:
            r = _snake(h, unit.alpha1, unit.beta1, dt)
            r = _mm_conv(r, unit.conv1).astype(dt)
            r = _snake(r, unit.alpha2, unit.beta2, dt)
            r = _mm_conv(r, unit.conv2).astype(dt)
            h = h + r
    h = _snake(h, pw.dec_alpha, pw.dec_beta, dt)
    y = _mm_conv(h, pw.dec_post)                            # [B, T', 1] f32
    return jnp.clip(y[..., 0], -1.0, 1.0)
