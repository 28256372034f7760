"""Pure-JAX Qwen3 decoder — the correctness oracle and reference compute path.

Functional re-design of the reference's stateful CUDA decode
(reference: csrc/kernel.cu:1191-1432, validate_kernel.py:25-201): state (KV
cache + position) is an explicit pytree threaded through jitted functions,
the 28-layer loop is a `lax.scan` over layer-stacked weights, and multi-token
prefill runs as one batched causal forward instead of 8 sequential steps
(reference does 8 × step_with_embed, tts_engine.py:281-282 — on TPU a single
seq-mode forward costs the same weight traffic as ONE decode step).

Cache discipline (the TPU analog of the reference's in-place bf16 cache
append, kernel.cu:433-458): inside the scan over layers the KV cache is
READ-ONLY; each layer emits its new K/V columns as scan outputs, and a
single `[L, KVH, T, D]` dynamic_update_slice lands them after the scan.
This keeps XLA from materialising per-layer copies of the (up to ~1 GB)
cache — attention reads the old prefix and merges the in-flight token as a
virtual extra column, which is numerically identical.

Numerics match the reference oracle (validate_kernel.py:91-201): f32
residual stream, bf16 weights with f32 matmul accumulation, RMSNorm eps 1e-6
in f32, per-head QK-RMSNorm, half-split RoPE, GQA 16Q/8KV online attention.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DecoderConfig
from ..core.weights import DecoderWeights, LayerWeights


class DecodeState(NamedTuple):
    """KV cache + position. Layout `[L, KVH, S, D]` (reference: model_tts.py:227-231).

    With `kv_dtype=int8` (ops/generate_kernel.py) the cache holds per-row
    symmetric int8 values and `k_scale`/`v_scale` hold the f32 dequant
    scales, laid out `[L, KVH, S]` (position on the 128-lane axis — scale
    flushes are whole 128-row groups, which satisfies Mosaic's lane-dim
    alignment). bf16 mode leaves the scale fields None."""

    k_cache: jax.Array   # [L, KVH, S, D] bf16 | int8
    v_cache: jax.Array   # [L, KVH, S, D] bf16 | int8
    position: jax.Array  # int32 scalar
    k_scale: jax.Array | None = None   # [L, KVH, S] f32 (int8 mode only)
    v_scale: jax.Array | None = None


def init_state(cfg: DecoderConfig, dtype=jnp.bfloat16) -> DecodeState:
    shape = (cfg.num_layers, cfg.num_kv_heads, cfg.max_seq_len, cfg.head_dim)
    # k_scale/v_scale must be DISTINCT buffers: each is pallas-aliased to a
    # different kernel output, and sharing one buffer across two aliased
    # operands is the same hazard class as the donation×aliasing platform
    # bug (docs/02) — two allocations make it unconditionally safe.
    k_scale = v_scale = None
    if dtype == jnp.int8:
        k_scale = jnp.zeros(shape[:3], dtype=jnp.float32)
        v_scale = jnp.zeros(shape[:3], dtype=jnp.float32)
    return DecodeState(
        k_cache=jnp.zeros(shape, dtype=dtype),
        v_cache=jnp.zeros(shape, dtype=dtype),
        position=jnp.zeros((), dtype=jnp.int32),
        k_scale=k_scale, v_scale=v_scale,
    )


def reset_state(state: DecodeState) -> DecodeState:
    """Per-utterance reset (reference: model_tts.py:332-336)."""
    return DecodeState(
        k_cache=jnp.zeros_like(state.k_cache),
        v_cache=jnp.zeros_like(state.v_cache),
        position=jnp.zeros((), dtype=jnp.int32),
        k_scale=None if state.k_scale is None else jnp.zeros_like(state.k_scale),
        v_scale=None if state.v_scale is None else jnp.zeros_like(state.v_scale),
    )


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """f32 RMSNorm (reference: validate_kernel.py:91-94, kernel.cu:224)."""
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Half-split RoPE (HF rotate_half; reference: validate_kernel.py:96-103).

    x: [..., D]; cos/sin: broadcastable [..., D//2] f32.
    """
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def mrope_section_masks(cfg: DecoderConfig) -> list:
    """Boolean masks [d2] assigning each rotary frequency index to a section.

    Chunked layout (`mrope_interleaved=False`): section s owns the
    contiguous run [Σsec[:s], Σsec[:s+1]) — Qwen2.5-Omni style. Interleaved
    (`True`): index j belongs to section s∈{1,..} iff j % n == s and
    j < n*sec[s] (n = number of sections), else to section 0 — the
    Qwen3-Omni scheme (transformers modeling_qwen3_omni_moe.py
    `apply_interleaved_mrope`), which preserves frequency continuity."""
    d2 = cfg.head_dim // 2
    secs = cfg.mrope_section
    assert secs is not None and sum(secs) == d2, (secs, d2)
    j = np.arange(d2)
    n = len(secs)
    if cfg.mrope_interleaved:
        masks = []
        taken = np.zeros(d2, dtype=bool)
        for s in range(n - 1, 0, -1):
            m = (j % n == s) & (j < n * secs[s])
            masks.append((s, m))
            taken |= m
        out = [None] * n
        out[0] = ~taken
        for s, m in masks:
            out[s] = m
        return [jnp.asarray(m) for m in out]
    out = []
    start = 0
    for s in range(n):
        out.append(jnp.asarray((j >= start) & (j < start + secs[s])))
        start += secs[s]
    return out


def mrope_rows(cfg: DecoderConfig, rope, mrope_pos: jax.Array, T: int):
    """Compose [T, D//2] cos/sin rows for M-RoPE.

    `cfg.mrope_section` (e.g. (24, 20, 20)) partitions the D//2 rotary
    frequency indices (chunked or interleaved per `cfg.mrope_interleaved`);
    section s rotates by position `mrope_pos[s] + t` for the chunk's t-th
    token. With all components equal this reproduces standard RoPE
    bit-exactly — the known reference limitation this lifts
    (reference: README.md:204-208, docs/02-kernel-adaptation.md)."""
    d2 = cfg.head_dim // 2
    secs = cfg.mrope_section
    masks = mrope_section_masks(cfg)
    cos = jnp.zeros((T, d2), rope.cos.dtype)
    sin = jnp.zeros((T, d2), rope.sin.dtype)
    for i in range(len(secs)):
        c_i = jax.lax.dynamic_slice(rope.cos, (mrope_pos[i], 0), (T, d2))
        s_i = jax.lax.dynamic_slice(rope.sin, (mrope_pos[i], 0), (T, d2))
        cos = jnp.where(masks[i][None, :], c_i, cos)
        sin = jnp.where(masks[i][None, :], s_i, sin)
    return cos, sin


def _matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """bf16 × bf16 → f32 accumulation, matching the CUDA matvec accumulators."""
    return jnp.dot(x.astype(w.dtype), w, preferred_element_type=jnp.float32)


class LayerSlice(NamedTuple):
    """One layer's weights (no leading L axis) — what scan feeds the body."""

    input_norm: jax.Array
    wqkv: jax.Array
    q_norm: jax.Array
    k_norm: jax.Array
    wo: jax.Array
    post_norm: jax.Array
    w_gate_up: jax.Array
    w_down: jax.Array


def _dense_mixed_attention(
    cfg: DecoderConfig,
    q: jax.Array,            # [T, HQ, D] f32
    k_chunk: jax.Array,      # [T, KVH, D] f32 — this chunk's keys (post-RoPE)
    v_chunk: jax.Array,      # [T, KVH, D] f32
    k_old: jax.Array,        # [KVH, S, D] bf16|int8 — old entries (< start_pos)
    v_old: jax.Array,
    start_pos: jax.Array,    # int32
    ks_old: jax.Array | None = None,   # [KVH, S] f32 dequant scales (int8 KV)
    vs_old: jax.Array | None = None,
) -> jax.Array:
    """Attention over old cache + causal intra-chunk, without writing the
    cache. Exactly equivalent to attending over the updated cache.

    The old-cache pass is BOUNDED: a dynamic-trip `fori_loop` over
    256-column blocks runs only `ceil(start_pos/256)` iterations, so cost
    (and HBM cache traffic) scales with the actual position, not
    `max_seq_len` — at S=8192 a fresh-state prefill reads zero cache bytes
    instead of ~940 MB (VERDICT r1 weak item 6). Falls back to the one-shot
    masked einsum when S doesn't tile by 256."""
    T = q.shape[0]
    h_q, h_kv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    g = cfg.gqa_groups
    S = k_old.shape[1]
    scale = 1.0 / (d ** 0.5)

    qh = q.transpose(1, 0, 2).reshape(h_kv, g, T, d)            # [KVH, G, T, D]

    kv8 = ks_old is not None

    C = min(256, S)
    if S % C == 0:
        def blk(ci, carry):
            m, l, acc = carry
            kb = jax.lax.dynamic_slice(
                k_old, (0, ci * C, 0), (h_kv, C, d)).astype(jnp.float32)
            vb = jax.lax.dynamic_slice(
                v_old, (0, ci * C, 0), (h_kv, C, d)).astype(jnp.float32)
            if kv8:
                kb = kb * jax.lax.dynamic_slice(
                    ks_old, (0, ci * C), (h_kv, C))[:, :, None]
                vb = vb * jax.lax.dynamic_slice(
                    vs_old, (0, ci * C), (h_kv, C))[:, :, None]
            s = jnp.einsum("hgtd,hsd->hgts", qh, kb) * scale     # [KVH,G,T,C]
            col = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1) + ci * C
            s = jnp.where((col < start_pos)[None, None], s, -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * corr + jnp.einsum("hgts,hsd->hgtd", p, vb)
            return m_new, l_new, acc_new

        m0 = jnp.full((h_kv, g, T, 1), -jnp.inf, dtype=jnp.float32)
        l0 = jnp.zeros((h_kv, g, T, 1), dtype=jnp.float32)
        a0 = jnp.zeros((h_kv, g, T, d), dtype=jnp.float32)
        n_blocks = jax.lax.div(start_pos + C - 1, C)
        m, l, acc = jax.lax.fori_loop(0, n_blocks, blk, (m0, l0, a0))

        kc = k_chunk.transpose(1, 0, 2)                          # [KVH, T, D]
        vc = v_chunk.transpose(1, 0, 2)
        s_new = jnp.einsum("hgtd,hud->hgtu", qh, kc) * scale     # [KVH,G,T,T]
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        u_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        s_new = jnp.where((u_ids <= t_ids)[None, None], s_new, -jnp.inf)
        m_f = jnp.maximum(m, jnp.max(s_new, axis=-1, keepdims=True))
        p_new = jnp.exp(s_new - m_f)
        corr = jnp.exp(m - m_f)
        l_f = l * corr + jnp.sum(p_new, axis=-1, keepdims=True)
        attn = (acc * corr + jnp.einsum("hgtu,hud->hgtd", p_new, vc)) / l_f
        return attn.reshape(h_q, T, d).transpose(1, 0, 2).reshape(T, h_q * d)

    kf = k_old.astype(jnp.float32)
    vf = v_old.astype(jnp.float32)
    if kv8:
        kf = kf * ks_old[:, :, None]
        vf = vf * vs_old[:, :, None]

    s_old = jnp.einsum("hgtd,hsd->hgts", qh, kf) * scale        # [KVH,G,T,S]
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    s_old = jnp.where((key_ids < start_pos)[None, None], s_old, -jnp.inf)

    kc = k_chunk.transpose(1, 0, 2)                              # [KVH, T, D]
    vc = v_chunk.transpose(1, 0, 2)
    s_new = jnp.einsum("hgtd,hud->hgtu", qh, kc) * scale         # [KVH,G,T,T]
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    u_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    s_new = jnp.where((u_ids <= t_ids)[None, None], s_new, -jnp.inf)

    s_all = jnp.concatenate([s_old, s_new], axis=-1)             # [KVH,G,T,S+T]
    probs = jax.nn.softmax(s_all, axis=-1)
    p_old, p_new = probs[..., :S], probs[..., S:]
    attn = (jnp.einsum("hgts,hsd->hgtd", p_old, vf)
            + jnp.einsum("hgtu,hud->hgtd", p_new, vc))           # [KVH,G,T,D]
    return attn.reshape(h_q, T, d).transpose(1, 0, 2).reshape(T, h_q * d)


def _layer_forward(
    cfg: DecoderConfig,
    lw: LayerSlice,
    x: jax.Array,            # [T, H] f32 residual stream
    k_cache: jax.Array,      # [L, KVH, S, D] bf16|int8 — read-only, old entries
    v_cache: jax.Array,
    layer_idx: jax.Array,    # int32
    start_pos: jax.Array,    # int32 — first position of this chunk
    cos: jax.Array,          # [T, D//2] f32
    sin: jax.Array,
    attn_impl: str = "dense",
    k_scale: jax.Array | None = None,   # [L, KVH, S] f32 (int8 KV mode)
    v_scale: jax.Array | None = None,
):
    """One decoder layer over a T-token chunk (T=1 decode, T>1 prefill).

    Returns (x_out [T,H] f32, k_new [KVH,T,D], v_new [KVH,T,D]) — the new
    cache columns (bf16, or f32 in int8-KV mode so the post-scan bulk
    update quantizes from full-precision values, matching the kernels).
    """
    T = x.shape[0]
    h_q, h_kv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim

    normed = rms_norm(x, lw.input_norm, cfg.rms_eps)
    qkv = _matmul(normed, lw.wqkv)                 # [T, Q+2KV]
    Q, KV = cfg.q_size, cfg.kv_size
    q = qkv[:, :Q].reshape(T, h_q, d)
    k = qkv[:, Q:Q + KV].reshape(T, h_kv, d)
    v = qkv[:, Q + KV:].reshape(T, h_kv, d)

    # Per-head QK-RMSNorm then RoPE (reference: kernel.cu:364-400)
    q = rms_norm(q, lw.q_norm, cfg.rms_eps)
    k = rms_norm(k, lw.k_norm, cfg.rms_eps)
    q = apply_rope(q, cos[:, None, :], sin[:, None, :])
    k = apply_rope(k, cos[:, None, :], sin[:, None, :])

    kv8 = k_scale is not None
    if attn_impl == "pallas" and T == 1 and not kv8:
        from ..ops.attention import decode_attention

        attn = decode_attention(
            q[0], k[0], v[0], k_cache, v_cache, layer_idx, start_pos,
        ).reshape(1, h_q * d)
    else:
        k_old = jax.lax.dynamic_index_in_dim(k_cache, layer_idx, 0, False)
        v_old = jax.lax.dynamic_index_in_dim(v_cache, layer_idx, 0, False)
        ks_old = vs_old = None
        if kv8:
            ks_old = jax.lax.dynamic_index_in_dim(k_scale, layer_idx, 0, False)
            vs_old = jax.lax.dynamic_index_in_dim(v_scale, layer_idx, 0, False)
        attn = _dense_mixed_attention(cfg, q, k, v, k_old, v_old, start_pos,
                                      ks_old, vs_old)

    x = x + _matmul(attn.astype(jnp.bfloat16), lw.wo)

    normed2 = rms_norm(x, lw.post_norm, cfg.rms_eps)
    gate_up = _matmul(normed2, lw.w_gate_up)              # [T, 2I]
    gate, up = gate_up[:, :cfg.intermediate_size], gate_up[:, cfg.intermediate_size:]
    mlp = jax.nn.silu(gate) * up                          # SwiGLU (kernel.cu:771-821)
    x = x + _matmul(mlp.astype(jnp.bfloat16), lw.w_down)

    col_dtype = jnp.float32 if kv8 else k_cache.dtype
    k_new = k.astype(col_dtype).transpose(1, 0, 2)        # [KVH, T, D]
    v_new = v.astype(col_dtype).transpose(1, 0, 2)
    return x, k_new, v_new


def forward_chunk(
    cfg: DecoderConfig,
    w: DecoderWeights,
    state: DecodeState,
    embeds: jax.Array,      # [T, H] — precomputed input embeddings (any float dtype)
    attn_impl: str = "dense",
    mrope_pos: jax.Array | None = None,   # [3] int32 section positions (M-RoPE)
    interpret: bool = False,              # Pallas interpret mode (CPU tests)
) -> tuple[DecodeState, jax.Array]:
    """Run a T-token chunk through all layers. Returns (state, normed [T,H] f32).

    `normed` is the post-final-RMSNorm hidden state — the value the code
    predictor consumes (reference: kernel.cu:1276-1314 `g_normalized`).
    """
    T = embeds.shape[0]
    if attn_impl == "mega" and T == 1:
        from ..ops.decode_step import megakernel_forward

        state, _logits, normed1 = megakernel_forward(
            cfg, w, state, embeds[0], mrope_pos=mrope_pos,
            interpret=interpret)
        return state, normed1[None, :]
    if attn_impl == "mega":
        attn_impl = "dense"      # prefill (T>1) runs the dense mixed path
    pos = state.position
    if cfg.mrope_section is not None and mrope_pos is not None:
        cos, sin = mrope_rows(cfg, w.rope, mrope_pos, T)
    else:
        cos = jax.lax.dynamic_slice_in_dim(w.rope.cos, pos, T, axis=0)  # [T, D//2]
        sin = jax.lax.dynamic_slice_in_dim(w.rope.sin, pos, T, axis=0)
    x = embeds.astype(jnp.float32)

    L = cfg.num_layers
    k_cache, v_cache = state.k_cache, state.v_cache
    kv8 = state.k_scale is not None

    lw_all = w.layers
    quant = hasattr(lw_all, "wqkv_q")

    def body(x, layer):
        if quant:
            # quant-aware prefill: dequantize ONE layer's slab on the fly —
            # same weight bytes streamed as a decode step, no resident bf16
            # copy (reference keeps one weight copy, model_tts.py:56-179).
            # The form is picked per MATRIX by shape (packed int4 stores
            # in/2 rows), so int8, int4, and the mixed int8-attn/int4-MLP
            # tier all flow through the same body.
            from ..core.weights import (
                dequant_mat_slice,
                dequant_mat_slice_int4,
            )

            (inn, qn, kn, pn, wqkv_q, wqkv_s, wo_q, wo_s,
             wgu_q, wgu_s, wd_q, wd_s, li) = layer

            def dq(qm, s, n_in):
                packed = qm.shape[0] * 2 == n_in
                return (dequant_mat_slice_int4 if packed
                        else dequant_mat_slice)(qm, s)

            lw = LayerSlice(
                input_norm=inn,
                wqkv=dq(wqkv_q, wqkv_s, cfg.hidden_size), q_norm=qn,
                k_norm=kn, wo=dq(wo_q, wo_s, cfg.q_size), post_norm=pn,
                w_gate_up=dq(wgu_q, wgu_s, cfg.hidden_size),
                w_down=dq(wd_q, wd_s, cfg.intermediate_size))
        else:
            lw = LayerSlice(*layer[:-1])
            li = layer[-1]
        x, k_new, v_new = _layer_forward(
            cfg, lw, x, k_cache, v_cache, li, pos, cos, sin,
            attn_impl=attn_impl,
            k_scale=state.k_scale, v_scale=state.v_scale)
        return x, (k_new, v_new)

    if quant:
        fields = ("input_norm", "q_norm", "k_norm", "post_norm",
                  "wqkv_q", "wqkv_s", "wo_q", "wo_s",
                  "w_gate_up_q", "w_gate_up_s", "w_down_q", "w_down_s")
        assert fields == type(lw_all)._fields  # body unpack order must match
        xs = tuple(getattr(lw_all, f) for f in fields) + (
            jnp.arange(L, dtype=jnp.int32),)
    else:
        xs = tuple(getattr(lw_all, f) for f in LayerWeights._fields) + (
            jnp.arange(L, dtype=jnp.int32),)
    x, (k_cols, v_cols) = jax.lax.scan(body, x, xs)
    # k_cols/v_cols: [L, KVH, T, D] — one small bulk cache write per chunk.
    k_scale, v_scale = state.k_scale, state.v_scale
    if kv8:
        # per-row symmetric quantization from f32 columns (same scheme as
        # the kernels: absmax/127 over the 128-dim head row)
        def quant_cols(cols):
            s = jnp.maximum(jnp.max(jnp.abs(cols), axis=-1), 1e-8) / 127.0
            q = jnp.clip(jnp.round(cols / s[..., None]), -127, 127)
            return q.astype(jnp.int8), s.astype(jnp.float32)   # [L,KVH,T]

        k_cols, k_s_cols = quant_cols(k_cols)
        v_cols, v_s_cols = quant_cols(v_cols)
        k_scale = jax.lax.dynamic_update_slice(k_scale, k_s_cols, (0, 0, pos))
        v_scale = jax.lax.dynamic_update_slice(v_scale, v_s_cols, (0, 0, pos))
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_cols, (0, 0, pos, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_cols, (0, 0, pos, 0))

    normed = rms_norm(x, w.final_norm, cfg.rms_eps)       # [T, H] f32
    new_state = DecodeState(k_cache=k_cache, v_cache=v_cache,
                            position=pos + jnp.int32(T),
                            k_scale=k_scale, v_scale=v_scale)
    return new_state, normed


def lm_head_logits(w: DecoderWeights, normed: jax.Array) -> jax.Array:
    """Codec LM head logits f32 (reference: kernel.cu:1022-1185).

    With an int8 head (`w.lm_head_s` set, core/weights.py quantize_lm_head)
    the int8 weights upcast to bf16 and the per-output-channel scale lands
    on the f32 logits."""
    s = getattr(w, "lm_head_s", None)
    x = normed.astype(jnp.bfloat16)
    if s is not None:
        return jnp.dot(x, w.lm_head.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) * s
    return _matmul(x, w.lm_head)


def decode_step_with_embed(
    cfg: DecoderConfig,
    w: DecoderWeights,
    state: DecodeState,
    embed: jax.Array,       # [H]
    attn_impl: str = "dense",
    mrope_pos: jax.Array | None = None,   # [3] int32 (M-RoPE section positions)
):
    """One decode step from a precomputed embedding — the `step_with_embed`
    sentinel path (reference: model_tts.py:287-330). Returns
    (state, token int32, normed [H] f32)."""
    if attn_impl == "mega":
        from ..ops.decode_step import megakernel_forward as _fwd

        state, logits, normed1 = _fwd(cfg, w, state, embed,
                                      mrope_pos=mrope_pos)
        token = jnp.argmax(logits).astype(jnp.int32)
        return state, token, normed1
    state, normed = forward_chunk(cfg, w, state, embed[None, :],
                                  attn_impl=attn_impl, mrope_pos=mrope_pos)
    logits = lm_head_logits(w, normed)            # [1, V]
    token = jnp.argmax(logits[0]).astype(jnp.int32)
    return state, token, normed[0]


def decode_step(
    cfg: DecoderConfig,
    w: DecoderWeights,
    state: DecodeState,
    token_id: jax.Array,    # int32 scalar
    attn_impl: str = "dense",
    mrope_pos: jax.Array | None = None,
):
    """One decode step from a codec token id (reference: model_tts.py:254-285)."""
    embed = w.embed[token_id]
    return decode_step_with_embed(cfg, w, state, embed, attn_impl=attn_impl,
                                  mrope_pos=mrope_pos)


def prefill(
    cfg: DecoderConfig,
    w: DecoderWeights,
    state: DecodeState,
    embeds: jax.Array,      # [T, H]
    attn_impl: str = "dense",
):
    """Batched causal prefill of T precomputed embeddings.

    TPU-first replacement for the reference's 8 sequential step_with_embed
    calls (reference: tts_engine.py:281-282): one forward = one pass over the
    weights instead of T. Returns (state, last_token int32, last_normed [H] f32).
    """
    state, normed = forward_chunk(cfg, w, state, embeds)
    logits = lm_head_logits(w, normed[-1:])
    token = jnp.argmax(logits[0]).astype(jnp.int32)
    return state, token, normed[-1]
