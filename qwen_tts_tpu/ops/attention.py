"""Pallas decode attention: online-softmax over the valid KV-cache prefix.

TPU-native replacement for the reference's flash-style decode attention
(reference: csrc/kernel.cu:318-645 — one Q head per block, warps striding
cache positions, cross-warp max/sum merge). The TPU form: the full
`[L, KVH, S, D]` KV cache stays in HBM (`memory_space=ANY`); the kernel
fori-loops over fixed-size position chunks of layer `li`'s slice with a
*dynamic* trip count `ceil(pos/CHUNK)`, double-buffering chunk DMAs and
merging per-chunk online-softmax statistics in VMEM. The current token's
K/V arrive as separate VMEM operands and are merged as a final virtual
column — so the cache itself is never written here, which lets the layer
scan treat it as a read-only invariant (no per-step cache copies).

Why this matters: a masked dense attention reads the whole cache every step
(940 MB at S=8192 — more than the weights); this kernel reads only the
valid prefix, which for TTS decode (hundreds of positions) is ~1-2% of that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(
    idx_ref,      # SMEM [2] int32 — [position (== #old entries), layer_idx]
    q_ref,        # VMEM [HQ, D] f32
    k_new_ref,    # VMEM [KVH, D] f32 — current token's K (post-RoPE)
    v_new_ref,    # VMEM [KVH, D] f32
    k_hbm,        # ANY  [L, KVH, S, D] bf16 (old entries only)
    v_hbm,        # ANY  [L, KVH, S, D] bf16
    out_ref,      # VMEM [HQ, D] f32
    k_buf,        # VMEM scratch [2, KVH, C, D] bf16
    v_buf,        # VMEM scratch [2, KVH, C, D] bf16
    sems,         # DMA sems (2, 2)
    *,
    chunk: int,
    kv_heads: int,
    gqa: int,
    scale: float,
):
    C = chunk
    HQ, D = q_ref.shape
    n_old = idx_ref[0]
    li = idx_ref[1]
    n_chunks = pl.cdiv(n_old, C)

    def k_dma(slot, ci):
        return pltpu.make_async_copy(
            k_hbm.at[li, :, pl.ds(ci * C, C), :], k_buf.at[slot],
            sems.at[slot, 0])

    def v_dma(slot, ci):
        return pltpu.make_async_copy(
            v_hbm.at[li, :, pl.ds(ci * C, C), :], v_buf.at[slot],
            sems.at[slot, 1])

    @pl.when(n_chunks > 0)
    def _():
        k_dma(0, 0).start()
        v_dma(0, 0).start()

    q = q_ref[:]  # [HQ, D] f32

    def body(ci, carry):
        m, l, acc = carry          # [HQ,1], [HQ,1], [HQ,D]
        slot = jax.lax.rem(ci, 2)
        nxt = jax.lax.rem(ci + 1, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            k_dma(nxt, ci + 1).start()
            v_dma(nxt, ci + 1).start()

        k_dma(slot, ci).wait()
        v_dma(slot, ci).wait()

        # mask positions beyond the old-entry count in this chunk
        col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) + ci * C
        valid = col < n_old         # [1, C]

        # Static unroll over KV heads: [G, D] @ [D, C] matmuls on the MXU.
        s_rows = []
        for h in range(kv_heads):
            kh = k_buf[slot, h].astype(jnp.float32)          # [C, D]
            qh = q[h * gqa:(h + 1) * gqa]                    # [G, D]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # [G, C]
            s_rows.append(s)
        s_all = jnp.concatenate(s_rows, axis=0)               # [HQ, C]
        s_all = jnp.where(valid, s_all, -jnp.inf)

        m_new = jnp.maximum(m, jnp.max(s_all, axis=1, keepdims=True))
        p = jnp.exp(s_all - m_new)                            # [HQ, C]
        corr = jnp.exp(m - m_new)                             # [HQ, 1]
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)

        pv_rows = []
        for h in range(kv_heads):
            vh = v_buf[slot, h].astype(jnp.float32)           # [C, D]
            ph = p[h * gqa:(h + 1) * gqa]                     # [G, C]
            pv_rows.append(jax.lax.dot_general(
                ph, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))          # [G, D]
        pv = jnp.concatenate(pv_rows, axis=0)                 # [HQ, D]
        acc_new = acc * corr + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((HQ, 1), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((HQ, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((HQ, D), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))

    # Merge the current token as a final virtual column (self-attention to
    # the token being decoded — the cache row the reference would have just
    # written, kernel.cu:433-458).
    k_new = k_new_ref[:]                                      # [KVH, D]
    v_new = v_new_ref[:]
    s_rows = []
    for h in range(kv_heads):
        qh = q[h * gqa:(h + 1) * gqa]                         # [G, D]
        s_rows.append(jnp.sum(qh * k_new[h:h + 1], axis=-1, keepdims=True))
    s_new = jnp.concatenate(s_rows, axis=0) * scale           # [HQ, 1]
    m_f = jnp.maximum(m, s_new)
    corr = jnp.exp(m - m_f)
    p_new = jnp.exp(s_new - m_f)                              # [HQ, 1]
    l_f = l * corr + p_new
    acc_rows = []
    for h in range(kv_heads):
        sl = slice(h * gqa, (h + 1) * gqa)
        acc_rows.append(acc[sl] * corr[sl] + p_new[sl] * v_new[h:h + 1])
    acc_f = jnp.concatenate(acc_rows, axis=0)
    out_ref[:] = acc_f / l_f


def _build_call(HQ, KVH, S, D, dtype, chunk, interpret=False):
    gqa = HQ // KVH
    scale = 1.0 / (D ** 0.5)
    kernel = functools.partial(
        _decode_attn_kernel, chunk=chunk, kv_heads=KVH, gqa=gqa, scale=scale)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((HQ, D), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # [pos, layer]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # q
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k_new
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v_new
            pl.BlockSpec(memory_space=pl.ANY),       # k_cache (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # v_cache (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, KVH, chunk, D), dtype),
            pltpu.VMEM((2, KVH, chunk, D), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )


def decode_attention(
    q: jax.Array,          # [HQ, D] f32 (post QK-norm + RoPE)
    k_new: jax.Array,      # [KVH, D] f32 — current token K (post-RoPE)
    v_new: jax.Array,      # [KVH, D] f32
    k_cache: jax.Array,    # [L, KVH, S, D] bf16 — old entries only
    v_cache: jax.Array,    # [L, KVH, S, D] bf16
    layer_idx: jax.Array,  # int32 scalar
    position: jax.Array,   # int32 scalar — number of OLD cache entries
    chunk: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Single-token GQA decode attention over cache prefix + current token.

    Returns [HQ, D] f32 attention output (pre-o_proj). The cache is read-only.
    """
    HQ, D = q.shape
    _, KVH, S, _ = k_cache.shape
    chunk = min(chunk, S)
    call = _build_call(HQ, KVH, S, D, k_cache.dtype, chunk, interpret)
    idx = jnp.stack([jnp.asarray(position, jnp.int32),
                     jnp.asarray(layer_idx, jnp.int32)])
    return call(idx, q, k_new.astype(jnp.float32), v_new.astype(jnp.float32),
                k_cache, v_cache)
