"""Phase-split megakernel: grid = (num_layers, 2).

Experimental refinement of ops/decode_step.py. Splitting each layer into an
attention phase (needs the ~8.5 MB {input_norm, wqkv, q_norm, k_norm} slab)
and an MLP phase (the ~22 MB {wo, post_norm, w_gate_up, w_down} slab) lets
the Pallas pipeline fetch each phase's slab while the *other* phase
computes: phase-1 operands use the index map `l - 1 + p`, so their block
transition (and hence their DMA) happens at the phase boundary instead of
the layer boundary. The attention result crosses the phase boundary in a
VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import (
    ATTN_CHUNK, DecoderConfig, PREFETCH_CHUNKS, VMEM_LIMIT_MB)
from ..core.weights import DecoderWeights
from ..models.decoder import DecodeState


def _kernel(
    pos_ref,
    in_norm_ref, wqkv_ref, q_norm_ref, k_norm_ref,       # phase-0 slabs
    wo_ref, post_norm_ref, w_gate_up_ref, w_down_ref,    # phase-1 slabs
    final_norm_ref, lm_head_ref, embed_ref, cos_ref, sin_ref,
    k_hbm, v_hbm,
    k_new_ref, v_new_ref, normed_ref, logits_ref,
    x_ref,            # VMEM [1, H] f32
    attn_ref,         # VMEM [1, Q] f32 — crosses the phase boundary
    k_pre, v_pre, pre_sems, k_buf, v_buf, sems,
    *,
    cfg: DecoderConfig,
    chunk: int,
    prefetch_chunks: int,
):
    li = pl.program_id(0)
    ph = pl.program_id(1)
    L = pl.num_programs(0)
    H, Q, KV = cfg.hidden_size, cfg.q_size, cfg.kv_size
    KVH, HQ, D, G = cfg.num_kv_heads, cfg.num_q_heads, cfg.head_dim, cfg.gqa_groups
    I = cfg.intermediate_size
    C = chunk
    P = prefetch_chunks
    eps = cfg.rms_eps
    scale = 1.0 / (D ** 0.5)

    n_old = pos_ref[0]
    n_chunks = pl.cdiv(n_old, C)
    par = jax.lax.rem(li, 2)

    def k_pre_dma(layer, parity, ci):
        return pltpu.make_async_copy(
            k_hbm.at[layer, :, pl.ds(ci * C, C), :], k_pre.at[parity, ci],
            pre_sems.at[parity, ci, 0])

    def v_pre_dma(layer, parity, ci):
        return pltpu.make_async_copy(
            v_hbm.at[layer, :, pl.ds(ci * C, C), :], v_pre.at[parity, ci],
            pre_sems.at[parity, ci, 1])

    def k_dma(layer, slot, ci):
        return pltpu.make_async_copy(
            k_hbm.at[layer, :, pl.ds(ci * C, C), :], k_buf.at[slot],
            sems.at[slot, 0])

    def v_dma(layer, slot, ci):
        return pltpu.make_async_copy(
            v_hbm.at[layer, :, pl.ds(ci * C, C), :], v_buf.at[slot],
            sems.at[slot, 1])

    def start_prefetch(layer, parity):
        for ci in range(P):
            @pl.when(ci < n_chunks)
            def _():
                k_pre_dma(layer, parity, ci).start()
                v_pre_dma(layer, parity, ci).start()

    def rms(v, w_row):
        var = jnp.mean(v * v, axis=-1, keepdims=True)
        return v * jax.lax.rsqrt(var + eps) * w_row.astype(jnp.float32)

    def mm(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # ───────────────────────── phase 0: attention ─────────────────────────
    @pl.when(ph == 0)
    def _():
        @pl.when(li == 0)
        def _():
            x_ref[:] = embed_ref[:]
            start_prefetch(0, 0)

        x = x_ref[:]
        normed_bf = rms(x, in_norm_ref[0]).astype(jnp.bfloat16)
        qkv = mm(normed_bf, wqkv_ref[0])
        q = qkv[:, :Q].reshape(HQ, D)
        k = qkv[:, Q:Q + KV].reshape(KVH, D)
        v = qkv[:, Q + KV:].reshape(KVH, D)

        q = rms(q, q_norm_ref[0])
        k = rms(k, k_norm_ref[0])

        cos = cos_ref[0]
        sin = sin_ref[0]
        d2 = D // 2

        def rope(t):
            t1, t2 = t[:, :d2], t[:, d2:]
            return jnp.concatenate(
                [t1 * cos - t2 * sin, t2 * cos + t1 * sin], axis=-1)

        q = rope(q)
        k = rope(k)

        k_new_ref[0, :, 0, :] = k.astype(k_new_ref.dtype)
        v_new_ref[0, :, 0, :] = v.astype(v_new_ref.dtype)

        def _accumulate(kh_all, vh_all, ci, carry):
            m, l, acc = carry
            col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) + ci * C
            valid = col < n_old
            s_rows = []
            for h in range(KVH):
                kh = kh_all[h].astype(jnp.float32)
                qh = q[h * G:(h + 1) * G]
                s_rows.append(jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale)
            s_all = jnp.where(valid, jnp.concatenate(s_rows, axis=0), -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(s_all, axis=1, keepdims=True))
            p = jnp.exp(s_all - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
            pv_rows = []
            for h in range(KVH):
                vh = vh_all[h].astype(jnp.float32)
                ph_ = p[h * G:(h + 1) * G]
                pv_rows.append(jax.lax.dot_general(
                    ph_, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            acc_new = acc * corr + jnp.concatenate(pv_rows, axis=0)
            return m_new, l_new, acc_new

        for ci in range(P):
            @pl.when(ci < n_chunks)
            def _():
                k_pre_dma(li, par, ci).wait()
                v_pre_dma(li, par, ci).wait()

        carry = (jnp.full((HQ, 1), -jnp.inf, dtype=jnp.float32),
                 jnp.zeros((HQ, 1), dtype=jnp.float32),
                 jnp.zeros((HQ, D), dtype=jnp.float32))
        carry = jax.lax.fori_loop(
            0, jnp.minimum(n_chunks, P),
            lambda ci, c: _accumulate(k_pre[par, ci], v_pre[par, ci], ci, c),
            carry)

        S_total = k_hbm.shape[2]
        if P * C < S_total:
            @pl.when(n_chunks > P)
            def _():
                k_dma(li, jax.lax.rem(P, 2), P).start()
                v_dma(li, jax.lax.rem(P, 2), P).start()

            def stream_body(ci, carry):
                slot = jax.lax.rem(ci, 2)
                nxt = jax.lax.rem(ci + 1, 2)

                @pl.when(ci + 1 < n_chunks)
                def _():
                    k_dma(li, nxt, ci + 1).start()
                    v_dma(li, nxt, ci + 1).start()

                k_dma(li, slot, ci).wait()
                v_dma(li, slot, ci).wait()
                return _accumulate(k_buf[slot], v_buf[slot], ci, carry)

            carry = jax.lax.fori_loop(
                P, jnp.maximum(n_chunks, P), stream_body, carry)
        m, l, acc = carry

        s_rows = []
        for h in range(KVH):
            qh = q[h * G:(h + 1) * G]
            s_rows.append(jnp.sum(qh * k[h:h + 1], axis=-1, keepdims=True))
        s_new = jnp.concatenate(s_rows, axis=0) * scale
        m_f = jnp.maximum(m, s_new)
        corr = jnp.exp(m - m_f)
        p_new = jnp.exp(s_new - m_f)
        l_f = l * corr + p_new
        acc_rows = []
        for h in range(KVH):
            sl = slice(h * G, (h + 1) * G)
            acc_rows.append(acc[sl] * corr[sl] + p_new[sl] * v[h:h + 1])
        attn_ref[:] = (jnp.concatenate(acc_rows, axis=0) / l_f).reshape(1, Q)

    # ─────────────────────────── phase 1: MLP ────────────────────────────
    @pl.when(ph == 1)
    def _():
        x = x_ref[:]
        x = x + mm(attn_ref[:].astype(jnp.bfloat16), wo_ref[0])
        normed2_bf = rms(x, post_norm_ref[0]).astype(jnp.bfloat16)
        gate_up = mm(normed2_bf, w_gate_up_ref[0])
        gate, up = gate_up[:, :I], gate_up[:, I:]
        mlp = (gate * jax.lax.logistic(gate)) * up
        x = x + mm(mlp.astype(jnp.bfloat16), w_down_ref[0])
        x_ref[:] = x

        @pl.when(li + 1 < L)
        def _():
            start_prefetch(li + 1, jax.lax.rem(li + 1, 2))

        @pl.when(li == L - 1)
        def _():
            nrm = rms(x, final_norm_ref[0][None, :])
            normed_ref[:] = nrm
            logits_ref[:] = mm(nrm.astype(jnp.bfloat16), lm_head_ref[:])


def _p0_spec(shape):
    """Fetched at the layer boundary (available for phase 0)."""
    return pl.BlockSpec((1,) + shape[1:],
                        lambda l, p: (l,) + tuple(0 for _ in shape[1:]),
                        memory_space=pltpu.VMEM)


def _p1_spec(shape):
    """Block index l-1+p: transitions at the PHASE boundary, so the DMA for
    layer l's slab runs while layer l's phase 0 computes."""
    return pl.BlockSpec(
        (1,) + shape[1:],
        lambda l, p: (jnp.maximum(l - 1 + p, 0),) + tuple(0 for _ in shape[1:]),
        memory_space=pltpu.VMEM)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda l, p: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("cfg", "chunk", "prefetch_chunks"))
def megakernel_forward_phased(
    cfg: DecoderConfig,
    w: DecoderWeights,
    state: DecodeState,
    embed: jax.Array,
    chunk: int = ATTN_CHUNK,
    prefetch_chunks: int = PREFETCH_CHUNKS,
):
    """Phase-split fused decode step. Same contract as megakernel_forward."""
    L, H, Q = cfg.num_layers, cfg.hidden_size, cfg.q_size
    KVH, D, V = cfg.num_kv_heads, cfg.head_dim, cfg.vocab_size
    S = cfg.max_seq_len
    C = min(chunk, S)
    from .decode_step import check_attn_chunk
    check_attn_chunk(S, C)
    pos = state.position
    P = max(1, min(prefetch_chunks, -(-S // C)))

    cos = jax.lax.dynamic_slice_in_dim(w.rope.cos, pos, 1, axis=0)
    sin = jax.lax.dynamic_slice_in_dim(w.rope.sin, pos, 1, axis=0)

    kernel = functools.partial(_kernel, cfg=cfg, chunk=C, prefetch_chunks=P)
    lw = w.layers

    out_shapes = (
        jax.ShapeDtypeStruct((L, KVH, 1, D), state.k_cache.dtype),
        jax.ShapeDtypeStruct((L, KVH, 1, D), state.v_cache.dtype),
        jax.ShapeDtypeStruct((1, H), jnp.float32),
        jax.ShapeDtypeStruct((1, V), jnp.float32),
    )
    out_specs = (
        _p0_spec((L, KVH, 1, D)),
        _p0_spec((L, KVH, 1, D)),
        _const_spec((1, H)),
        _const_spec((1, V)),
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        _p0_spec((L, 1, H)),          # input_norm
        _p0_spec(lw.wqkv.shape),
        _p0_spec((L, 1, D)),          # q_norm
        _p0_spec((L, 1, D)),          # k_norm
        _p1_spec(lw.wo.shape),
        _p1_spec((L, 1, H)),          # post_norm
        _p1_spec(lw.w_gate_up.shape),
        _p1_spec(lw.w_down.shape),
        _const_spec((1, H)),
        _const_spec((H, V)),
        _const_spec((1, H)),
        _const_spec((1, D // 2)),
        _const_spec((1, D // 2)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]

    k_new, v_new, normed, logits = pl.pallas_call(
        kernel,
        grid=(L, 2),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, H), jnp.float32),          # x
            pltpu.VMEM((1, Q), jnp.float32),          # attn (phase bridge)
            pltpu.VMEM((2, P, KVH, C, D), state.k_cache.dtype),
            pltpu.VMEM((2, P, KVH, C, D), state.v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, P, 2)),
            pltpu.VMEM((2, KVH, C, D), state.k_cache.dtype),
            pltpu.VMEM((2, KVH, C, D), state.v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_MB * 1024 * 1024,
        ),
    )(
        jnp.asarray(pos, jnp.int32).reshape(1),
        lw.input_norm[:, None, :], lw.wqkv,
        lw.q_norm[:, None, :], lw.k_norm[:, None, :],
        lw.wo, lw.post_norm[:, None, :], lw.w_gate_up, lw.w_down,
        w.final_norm[None, :], w.lm_head,
        embed.astype(jnp.float32)[None, :], cos, sin,
        state.k_cache, state.v_cache,
    )

    k_cache = jax.lax.dynamic_update_slice(state.k_cache, k_new, (0, 0, pos, 0))
    v_cache = jax.lax.dynamic_update_slice(state.v_cache, v_new, (0, 0, pos, 0))
    return (DecodeState(k_cache=k_cache, v_cache=v_cache, position=pos + 1),
            logits[0], normed[0])
