"""N-step generate megakernel: grid = (num_steps, num_layers).

The complete TPU equivalent of the reference's `launch_ldg_generate_nosync`
(reference: csrc/kernel.cu:1555-1613, torch_bindings.cpp:93-127): N greedy
decode steps run inside ONE `pallas_call` with zero host involvement —
token feedback (`LM head argmax → embedding lookup`) happens on device, and
the KV cache is updated in place through aliased inputs/outputs.

Mosaic constraint shaping the design: dynamic slices of tiled HBM dims must
be tile-aligned (8 sublanes for bf16, 32 for int8, 128 lanes), so
single-row cache stores at arbitrary positions are illegal. Instead each
layer stages its most recent rows in a persistent VMEM ring
(`k_rows`/`v_rows`) and flushes a full aligned row group to HBM once per
`ring` steps; attention runs chunked over the flushed prefix and merges the
VMEM tail (including the in-flight token) as one masked block. The
embedding gather likewise fetches an aligned 8-row group and selects the
row with a one-hot contraction.

int8 KV mode (`state` built with `init_state(cfg, jnp.int8)`): rows are
quantized at staging with one f32 scale per (layer, head, position)
(absmax/127 over the 128-dim head row). Scales live in `[L, KVH, S]`
arrays — position on the LANE axis, so scale flushes must be whole
128-lane groups: the ring grows to 128 rows (the bf16 ring stays 8). Cache
chunk DMAs halve; scales ride along as [KVH, C] f32 tiles and are applied
on the score/probability side (G·C multiplies instead of C·D). The last
≤128 positions are served from VMEM, never re-read from HBM.

Compared to `lax.scan` over the single-step megakernel, this removes the
per-step XLA glue (embedding gather, argmax, cache update slice, scan
iteration) and keeps the weight-slab pipeline streaming continuously across
step boundaries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import ATTN_CHUNK, DecoderConfig, PREFETCH_CHUNKS, VMEM_LIMIT_MB
from ..core.weights import DecoderWeights
from ..models.decoder import DecodeState
from .decode_step import check_attn_chunk, make_mms

ROWG = 8        # embedding-gather row-group granularity (bf16 sublane tiling)
KV8_RING = 128  # int8-mode tail ring (scale flushes are lane groups of 128)


def _gen_kernel(
    # scalars
    pos0_ref,         # SMEM [1] int32 — cache entries before step 0
    mrope_ref,        # SMEM [3] int32 — M-RoPE per-section deltas vs pos
    # per-layer streamed weights (matrices bf16 OR int8 — see scales)
    in_norm_ref, wqkv_ref, q_norm_ref, k_norm_ref,
    wo_ref, post_norm_ref, w_gate_up_ref, w_down_ref,
    # per-output-channel f32 scales (ones in bf16 mode)
    sqkv_ref, so_ref, sgu_ref, sd_ref,
    # constants
    final_norm_ref,   # [1, H]
    lm_head_ref,      # [H, V] bf16 | int8
    lms_ref,          # [1, V] f32 — LM-head dequant scale (ones for bf16)
    embed_hbm,        # ANY [Vembed, H] bf16
    embed0_ref,       # [1, H] f32
    cos_hbm,          # VMEM [S, D//2] f32
    sin_hbm,          # VMEM [S, D//2] f32
    # cache refs (ANY, aliased in/out) + outputs + scratch — order depends
    # on kv8; unpacked below
    *rest,
    cfg: DecoderConfig,
    chunk: int,
    prefetch_chunks: int,
    ring: int,
    kv8: bool,
    copy_cache_in: bool = False,
):
    if kv8:
        (k_in, v_in, ks_in, vs_in,
         k_out, v_out, ks_out, vs_out,
         tokens_ref, normed_ref, tail_k_ref, tail_v_ref,
         tail_ks_ref, tail_vs_ref,
         x_ref, emb8, k_rows, v_rows, ks_rows, vs_rows,
         k_pre, v_pre, ks_pre, vs_pre, pre_sems, spre_sems,
         k_buf, v_buf, ks_buf, vs_buf, sems, ssems,
         flush_sems, emb_sem, init_sems, tok_ref) = rest
    else:
        (k_in, v_in,
         k_out, v_out,
         tokens_ref, normed_ref, tail_k_ref, tail_v_ref,
         x_ref, emb8, k_rows, v_rows,
         k_pre, v_pre, pre_sems,
         k_buf, v_buf, sems,
         flush_sems, emb_sem, init_sems, tok_ref) = rest
        ks_in = vs_in = ks_out = vs_out = None
        tail_ks_ref = tail_vs_ref = ks_rows = vs_rows = None
        ks_pre = vs_pre = spre_sems = ks_buf = vs_buf = ssems = None

    n = pl.program_id(0)
    li = pl.program_id(1)
    N = pl.num_programs(0)
    L = pl.num_programs(1)
    H, Q, KV = cfg.hidden_size, cfg.q_size, cfg.kv_size
    KVH, HQ, D, G = cfg.num_kv_heads, cfg.num_q_heads, cfg.head_dim, cfg.gqa_groups
    I = cfg.intermediate_size
    C = chunk
    P = prefetch_chunks
    RG = ring
    eps = cfg.rms_eps
    scale = 1.0 / (D ** 0.5)

    pos = pos0_ref[0] + n                 # entries valid before this step
    slot = jax.lax.rem(pos, RG)           # this step's slot in the tail ring
    # Mosaic can statically prove `(x // g) * g` is g-aligned (the `pos -
    # rem` form it cannot); keep this exact form for every HBM index.
    flushed = (pos // RG) * RG            # rows [0, flushed) live in HBM
    n_chunks = pl.cdiv(flushed, C)
    par = jax.lax.rem(li, 2)

    if copy_cache_in:
        # Interpret-mode only: aliasing isn't simulated; seed outputs.
        @pl.when(jnp.logical_and(n == 0, li == 0))
        def _():
            for src, dst in ([(k_in, k_out), (v_in, v_out)] +
                             ([(ks_in, ks_out), (vs_in, vs_out)] if kv8 else [])):
                c = pltpu.make_async_copy(src, dst, emb_sem)
                c.start(); c.wait()

    # ── step-0 init: load this layer's partial tail group from HBM ──
    @pl.when(jnp.logical_and(n == 0, slot > 0))
    def _():
        base = (pos // RG) * RG
        ck = pltpu.make_async_copy(
            k_out.at[li, :, pl.ds(base, RG), :], k_rows.at[li],
            init_sems.at[0])
        cv = pltpu.make_async_copy(
            v_out.at[li, :, pl.ds(base, RG), :], v_rows.at[li],
            init_sems.at[1])
        ck.start(); cv.start()
        if kv8:
            cks = pltpu.make_async_copy(
                ks_out.at[li, :, pl.ds(base, RG)], ks_rows.at[li],
                init_sems.at[2])
            cvs = pltpu.make_async_copy(
                vs_out.at[li, :, pl.ds(base, RG)], vs_rows.at[li],
                init_sems.at[3])
            cks.start(); cvs.start()
            cks.wait(); cvs.wait()
        ck.wait(); cv.wait()

    # ── residual-stream init at the start of each step ──
    @pl.when(li == 0)
    def _():
        @pl.when(n == 0)
        def _():
            x_ref[:] = embed0_ref[:]

        @pl.when(n > 0)
        def _():
            base8 = (tok_ref[0] // ROWG) * ROWG
            pltpu.make_async_copy(
                embed_hbm.at[pl.ds(base8, ROWG), :], emb8, emb_sem).wait()
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, ROWG), 1)
                      == jax.lax.rem(tok_ref[0], ROWG))
            row = jax.lax.dot_general(
                onehot.astype(jnp.float32),
                emb8[:].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [1, H]
            x_ref[:] = row

    # ── chunked prefetch over the flushed prefix ──
    def k_pre_dma(layer, parity, ci):
        return pltpu.make_async_copy(
            k_out.at[layer, :, pl.ds(ci * C, C), :], k_pre.at[parity, ci],
            pre_sems.at[parity, ci, 0])

    def v_pre_dma(layer, parity, ci):
        return pltpu.make_async_copy(
            v_out.at[layer, :, pl.ds(ci * C, C), :], v_pre.at[parity, ci],
            pre_sems.at[parity, ci, 1])

    def ks_pre_dma(layer, parity, ci):
        return pltpu.make_async_copy(
            ks_out.at[layer, :, pl.ds(ci * C, C)], ks_pre.at[parity, ci],
            spre_sems.at[parity, ci, 0])

    def vs_pre_dma(layer, parity, ci):
        return pltpu.make_async_copy(
            vs_out.at[layer, :, pl.ds(ci * C, C)], vs_pre.at[parity, ci],
            spre_sems.at[parity, ci, 1])

    def k_dma(layer, slot_, ci):
        return pltpu.make_async_copy(
            k_out.at[layer, :, pl.ds(ci * C, C), :], k_buf.at[slot_],
            sems.at[slot_, 0])

    def v_dma(layer, slot_, ci):
        return pltpu.make_async_copy(
            v_out.at[layer, :, pl.ds(ci * C, C), :], v_buf.at[slot_],
            sems.at[slot_, 1])

    def ks_dma(layer, slot_, ci):
        return pltpu.make_async_copy(
            ks_out.at[layer, :, pl.ds(ci * C, C)], ks_buf.at[slot_],
            ssems.at[slot_, 0])

    def vs_dma(layer, slot_, ci):
        return pltpu.make_async_copy(
            vs_out.at[layer, :, pl.ds(ci * C, C)], vs_buf.at[slot_],
            ssems.at[slot_, 1])

    def start_prefetch(layer, parity, nc):
        for ci in range(P):
            @pl.when(ci < nc)
            def _():
                k_pre_dma(layer, parity, ci).start()
                v_pre_dma(layer, parity, ci).start()
                if kv8:
                    ks_pre_dma(layer, parity, ci).start()
                    vs_pre_dma(layer, parity, ci).start()

    @pl.when(jnp.logical_and(n == 0, li == 0))
    def _():
        start_prefetch(0, 0, n_chunks)

    def rms(v, w_row):
        var = jnp.mean(v * v, axis=-1, keepdims=True)
        return v * jax.lax.rsqrt(var + eps) * w_row.astype(jnp.float32)

    mm, mm_scaled = make_mms()

    x = x_ref[:]
    normed_bf = rms(x, in_norm_ref[0]).astype(jnp.bfloat16)
    qkv = mm_scaled(normed_bf, wqkv_ref[0], sqkv_ref[0])
    q = qkv[:, :Q].reshape(HQ, D)
    k = qkv[:, Q:Q + KV].reshape(KVH, D)
    v = qkv[:, Q + KV:].reshape(KVH, D)

    q = rms(q, q_norm_ref[0])
    k = rms(k, k_norm_ref[0])

    d2 = D // 2
    if cfg.mrope_section is None:
        cos = cos_hbm[pos]
        sin = sin_hbm[pos]
    else:
        # M-RoPE: frequency-index section s rotates by pos + delta[s];
        # rows are gathered per section and lane-selected (equal deltas
        # reproduce standard RoPE bit-exactly). Layouts match
        # models/decoder.py mrope_section_masks: chunked = contiguous runs,
        # interleaved = j % n == s (Qwen3-Omni apply_interleaved_mrope).
        secs = cfg.mrope_section
        n_sec = len(secs)
        j2 = jax.lax.broadcasted_iota(jnp.int32, (1, d2), 1)
        cos = cos_hbm[pos + mrope_ref[0]][None, :]
        sin = sin_hbm[pos + mrope_ref[0]][None, :]
        for si in range(1, n_sec):
            if cfg.mrope_interleaved:
                m = jnp.logical_and(jax.lax.rem(j2, n_sec) == si,
                                    j2 < n_sec * secs[si])
            else:
                m = j2 >= sum(secs[:si])   # later sections overwrite the tail
            c_row = cos_hbm[pos + mrope_ref[si]][None, :]
            s_row = sin_hbm[pos + mrope_ref[si]][None, :]
            cos = jnp.where(m, c_row, cos)
            sin = jnp.where(m, s_row, sin)

    def rope(t):
        t1, t2 = t[:, :d2], t[:, d2:]
        return jnp.concatenate(
            [t1 * cos - t2 * sin, t2 * cos + t1 * sin], axis=-1)

    q = rope(q)
    k = rope(k)

    # ── stage this step's row in the per-layer tail ring ──
    # (dynamic sublane stores are unsupported; masked read-modify-write of
    # the ring block instead)
    if kv8:
        k_absmax = jnp.max(jnp.abs(k), axis=-1, keepdims=True)    # [KVH, 1]
        v_absmax = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
        k_s = jnp.maximum(k_absmax, 1e-8) / 127.0
        v_s = jnp.maximum(v_absmax, 1e-8) / 127.0
        k_store = jnp.clip(jnp.round(k / k_s), -127, 127)
        v_store = jnp.clip(jnp.round(v / v_s), -127, 127)
        lane_mask = (jax.lax.broadcasted_iota(jnp.int32, (KVH, RG), 1) == slot)
        ks_rows[li] = jnp.where(lane_mask, k_s, ks_rows[li])
        vs_rows[li] = jnp.where(lane_mask, v_s, vs_rows[li])
    else:
        k_store, v_store = k, v
    slot_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, RG, 1), 1) == slot)
    k_rows[li] = jnp.where(slot_mask, k_store.astype(k_rows.dtype)[:, None, :],
                           k_rows[li])
    v_rows[li] = jnp.where(slot_mask, v_store.astype(v_rows.dtype)[:, None, :],
                           v_rows[li])

    # ── attention: chunks over flushed prefix ──
    def _accumulate(kh_all, vh_all, ks_c, vs_c, ci, carry):
        m, l, acc = carry
        col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) + ci * C
        valid = col < flushed
        s_rows = []
        for h in range(KVH):
            kh = kh_all[h].astype(jnp.float32)
            qh = q[h * G:(h + 1) * G]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if kv8:
                s = s * ks_c[h][None, :]
            s_rows.append(s)
        s_all = jnp.where(valid, jnp.concatenate(s_rows, axis=0), -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s_all, axis=1, keepdims=True))
        p = jnp.exp(s_all - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pv_rows = []
        for h in range(KVH):
            vh = vh_all[h].astype(jnp.float32)
            ph = p[h * G:(h + 1) * G]
            if kv8:
                # masked scale: unflushed-region scales can be garbage/NaN,
                # and 0 × NaN would poison the accumulation
                vs_safe = jnp.where(valid[0], vs_c[h], 0.0)
                ph = ph * vs_safe[None, :]
            pv_rows.append(jax.lax.dot_general(
                ph, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        acc_new = acc * corr + jnp.concatenate(pv_rows, axis=0)
        return m_new, l_new, acc_new

    for ci in range(P):
        @pl.when(ci < n_chunks)
        def _():
            k_pre_dma(li, par, ci).wait()
            v_pre_dma(li, par, ci).wait()
            if kv8:
                ks_pre_dma(li, par, ci).wait()
                vs_pre_dma(li, par, ci).wait()

    carry = (jnp.full((HQ, 1), -jnp.inf, dtype=jnp.float32),
             jnp.zeros((HQ, 1), dtype=jnp.float32),
             jnp.zeros((HQ, D), dtype=jnp.float32))
    carry = jax.lax.fori_loop(
        0, jnp.minimum(n_chunks, P),
        lambda ci, c: _accumulate(
            k_pre[par, ci], v_pre[par, ci],
            ks_pre[par, ci] if kv8 else None,
            vs_pre[par, ci] if kv8 else None, ci, c),
        carry)

    S_total = k_in.shape[2]
    if P * C < S_total:
        @pl.when(n_chunks > P)
        def _():
            k_dma(li, jax.lax.rem(P, 2), P).start()
            v_dma(li, jax.lax.rem(P, 2), P).start()
            if kv8:
                ks_dma(li, jax.lax.rem(P, 2), P).start()
                vs_dma(li, jax.lax.rem(P, 2), P).start()

        def stream_body(ci, carry):
            slot_ = jax.lax.rem(ci, 2)
            nxt = jax.lax.rem(ci + 1, 2)

            @pl.when(ci + 1 < n_chunks)
            def _():
                k_dma(li, nxt, ci + 1).start()
                v_dma(li, nxt, ci + 1).start()
                if kv8:
                    ks_dma(li, nxt, ci + 1).start()
                    vs_dma(li, nxt, ci + 1).start()

            k_dma(li, slot_, ci).wait()
            v_dma(li, slot_, ci).wait()
            if kv8:
                ks_dma(li, slot_, ci).wait()
                vs_dma(li, slot_, ci).wait()
            return _accumulate(k_buf[slot_], v_buf[slot_],
                               ks_buf[slot_] if kv8 else None,
                               vs_buf[slot_] if kv8 else None, ci, carry)

        carry = jax.lax.fori_loop(
            P, jnp.maximum(n_chunks, P), stream_body, carry)
    m, l, acc = carry

    # ── tail merge: the ≤ring unflushed rows incl. the in-flight token ──
    tail_col = jax.lax.broadcasted_iota(jnp.int32, (1, RG), 1)
    tail_valid = tail_col <= slot                      # rows flushed..pos
    s_rows = []
    for h in range(KVH):
        kt = k_rows[li, h].astype(jnp.float32)          # [RG, D]
        qh = q[h * G:(h + 1) * G]
        s = jax.lax.dot_general(
            qh, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if kv8:
            s = s * ks_rows[li, h][None, :]
        s_rows.append(s)
    s_tail = jnp.where(tail_valid, jnp.concatenate(s_rows, axis=0), -jnp.inf)
    m_f = jnp.maximum(m, jnp.max(s_tail, axis=1, keepdims=True))
    p_t = jnp.exp(s_tail - m_f)
    corr = jnp.exp(m - m_f)
    l_f = l * corr + jnp.sum(p_t, axis=1, keepdims=True)
    # Mask V rows too: uninitialised scratch can hold NaN, and 0 × NaN = NaN
    # would poison the contraction even where p_t is zero.
    row_valid = jax.lax.broadcasted_iota(jnp.int32, (RG, 1), 0) <= slot
    pv_rows = []
    for h in range(KVH):
        vt = jnp.where(row_valid, v_rows[li, h].astype(jnp.float32), 0.0)
        ph = p_t[h * G:(h + 1) * G]
        if kv8:
            vs_safe = jnp.where(tail_valid[0], vs_rows[li, h], 0.0)
            ph = ph * vs_safe[None, :]
        pv_rows.append(jax.lax.dot_general(
            ph, vt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    acc_f = acc * corr + jnp.concatenate(pv_rows, axis=0)
    attn = (acc_f / l_f).reshape(1, Q)

    x = x + mm_scaled(attn.astype(jnp.bfloat16), wo_ref[0], so_ref[0])
    normed2_bf = rms(x, post_norm_ref[0]).astype(jnp.bfloat16)
    gate_up = mm_scaled(normed2_bf, w_gate_up_ref[0], sgu_ref[0])
    gate, up = gate_up[:, :I], gate_up[:, I:]
    mlp = (gate * jax.lax.logistic(gate)) * up
    x = x + mm_scaled(mlp.astype(jnp.bfloat16), w_down_ref[0], sd_ref[0])
    x_ref[:] = x

    # ── flush a full aligned row group once per `ring` steps ──
    k_flush = pltpu.make_async_copy(
        k_rows.at[li],
        k_out.at[li, :, pl.ds((pos // RG) * RG, RG), :],
        flush_sems.at[0])
    v_flush = pltpu.make_async_copy(
        v_rows.at[li],
        v_out.at[li, :, pl.ds((pos // RG) * RG, RG), :],
        flush_sems.at[1])
    if kv8:
        ks_flush = pltpu.make_async_copy(
            ks_rows.at[li],
            ks_out.at[li, :, pl.ds((pos // RG) * RG, RG)],
            flush_sems.at[2])
        vs_flush = pltpu.make_async_copy(
            vs_rows.at[li],
            vs_out.at[li, :, pl.ds((pos // RG) * RG, RG)],
            flush_sems.at[3])

    @pl.when(slot == RG - 1)
    def _():
        k_flush.start()
        v_flush.start()
        if kv8:
            ks_flush.start()
            vs_flush.start()

    # prefetch next layer's / next step's chunks
    @pl.when(li + 1 < L)
    def _():
        start_prefetch(li + 1, jax.lax.rem(li + 1, 2), n_chunks)

    @pl.when(jnp.logical_and(li + 1 == L, n + 1 < N))
    def _():
        nxt_flushed = (pos + 1) - jax.lax.rem(pos + 1, RG)
        start_prefetch(0, 0, pl.cdiv(nxt_flushed, C))

    @pl.when(slot == RG - 1)
    def _():
        k_flush.wait()
        v_flush.wait()
        if kv8:
            ks_flush.wait()
            vs_flush.wait()

    # ── last layer: final norm, LM head, token feedback ──
    @pl.when(li == L - 1)
    def _():
        nrm = rms(x, final_norm_ref[0])
        normed_ref[:] = nrm
        logits = mm_scaled(nrm.astype(jnp.bfloat16), lm_head_ref[:],
                           lms_ref[:])
        tok = jnp.argmax(logits, axis=1)[0].astype(jnp.int32)
        tokens_ref[0, n] = tok
        tok_ref[0] = tok

        @pl.when(n + 1 < N)
        def _():
            base8 = (tok // ROWG) * ROWG
            pltpu.make_async_copy(
                embed_hbm.at[pl.ds(base8, ROWG), :], emb8, emb_sem).start()

    # ── export the unflushed tail on the last step (landed by XLA after) ──
    @pl.when(n == N - 1)
    def _():
        tail_k_ref[li] = k_rows[li]
        tail_v_ref[li] = v_rows[li]
        if kv8:
            tail_ks_ref[li] = ks_rows[li]
            tail_vs_ref[li] = vs_rows[li]


def _layer_spec(shape):
    return pl.BlockSpec((1,) + shape[1:],
                        lambda n, l: (l,) + tuple(0 for _ in shape[1:]),
                        memory_space=pltpu.VMEM)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda n, l: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _generate_impl(
    cfg: DecoderConfig,
    w: DecoderWeights,
    state: DecodeState,
    first_token: jax.Array,     # int32
    num_steps: int,
    chunk: int = ATTN_CHUNK,
    prefetch_chunks: int = PREFETCH_CHUNKS,
    copy_cache_in: bool = False,
    mrope_pos0: jax.Array | None = None,   # [3] int32 M-RoPE start positions
    interpret: bool = False,               # Pallas interpret mode (CPU tests)
    ring_override: int | None = None,      # interpret tests only: small int8
                                           # ring so flush/init paths run in
                                           # few steps (hardware needs 128)
):
    """Greedy-decode `num_steps` tokens in one kernel.

    Returns (state, tokens [num_steps] int32). The KV cache is updated in
    place (aliased buffers); the final partial row group is landed with one
    XLA-side update after the kernel. With `cfg.mrope_section` set, step n
    rotates section s by `mrope_pos0[s] + n` (defaults to the cache
    position, i.e. standard RoPE). An int8 KV cache (init_state with
    jnp.int8) halves the position-proportional cache read traffic; see the
    module docstring.
    """
    L, H = cfg.num_layers, cfg.hidden_size
    KVH, D, V = cfg.num_kv_heads, cfg.head_dim, cfg.vocab_size
    S = cfg.max_seq_len
    C = min(chunk, S)
    check_attn_chunk(S, C)
    kv8 = state.k_cache.dtype == jnp.int8
    RG = ROWG if not kv8 else (ring_override or KV8_RING)
    if kv8:
        if C % 128 != 0 and ring_override is None:
            raise ValueError(
                f"int8 KV mode needs the attention chunk ({C}) to be a "
                f"multiple of 128 (scale slices are lane-dim)")
        if S % RG != 0:
            raise ValueError(f"max_seq_len ({S}) must be a multiple of {RG} "
                             f"in int8 KV mode")
        if state.k_scale is None or state.v_scale is None:
            raise ValueError("int8 KV state must carry k_scale/v_scale "
                             "(build it with init_state(cfg, jnp.int8))")
    P = max(1, min(prefetch_chunks, -(-S // C)))
    N = num_steps
    pos0 = state.position

    kernel = functools.partial(_gen_kernel, cfg=cfg, chunk=C,
                               prefetch_chunks=P, ring=RG, kv8=kv8,
                               copy_cache_in=copy_cache_in)
    lw = w.layers
    quant = hasattr(lw, "wqkv_q")
    if quant:
        wqkv, wo_m, wgu, wd = lw.wqkv_q, lw.wo_q, lw.w_gate_up_q, lw.w_down_q
        sqkv, so_s, sgu, sd = lw.wqkv_s, lw.wo_s, lw.w_gate_up_s, lw.w_down_s
    else:
        wqkv, wo_m, wgu, wd = lw.wqkv, lw.wo, lw.w_gate_up, lw.w_down
        ones = lambda out: jnp.ones((L, 1, out), jnp.float32)
        sqkv, so_s = ones(wqkv.shape[2]), ones(H)
        sgu, sd = ones(wgu.shape[2]), ones(H)
    embed0 = w.embed[first_token].astype(jnp.float32)[None, :]
    lms = getattr(w, "lm_head_s", None)
    if lms is None:
        lms = jnp.ones((1, V), jnp.float32)
    if mrope_pos0 is None:
        md = jnp.zeros((3,), jnp.int32)
    else:
        md = jnp.asarray(mrope_pos0, jnp.int32) - jnp.asarray(pos0, jnp.int32)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),     # pos0
        pl.BlockSpec(memory_space=pltpu.SMEM),     # mrope deltas
        _layer_spec((L, 1, H)),
        _layer_spec(wqkv.shape),
        _layer_spec((L, 1, D)),
        _layer_spec((L, 1, D)),
        _layer_spec(wo_m.shape),
        _layer_spec((L, 1, H)),
        _layer_spec(wgu.shape),
        _layer_spec(wd.shape),
        _layer_spec(sqkv.shape),
        _layer_spec(so_s.shape),
        _layer_spec(sgu.shape),
        _layer_spec(sd.shape),
        _const_spec((1, H)),                       # final norm
        _const_spec((H, V)),                       # lm head
        _const_spec((1, V)),                       # lm head scale
        pl.BlockSpec(memory_space=pl.ANY),         # embed table
        _const_spec((1, H)),                       # embed0
        _const_spec(w.rope.cos.shape),             # cos [S, D//2]
        _const_spec(w.rope.sin.shape),
        pl.BlockSpec(memory_space=pl.ANY),         # k cache in
        pl.BlockSpec(memory_space=pl.ANY),         # v cache in
    ]
    operands = [
        jnp.asarray(pos0, jnp.int32).reshape(1),
        md,
        lw.input_norm[:, None, :], wqkv,
        lw.q_norm[:, None, :], lw.k_norm[:, None, :],
        wo_m, lw.post_norm[:, None, :], wgu, wd,
        sqkv, so_s, sgu, sd,
        w.final_norm[None, :], w.lm_head, lms,
        w.embed, embed0, w.rope.cos, w.rope.sin,
        state.k_cache, state.v_cache,
    ]
    n_cache_out = 2
    if kv8:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),   # k scales in
                     pl.BlockSpec(memory_space=pl.ANY)]   # v scales in
        operands += [state.k_scale, state.v_scale]
        n_cache_out = 4
    n_in = len(in_specs)

    # One ordered (spec, shape) pair per output — a SINGLE list, so the
    # specs, shapes, and the kernel body's positional unpack cannot drift
    # apart (a mis-binding here surfaces on this platform only as a
    # diagnostics-free runtime InvalidArgument). Order mirrors the body's
    # unpack: caches [+ scales], tokens, normed, tails [+ scale tails].
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    cdt = state.k_cache.dtype
    outs_def = [
        (any_spec, jax.ShapeDtypeStruct(state.k_cache.shape, cdt)),
        (any_spec, jax.ShapeDtypeStruct(state.v_cache.shape, cdt)),
    ]
    if kv8:
        outs_def += [
            (any_spec, jax.ShapeDtypeStruct(state.k_scale.shape, jnp.float32)),
            (any_spec, jax.ShapeDtypeStruct(state.v_scale.shape, jnp.float32)),
        ]
    outs_def += [
        # tokens [1, N]: ONE SMEM row — SMEM allocates 512 B per row, so the
        # [N, 1] layout costs N*512 B and blows the ~1 MB SMEM budget at
        # N=4096; one row of N lanes costs ~N*4 B
        (pl.BlockSpec(memory_space=pltpu.SMEM),
         jax.ShapeDtypeStruct((1, N), jnp.int32)),
        (_const_spec((1, H)), jax.ShapeDtypeStruct((1, H), jnp.float32)),
        (_const_spec((L, KVH, RG, D)),
         jax.ShapeDtypeStruct((L, KVH, RG, D), cdt)),          # tail k
        (_const_spec((L, KVH, RG, D)),
         jax.ShapeDtypeStruct((L, KVH, RG, D), cdt)),          # tail v
    ]
    if kv8:
        outs_def += [
            (_const_spec((L, KVH, RG)),
             jax.ShapeDtypeStruct((L, KVH, RG), jnp.float32)),  # tail ks
            (_const_spec((L, KVH, RG)),
             jax.ShapeDtypeStruct((L, KVH, RG), jnp.float32)),  # tail vs
        ]
    out_specs = [s for s, _ in outs_def]
    out_shapes = [sh for _, sh in outs_def]

    scratch_shapes = [
        pltpu.VMEM((1, H), jnp.float32),                      # x
        pltpu.VMEM((ROWG, H), jnp.bfloat16),                  # emb8
        pltpu.VMEM((L, KVH, RG, D), state.k_cache.dtype),     # k_rows
        pltpu.VMEM((L, KVH, RG, D), state.v_cache.dtype),     # v_rows
    ]
    if kv8:
        scratch_shapes += [
            pltpu.VMEM((L, KVH, RG), jnp.float32),            # ks_rows
            pltpu.VMEM((L, KVH, RG), jnp.float32),            # vs_rows
        ]
    scratch_shapes += [
        pltpu.VMEM((2, P, KVH, C, D), state.k_cache.dtype),   # k_pre
        pltpu.VMEM((2, P, KVH, C, D), state.v_cache.dtype),   # v_pre
    ]
    if kv8:
        scratch_shapes += [
            pltpu.VMEM((2, P, KVH, C), jnp.float32),          # ks_pre
            pltpu.VMEM((2, P, KVH, C), jnp.float32),          # vs_pre
        ]
    scratch_shapes += [pltpu.SemaphoreType.DMA((2, P, 2))]    # pre_sems
    if kv8:
        scratch_shapes += [pltpu.SemaphoreType.DMA((2, P, 2))]  # spre_sems
    scratch_shapes += [
        pltpu.VMEM((2, KVH, C, D), state.k_cache.dtype),      # k_buf
        pltpu.VMEM((2, KVH, C, D), state.v_cache.dtype),      # v_buf
    ]
    if kv8:
        scratch_shapes += [
            pltpu.VMEM((2, KVH, C), jnp.float32),             # ks_buf
            pltpu.VMEM((2, KVH, C), jnp.float32),             # vs_buf
        ]
    scratch_shapes += [pltpu.SemaphoreType.DMA((2, 2))]       # sems
    if kv8:
        scratch_shapes += [pltpu.SemaphoreType.DMA((2, 2))]   # ssems
    scratch_shapes += [
        pltpu.SemaphoreType.DMA((4,) if kv8 else (2,)),       # flush
        pltpu.SemaphoreType.DMA(()),                          # embed gather
        pltpu.SemaphoreType.DMA((4,) if kv8 else (2,)),       # step-0 init
        pltpu.SMEM((1,), jnp.int32),                          # last token
    ]

    aliases = {n_in - n_cache_out + i: i for i in range(n_cache_out)}

    outs = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(N, L),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        input_output_aliases=aliases,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_MB * 1024 * 1024,
            has_side_effects=True,
        ),
    )(*operands)

    if kv8:
        (k_cache, v_cache, k_scale, v_scale, tokens, _normed,
         tail_k, tail_v, tail_ks, tail_vs) = outs
    else:
        k_cache, v_cache, tokens, _normed, tail_k, tail_v = outs
        k_scale = v_scale = None

    # Land the final partial row group (aligned ring-slab overwrite is safe:
    # the tail ring holds the full group's rows where valid; positions ≥ end
    # are never read thanks to the attention masks).
    end = pos0 + N
    base = jnp.maximum((end - 1) // RG * RG, 0)
    k_cache = jax.lax.dynamic_update_slice(k_cache, tail_k, (0, 0, base, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, tail_v, (0, 0, base, 0))
    if kv8:
        k_scale = jax.lax.dynamic_update_slice(k_scale, tail_ks, (0, 0, base))
        v_scale = jax.lax.dynamic_update_slice(v_scale, tail_vs, (0, 0, base))

    new_state = DecodeState(k_cache=k_cache, v_cache=v_cache, position=end,
                            k_scale=k_scale, v_scale=v_scale)
    return new_state, tokens[0, :]


_STATIC = ("cfg", "num_steps", "chunk", "prefetch_chunks", "copy_cache_in",
           "interpret", "ring_override")

_jit_bf16 = functools.partial(jax.jit, static_argnames=_STATIC,
                              donate_argnames=("state",))(_generate_impl)


def _kv8_entry(cfg, w, k_cache, v_cache, position, k_scale, v_scale,
               first_token, num_steps, chunk=ATTN_CHUNK,
               prefetch_chunks=PREFETCH_CHUNKS, copy_cache_in=False,
               mrope_pos0=None, interpret=False, ring_override=None):
    state = DecodeState(k_cache=k_cache, v_cache=v_cache, position=position,
                        k_scale=k_scale, v_scale=v_scale)
    return _generate_impl(cfg, w, state, first_token, num_steps, chunk,
                          prefetch_chunks, copy_cache_in, mrope_pos0,
                          interpret, ring_override)


_jit_kv8 = functools.partial(jax.jit, static_argnames=_STATIC,
                             donate_argnames=("k_cache", "v_cache"))(_kv8_entry)


def generate_megakernel(cfg, w, state, first_token, num_steps, **kw):
    """Dispatching wrapper (see _generate_impl for semantics).

    bf16 mode donates the whole state; int8 KV mode donates ONLY the cache
    arrays — donating the f32 scale arrays while they are also
    pallas-aliased trips a runtime InvalidArgument in this platform's
    runtime (empirically bisected; the ~15 MB un-donated scale copy per
    call is noise next to the ~GB caches)."""
    mp = kw.get("mrope_pos0")
    if mp is not None and not isinstance(mp, jax.core.Tracer):
        # M-RoPE sections index the rope table AHEAD of the cache position;
        # the table has MROPE_HEADROOM extra rows (core/weights.py) — fail
        # loudly instead of reading past it (kernel: garbage rotations;
        # XLA path: silent dynamic_slice clamp).
        import numpy as _np

        hi = int(_np.max(_np.asarray(mp))) + num_steps
        rows = w.rope.cos.shape[0]
        if hi > rows:
            raise ValueError(
                f"mrope_pos0 max + num_steps ({hi}) exceeds the rope table "
                f"({rows} rows = max_seq_len + headroom); shorten the run "
                f"or raise MROPE_HEADROOM (core/weights.py)")
    if state.k_cache.dtype == jnp.int8:
        return _jit_kv8(cfg, w, state.k_cache, state.v_cache, state.position,
                        state.k_scale, state.v_scale, first_token, num_steps,
                        **kw)
    return _jit_bf16(cfg, w, state, first_token, num_steps, **kw)


# tests and experiment harnesses reach the raw impl / cache controls
generate_megakernel.__wrapped__ = _generate_impl


def _clear_cache():
    _jit_bf16.clear_cache()
    _jit_kv8.clear_cache()


generate_megakernel.clear_cache = _clear_cache
