"""N-step generate megakernel: grid = (num_steps, num_layers).

The complete TPU equivalent of the reference's `launch_ldg_generate_nosync`
(reference: csrc/kernel.cu:1555-1613, torch_bindings.cpp:93-127): N greedy
decode steps run inside ONE `pallas_call` with zero host involvement —
token feedback (`LM head argmax → embedding lookup`) happens on device, and
the KV cache is updated in place through aliased inputs/outputs.

Mosaic constraint shaping the design: dynamic slices of tiled HBM dims must
be 8-aligned, so single-row cache stores at arbitrary positions are illegal.
Instead each layer stages its most recent ≤8 K/V rows in a persistent VMEM
ring (`k_rows`/`v_rows`, `[L, KVH, 8, D]`) and flushes a full aligned 8-row
group to HBM once per 8 steps; attention runs chunked over the flushed
prefix and merges the VMEM tail (including the in-flight token) as one
masked 8-column block. The embedding gather likewise fetches an aligned
8-row group and selects the row with a one-hot contraction.

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

ROWG = 8  # HBM row-group granularity (sublane tiling)


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
    lm_head_ref,      # [H, V]
    embed_hbm,        # ANY [Vembed, H] bf16
    embed0_ref,       # [1, H] f32
    cos_hbm,          # VMEM [S, D//2] f32
    sin_hbm,          # VMEM [S, D//2] f32
    # cache (aliased in/out, ANY)
    k_in, v_in,
    # outputs
    k_out, v_out,     # ANY — aliased to k_in/v_in
    tokens_ref,       # SMEM [N, 1] int32
    normed_ref,       # VMEM [1, H] f32
    tail_k_ref,       # VMEM [L, KVH, ROWG, D] bf16 — unflushed rows at exit
    tail_v_ref,
    # scratch
    x_ref,            # VMEM [1, H] f32
    emb8,             # VMEM [ROWG, H] bf16 — aligned embedding row-group
    k_rows, v_rows,   # VMEM [L, KVH, ROWG, D] bf16 — per-layer tail rings
    k_pre, v_pre,     # VMEM [2, P, KVH, C, D] bf16
    pre_sems,         # DMA (2, P, 2)
    k_buf, v_buf,     # VMEM [2, KVH, C, D] bf16
    sems,             # DMA (2, 2)
    flush_sems,       # DMA (2,)
    emb_sem,          # DMA ()
    init_sems,        # DMA (2,)
    tok_ref,          # SMEM (1,) int32
    *,
    cfg: DecoderConfig,
    chunk: int,
    prefetch_chunks: int,
    copy_cache_in: bool = False,
):
    n = pl.program_id(0)
    li = pl.program_id(1)
    N = pl.num_programs(0)
    L = pl.num_programs(1)
    H, Q, KV = cfg.hidden_size, cfg.q_size, cfg.kv_size
    KVH, HQ, D, G = cfg.num_kv_heads, cfg.num_q_heads, cfg.head_dim, cfg.gqa_groups
    I = cfg.intermediate_size
    C = chunk
    P = prefetch_chunks
    eps = cfg.rms_eps
    scale = 1.0 / (D ** 0.5)

    pos = pos0_ref[0] + n                 # entries valid before this step
    slot = jax.lax.rem(pos, ROWG)         # this step's slot in the tail ring
    # Mosaic can statically prove `(x // 8) * 8` is 8-aligned (the `pos -
    # rem` form it cannot); keep this exact form for every HBM index.
    flushed = (pos // ROWG) * ROWG        # rows [0, flushed) live in HBM
    n_chunks = pl.cdiv(flushed, C)
    par = jax.lax.rem(li, 2)

    if copy_cache_in:
        # Interpret-mode only: aliasing isn't simulated; seed outputs.
        @pl.when(jnp.logical_and(n == 0, li == 0))
        def _():
            c = pltpu.make_async_copy(k_in, k_out, emb_sem)
            c.start(); c.wait()
            c = pltpu.make_async_copy(v_in, v_out, emb_sem)
            c.start(); c.wait()

    # ── step-0 init: load this layer's partial tail group from HBM ──
    @pl.when(jnp.logical_and(n == 0, slot > 0))
    def _():
        base = (pos // ROWG) * ROWG
        ck = pltpu.make_async_copy(
            k_out.at[li, :, pl.ds(base, ROWG), :], k_rows.at[li],
            init_sems.at[0])
        cv = pltpu.make_async_copy(
            v_out.at[li, :, pl.ds(base, ROWG), :], v_rows.at[li],
            init_sems.at[1])
        ck.start(); cv.start()
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

    def k_dma(layer, slot_, ci):
        return pltpu.make_async_copy(
            k_out.at[layer, :, pl.ds(ci * C, C), :], k_buf.at[slot_],
            sems.at[slot_, 0])

    def v_dma(layer, slot_, ci):
        return pltpu.make_async_copy(
            v_out.at[layer, :, pl.ds(ci * C, C), :], v_buf.at[slot_],
            sems.at[slot_, 1])

    def start_prefetch(layer, parity, nc):
        for ci in range(P):
            @pl.when(ci < nc)
            def _():
                k_pre_dma(layer, parity, ci).start()
                v_pre_dma(layer, parity, ci).start()

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
        # reproduce standard RoPE bit-exactly).
        secs = cfg.mrope_section
        j2 = jax.lax.broadcasted_iota(jnp.int32, (1, d2), 1)
        cos = cos_hbm[pos + mrope_ref[len(secs) - 1]][None, :]
        sin = sin_hbm[pos + mrope_ref[len(secs) - 1]][None, :]
        bound = d2
        for si in range(len(secs) - 2, -1, -1):
            bound -= secs[si + 1]
            c_row = cos_hbm[pos + mrope_ref[si]][None, :]
            s_row = sin_hbm[pos + mrope_ref[si]][None, :]
            cos = jnp.where(j2 < bound, c_row, cos)
            sin = jnp.where(j2 < bound, s_row, sin)

    def rope(t):
        t1, t2 = t[:, :d2], t[:, d2:]
        return jnp.concatenate(
            [t1 * cos - t2 * sin, t2 * cos + t1 * sin], axis=-1)

    q = rope(q)
    k = rope(k)

    # ── stage this step's row in the per-layer tail ring ──
    # (dynamic sublane stores are unsupported; masked read-modify-write of
    # the 16 KB block instead)
    slot_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, ROWG, 1), 1) == slot)
    k_rows[li] = jnp.where(slot_mask, k.astype(k_rows.dtype)[:, None, :],
                           k_rows[li])
    v_rows[li] = jnp.where(slot_mask, v.astype(v_rows.dtype)[:, None, :],
                           v_rows[li])

    # ── attention: chunks over flushed prefix ──
    def _accumulate(kh_all, vh_all, ci, carry):
        m, l, acc = carry
        col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) + ci * C
        valid = col < flushed
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
            ph = p[h * G:(h + 1) * G]
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

    carry = (jnp.full((HQ, 1), -jnp.inf, dtype=jnp.float32),
             jnp.zeros((HQ, 1), dtype=jnp.float32),
             jnp.zeros((HQ, D), dtype=jnp.float32))
    carry = jax.lax.fori_loop(
        0, jnp.minimum(n_chunks, P),
        lambda ci, c: _accumulate(k_pre[par, ci], v_pre[par, ci], ci, c),
        carry)

    S_total = k_in.shape[2]
    if P * C < S_total:
        @pl.when(n_chunks > P)
        def _():
            k_dma(li, jax.lax.rem(P, 2), P).start()
            v_dma(li, jax.lax.rem(P, 2), P).start()

        def stream_body(ci, carry):
            slot_ = jax.lax.rem(ci, 2)
            nxt = jax.lax.rem(ci + 1, 2)

            @pl.when(ci + 1 < n_chunks)
            def _():
                k_dma(li, nxt, ci + 1).start()
                v_dma(li, nxt, ci + 1).start()

            k_dma(li, slot_, ci).wait()
            v_dma(li, slot_, ci).wait()
            return _accumulate(k_buf[slot_], v_buf[slot_], ci, carry)

        carry = jax.lax.fori_loop(
            P, jnp.maximum(n_chunks, P), stream_body, carry)
    m, l, acc = carry

    # ── tail merge: the ≤8 unflushed rows incl. the in-flight token ──
    tail_col = jax.lax.broadcasted_iota(jnp.int32, (1, ROWG), 1)
    tail_valid = tail_col <= slot                      # rows flushed..pos
    s_rows = []
    for h in range(KVH):
        kt = k_rows[li, h].astype(jnp.float32)          # [ROWG, D]
        qh = q[h * G:(h + 1) * G]
        s_rows.append(jax.lax.dot_general(
            qh, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)
    s_tail = jnp.where(tail_valid, jnp.concatenate(s_rows, axis=0), -jnp.inf)
    m_f = jnp.maximum(m, jnp.max(s_tail, axis=1, keepdims=True))
    p_t = jnp.exp(s_tail - m_f)
    corr = jnp.exp(m - m_f)
    l_f = l * corr + jnp.sum(p_t, axis=1, keepdims=True)
    # Mask V rows too: uninitialised scratch can hold NaN, and 0 × NaN = NaN
    # would poison the contraction even where p_t is zero.
    row_valid = jax.lax.broadcasted_iota(jnp.int32, (ROWG, 1), 0) <= slot
    pv_rows = []
    for h in range(KVH):
        vt = jnp.where(row_valid, v_rows[li, h].astype(jnp.float32), 0.0)
        ph = p_t[h * G:(h + 1) * G]
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

    # ── flush a full aligned row group once per ROWG steps ──
    k_flush = pltpu.make_async_copy(
        k_rows.at[li],
        k_out.at[li, :, pl.ds((pos // ROWG) * ROWG, ROWG), :],
        flush_sems.at[0])
    v_flush = pltpu.make_async_copy(
        v_rows.at[li],
        v_out.at[li, :, pl.ds((pos // ROWG) * ROWG, ROWG), :],
        flush_sems.at[1])

    @pl.when(slot == ROWG - 1)
    def _():
        k_flush.start()
        v_flush.start()

    # prefetch next layer's / next step's chunks
    @pl.when(li + 1 < L)
    def _():
        start_prefetch(li + 1, jax.lax.rem(li + 1, 2), n_chunks)

    @pl.when(jnp.logical_and(li + 1 == L, n + 1 < N))
    def _():
        nxt_flushed = (pos + 1) - jax.lax.rem(pos + 1, ROWG)
        start_prefetch(0, 0, pl.cdiv(nxt_flushed, C))

    @pl.when(slot == ROWG - 1)
    def _():
        k_flush.wait()
        v_flush.wait()

    # ── last layer: final norm, LM head, token feedback ──
    @pl.when(li == L - 1)
    def _():
        nrm = rms(x, final_norm_ref[0])
        normed_ref[:] = nrm
        logits = mm(nrm.astype(jnp.bfloat16), lm_head_ref[:])
        tok = jnp.argmax(logits, axis=1)[0].astype(jnp.int32)
        tokens_ref[n, 0] = tok
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


def _layer_spec(shape):
    return pl.BlockSpec((1,) + shape[1:],
                        lambda n, l: (l,) + tuple(0 for _ in shape[1:]),
                        memory_space=pltpu.VMEM)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda n, l: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps", "chunk",
                                             "prefetch_chunks",
                                             "copy_cache_in", "interpret"),
                   donate_argnames=("state",))
def generate_megakernel(
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
):
    """Greedy-decode `num_steps` tokens in one kernel.

    Returns (state, tokens [num_steps] int32). The KV cache is updated in
    place (aliased buffers); the final partial row group is landed with one
    XLA-side update after the kernel. With `cfg.mrope_section` set, step n
    rotates section s by `mrope_pos0[s] + n` (defaults to the cache
    position, i.e. standard RoPE).
    """
    L, H = cfg.num_layers, cfg.hidden_size
    KVH, D, V = cfg.num_kv_heads, cfg.head_dim, cfg.vocab_size
    S = cfg.max_seq_len
    C = min(chunk, S)
    check_attn_chunk(S, C)
    P = max(1, min(prefetch_chunks, -(-S // C)))
    N = num_steps
    pos0 = state.position

    kernel = functools.partial(_gen_kernel, cfg=cfg, chunk=C,
                               prefetch_chunks=P, copy_cache_in=copy_cache_in)
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
        pl.BlockSpec(memory_space=pl.ANY),         # embed table
        _const_spec((1, H)),                       # embed0
        _const_spec(w.rope.cos.shape),             # cos [S, D//2]
        _const_spec(w.rope.sin.shape),
        pl.BlockSpec(memory_space=pl.ANY),         # k cache in
        pl.BlockSpec(memory_space=pl.ANY),         # v cache in
    ]
    out_specs = (
        pl.BlockSpec(memory_space=pl.ANY),         # k cache out (aliased)
        pl.BlockSpec(memory_space=pl.ANY),         # v cache out (aliased)
        pl.BlockSpec(memory_space=pltpu.SMEM),     # tokens [N, 1]
        _const_spec((1, H)),                       # final hidden
        _const_spec((L, KVH, ROWG, D)),            # tail k
        _const_spec((L, KVH, ROWG, D)),            # tail v
    )
    out_shapes = (
        jax.ShapeDtypeStruct(state.k_cache.shape, state.k_cache.dtype),
        jax.ShapeDtypeStruct(state.v_cache.shape, state.v_cache.dtype),
        jax.ShapeDtypeStruct((N, 1), jnp.int32),
        jax.ShapeDtypeStruct((1, H), jnp.float32),
        jax.ShapeDtypeStruct((L, KVH, ROWG, D), state.k_cache.dtype),
        jax.ShapeDtypeStruct((L, KVH, ROWG, D), state.v_cache.dtype),
    )

    k_cache, v_cache, tokens, _normed, tail_k, tail_v = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(N, L),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases={20: 0, 21: 1},       # cache in → cache out
        scratch_shapes=[
            pltpu.VMEM((1, H), jnp.float32),                      # x
            pltpu.VMEM((ROWG, H), jnp.bfloat16),                  # emb8
            pltpu.VMEM((L, KVH, ROWG, D), state.k_cache.dtype),   # k_rows
            pltpu.VMEM((L, KVH, ROWG, D), state.v_cache.dtype),   # v_rows
            pltpu.VMEM((2, P, KVH, C, D), state.k_cache.dtype),
            pltpu.VMEM((2, P, KVH, C, D), state.v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, P, 2)),
            pltpu.VMEM((2, KVH, C, D), state.k_cache.dtype),
            pltpu.VMEM((2, KVH, C, D), state.v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),                        # flush
            pltpu.SemaphoreType.DMA(()),                          # embed gather
            pltpu.SemaphoreType.DMA((2,)),                        # step-0 init
            pltpu.SMEM((1,), jnp.int32),                          # last token
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_MB * 1024 * 1024,
            has_side_effects=True,
        ),
    )(
        jnp.asarray(pos0, jnp.int32).reshape(1),
        md,
        lw.input_norm[:, None, :], wqkv,
        lw.q_norm[:, None, :], lw.k_norm[:, None, :],
        wo_m, lw.post_norm[:, None, :], wgu, wd,
        sqkv, so_s, sgu, sd,
        w.final_norm[None, :], w.lm_head,
        w.embed, embed0, w.rope.cos, w.rope.sin,
        state.k_cache, state.v_cache,
    )

    # Land the final partial row group (aligned ROWG-slab overwrite is safe:
    # the tail ring holds the full group's rows where valid; positions ≥ end
    # are never read thanks to the attention masks).
    end = pos0 + N
    base = jnp.maximum((end - 1) // ROWG * ROWG, 0)
    k_cache = jax.lax.dynamic_update_slice(k_cache, tail_k, (0, 0, base, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, tail_v, (0, 0, base, 0))

    new_state = DecodeState(k_cache=k_cache, v_cache=v_cache, position=end)
    return new_state, tokens[:, 0]
