"""The Pallas megakernel: one fused decode step, grid over layers.

TPU-native equivalent of the reference's single persistent CUDA kernel per
token (reference: csrc/kernel.cu:1191-1432) — everything from the input
embedding through 28 transformer layers (RMSNorm → QKV → QK-norm+RoPE →
KV-cache attention → O-proj+residual → post-norm → SwiGLU → residual), the
final RMSNorm and the codec LM head runs in ONE `pallas_call`.

Where the CUDA kernel needed hand-rolled grid barriers, L1-bypass loads and
L2 prefetch choreography (kernel.cu:96-164, 301-316), the TPU form exploits
the sequential Pallas grid: `grid=(num_layers,)` with layer-indexed
BlockSpecs makes the pipeline hardware prefetch layer l+1's ~30 MB weight
slab into VMEM while layer l computes (v5e has ~120 MB usable VMEM — two
slabs fit comfortably). The residual stream lives in a VMEM scratch that
persists across grid steps; the KV cache stays in HBM and is read via the
chunked online-softmax loop of ops/attention.py, with the current token
merged as a virtual column so the cache is never written in-kernel (the new
K/V columns are emitted per layer and landed with one tiny XLA-side update).

The same kernel body serves the 28-layer talker and the 5-layer code
predictor as two jit specialisations — the TPU analog of the reference's
runtime `num_layers` argument (kernel.cu:1251).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import (
    ATTN_CHUNK,
    DecoderConfig,
    HEAD_FUSE_LIMIT_MB,
    PREFETCH_CHUNKS,
    VMEM_LIMIT_MB,
)
from ..core.weights import DecoderWeights
from ..models.decoder import DecodeState


def make_mms():
    """(mm, mm_scaled) matvec helpers shared by the fused kernels.

    `mm` is the plain bf16×bf16→f32 contraction (int8 weights upcast in
    VMEM — VPU work hidden under the next slab's halved HBM DMA).
    `mm_scaled(a, w, s)` applies weight-only dequant scales `s`:
      - s [1, out]: per-output-channel (int8 mode, or all-ones for bf16) —
        one multiply on the matmul output;
      - s [ng, out], ng > 1: GROUP-WISE along the contraction axis (group =
        in/ng rows): the contraction is batched over groups and each
        group's partial product is scaled before the final sum;
      - w [in/2, out] int8 with a [1, in]: nibble-PACKED int4 (halves
        layout, core/weights.py pack_int4) — both nibbles are sign-extended
        on the VPU and each half contracts against its slice of `a`.
        Sign extension uses arithmetic shifts (`(w<<28)>>28` / `w>>4`, 3 ops)
        rather than the mask/xor/sub identity (4 ops): measured +8% tok/s
        (1920 vs 1775, benchmarks/exp_int4_unpack.py) — the unpack is VPU
        work on the critical path between slab DMAs.
    """

    def mm(a, w):
        if w.dtype != jnp.bfloat16:
            w = w.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def _grouped(ah, wh, sh):
        ngh, n_out = sh.shape
        gs = ah.shape[1] // ngh
        wg = wh.reshape(ngh, gs, n_out)
        ag = ah.reshape(ngh, 1, gs)
        partial = jax.lax.dot_general(
            ag, wg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [ng, 1, out]
        return jnp.sum(partial * sh[:, None, :], axis=0)  # [1, out]

    def mm_scaled(a, w, s):
        ng = s.shape[0]
        if 2 * w.shape[0] == a.shape[1]:               # packed int4
            wi = w.astype(jnp.int32)
            lo = ((wi << 28) >> 28).astype(jnp.bfloat16)
            hi = (wi >> 4).astype(jnp.bfloat16)
            half = a.shape[1] // 2
            return (_grouped(a[:, :half], lo, s[: ng // 2]) +
                    _grouped(a[:, half:], hi, s[ng // 2:]))
        if ng == 1:
            return mm(a, w) * s
        return _grouped(a, w.astype(jnp.bfloat16), s)

    return mm, mm_scaled


def _megakernel(
    # scalars
    pos_ref,          # SMEM [1] int32 — #old cache entries
    # per-layer streamed weights (block = one layer's slab)
    in_norm_ref,      # [1, 1, H]
    wqkv_ref,         # [1, H, Q+2KV]
    q_norm_ref,       # [1, 1, D]
    k_norm_ref,       # [1, 1, D]
    wo_ref,           # [1, Q, H]
    post_norm_ref,    # [1, 1, H]
    w_gate_up_ref,    # [1, H, 2I]
    w_down_ref,       # [1, I, H]
    # per-output-channel f32 scales (ones in bf16 mode)
    sqkv_ref,         # [1, 1, Q+2KV]
    so_ref,           # [1, 1, H]
    sgu_ref,          # [1, 1, 2I]
    sd_ref,           # [1, 1, H]
    # constants (fetched once)
    final_norm_ref,   # [1, H]
    lm_head_ref,      # [H, V] bf16 | int8
    lms_ref,          # [1, V] f32 — LM-head dequant scale (ones for bf16)
    embed_ref,        # [1, H] f32 — input embedding
    cos_ref,          # [1, D//2] f32
    sin_ref,          # [1, D//2] f32
    # HBM cache refs + outputs + scratch — layout depends on kv8; unpacked
    # below (same single-ordered-list discipline as ops/generate_kernel.py)
    *rest,
    cfg: DecoderConfig,
    chunk: int,
    prefetch_chunks: int,
    kv8: bool,
    fuse_head: bool = True,
):
    if kv8:
        (k_hbm, v_hbm, ks_hbm, vs_hbm,
         k_new_ref, v_new_ref, ks_new_ref, vs_new_ref,
         normed_ref, logits_ref,
         x_ref, k_pre, v_pre, ks_pre, vs_pre, pre_sems, spre_sems,
         k_buf, v_buf, ks_buf, vs_buf, sems, ssems) = rest
    else:
        (k_hbm, v_hbm,
         k_new_ref, v_new_ref,
         normed_ref, logits_ref,
         x_ref, k_pre, v_pre, pre_sems,
         k_buf, v_buf, sems) = rest
        ks_hbm = vs_hbm = ks_new_ref = vs_new_ref = None
        ks_pre = vs_pre = spre_sems = ks_buf = vs_buf = ssems = None

    li = pl.program_id(0)
    L = pl.num_programs(0)
    H, Q, KV = cfg.hidden_size, cfg.q_size, cfg.kv_size
    KVH, HQ, D, G = cfg.num_kv_heads, cfg.num_q_heads, cfg.head_dim, cfg.gqa_groups
    C = chunk
    eps = cfg.rms_eps
    scale = 1.0 / (D ** 0.5)

    @pl.when(li == 0)
    def _():
        x_ref[:] = embed_ref[:]

    # Attention-cache chunk DMAs are prefetched ACROSS grid steps: the first
    # `P = prefetch_chunks` chunks of layer l+1 are started at the END of
    # layer l, so their waits never queue behind the ~30 MB weight-slab DMA
    # that the Pallas pipeline issues at the next grid-step boundary (the
    # dominant stall when chunk DMAs are issued in-loop). Layer parity picks
    # the prefetch buffer half; chunks beyond P (long contexts) fall back to
    # a double-buffered in-loop stream.
    n_old = pos_ref[0]
    n_chunks = pl.cdiv(n_old, C)
    P = prefetch_chunks
    par = jax.lax.rem(li, 2)

    def k_pre_dma(layer, parity, ci):
        return pltpu.make_async_copy(
            k_hbm.at[layer, :, pl.ds(ci * C, C), :], k_pre.at[parity, ci],
            pre_sems.at[parity, ci, 0])

    def v_pre_dma(layer, parity, ci):
        return pltpu.make_async_copy(
            v_hbm.at[layer, :, pl.ds(ci * C, C), :], v_pre.at[parity, ci],
            pre_sems.at[parity, ci, 1])

    def ks_pre_dma(layer, parity, ci):
        return pltpu.make_async_copy(
            ks_hbm.at[layer, :, pl.ds(ci * C, C)], ks_pre.at[parity, ci],
            spre_sems.at[parity, ci, 0])

    def vs_pre_dma(layer, parity, ci):
        return pltpu.make_async_copy(
            vs_hbm.at[layer, :, pl.ds(ci * C, C)], vs_pre.at[parity, ci],
            spre_sems.at[parity, ci, 1])

    def k_dma(layer, slot, ci):
        return pltpu.make_async_copy(
            k_hbm.at[layer, :, pl.ds(ci * C, C), :], k_buf.at[slot],
            sems.at[slot, 0])

    def v_dma(layer, slot, ci):
        return pltpu.make_async_copy(
            v_hbm.at[layer, :, pl.ds(ci * C, C), :], v_buf.at[slot],
            sems.at[slot, 1])

    def ks_dma(layer, slot, ci):
        return pltpu.make_async_copy(
            ks_hbm.at[layer, :, pl.ds(ci * C, C)], ks_buf.at[slot],
            ssems.at[slot, 0])

    def vs_dma(layer, slot, ci):
        return pltpu.make_async_copy(
            vs_hbm.at[layer, :, pl.ds(ci * C, C)], vs_buf.at[slot],
            ssems.at[slot, 1])

    def start_prefetch(layer, parity):
        for ci in range(P):
            @pl.when(ci < n_chunks)
            def _():
                k_pre_dma(layer, parity, ci).start()
                v_pre_dma(layer, parity, ci).start()
                if kv8:
                    ks_pre_dma(layer, parity, ci).start()
                    vs_pre_dma(layer, parity, ci).start()

    @pl.when(li == 0)
    def _():
        start_prefetch(0, 0)

    def rms(v, w_row):
        var = jnp.mean(v * v, axis=-1, keepdims=True)
        return v * jax.lax.rsqrt(var + eps) * w_row.astype(jnp.float32)

    x = x_ref[:]                                   # [1, H] f32
    normed = rms(x, in_norm_ref[0])                # [1, H]
    normed_bf = normed.astype(jnp.bfloat16)

    mm, mm_scaled = make_mms()

    I = cfg.intermediate_size
    qkv = mm_scaled(normed_bf, wqkv_ref[0], sqkv_ref[0])  # [1, Q+2KV] f32
    q = qkv[:, :Q].reshape(HQ, D)                  # [16, 128]
    k = qkv[:, Q:Q + KV].reshape(KVH, D)           # [8, 128]
    v = qkv[:, Q + KV:].reshape(KVH, D)

    # Per-head QK-RMSNorm (kernel.cu:364-400)
    q = rms(q, q_norm_ref[0])
    k = rms(k, k_norm_ref[0])

    # Half-split RoPE
    cos = cos_ref[0]                                # [D//2]
    sin = sin_ref[0]
    d2 = D // 2

    def rope(t):
        t1, t2 = t[:, :d2], t[:, d2:]
        return jnp.concatenate(
            [t1 * cos - t2 * sin, t2 * cos + t1 * sin], axis=-1)

    q = rope(q)
    k = rope(k)

    # ── stage this step's K/V column (quantized per head row in kv8 mode,
    # same absmax/127 scheme as ops/generate_kernel.py) ──
    if kv8:
        k_s = jnp.maximum(jnp.max(jnp.abs(k), axis=-1, keepdims=True),
                          1e-8) / 127.0                      # [KVH, 1]
        v_s = jnp.maximum(jnp.max(jnp.abs(v), axis=-1, keepdims=True),
                          1e-8) / 127.0
        k_new_ref[0, :, 0, :] = jnp.clip(
            jnp.round(k / k_s), -127, 127).astype(k_new_ref.dtype)
        v_new_ref[0, :, 0, :] = jnp.clip(
            jnp.round(v / v_s), -127, 127).astype(v_new_ref.dtype)
        ks_new_ref[0] = k_s
        vs_new_ref[0] = v_s
    else:
        k_new_ref[0, :, 0, :] = k.astype(k_new_ref.dtype)
        v_new_ref[0, :, 0, :] = v.astype(v_new_ref.dtype)

    # ── chunked online-softmax attention over the old cache prefix ──
    # (first chunk's DMA was started at the top of the kernel)
    def _accumulate(kh_all, vh_all, ks_c, vs_c, ci, carry):
        """One chunk's online-softmax update from VMEM tiles [KVH, C, D]
        (+ [KVH, C] dequant scales in kv8 mode, applied on the score /
        probability side — G·C multiplies instead of C·D)."""
        m, l, acc = carry
        col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) + ci * C
        valid = col < n_old

        s_rows = []
        for h in range(KVH):
            kh = kh_all[h].astype(jnp.float32)               # [C, D]
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
                # masked scale: beyond-n_old scale entries are zeros from
                # init but could be stale after long runs — and 0 × NaN
                # would poison the accumulation
                vs_safe = jnp.where(valid[0], vs_c[h], 0.0)
                ph = ph * vs_safe[None, :]
            pv_rows.append(jax.lax.dot_general(
                ph, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        acc_new = acc * corr + jnp.concatenate(pv_rows, axis=0)
        return m_new, l_new, acc_new

    m0 = jnp.full((HQ, 1), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((HQ, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((HQ, D), dtype=jnp.float32)
    carry = (m0, l0, acc0)

    # Phase 1: prefetched chunks (static unroll, guarded)
    for ci in range(P):
        @pl.when(ci < n_chunks)
        def _():
            k_pre_dma(li, par, ci).wait()
            v_pre_dma(li, par, ci).wait()
            if kv8:
                ks_pre_dma(li, par, ci).wait()
                vs_pre_dma(li, par, ci).wait()

    def pre_body(ci, carry):
        return _accumulate(k_pre[par, ci], v_pre[par, ci],
                           ks_pre[par, ci] if kv8 else None,
                           vs_pre[par, ci] if kv8 else None, ci, carry)

    carry = jax.lax.fori_loop(0, jnp.minimum(n_chunks, P), pre_body, carry)

    # Phase 2: streaming fallback for long contexts (ci >= P). Emitted only
    # when the cache can actually hold more than P chunks (static check —
    # a concrete out-of-range pl.ds start would fail trace-time validation).
    S_total = k_hbm.shape[2]
    if P * C < S_total:
        @pl.when(n_chunks > P)
        def _():
            k_dma(li, jax.lax.rem(P, 2), P).start()
            v_dma(li, jax.lax.rem(P, 2), P).start()
            if kv8:
                ks_dma(li, jax.lax.rem(P, 2), P).start()
                vs_dma(li, jax.lax.rem(P, 2), P).start()

        def stream_body(ci, carry):
            slot = jax.lax.rem(ci, 2)
            nxt = jax.lax.rem(ci + 1, 2)

            @pl.when(ci + 1 < n_chunks)
            def _():
                k_dma(li, nxt, ci + 1).start()
                v_dma(li, nxt, ci + 1).start()
                if kv8:
                    ks_dma(li, nxt, ci + 1).start()
                    vs_dma(li, nxt, ci + 1).start()

            k_dma(li, slot, ci).wait()
            v_dma(li, slot, ci).wait()
            if kv8:
                ks_dma(li, slot, ci).wait()
                vs_dma(li, slot, ci).wait()
            return _accumulate(k_buf[slot], v_buf[slot],
                               ks_buf[slot] if kv8 else None,
                               vs_buf[slot] if kv8 else None, ci, carry)

        carry = jax.lax.fori_loop(
            P, jnp.maximum(n_chunks, P), stream_body, carry)
    m, l, acc = carry

    # Merge the in-flight token as a virtual final column
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
    attn = (jnp.concatenate(acc_rows, axis=0) / l_f).reshape(1, Q)  # [1, Q] f32

    # O-proj + residual
    x = x + mm_scaled(attn.astype(jnp.bfloat16), wo_ref[0], so_ref[0])

    # Post-norm + SwiGLU MLP + residual (kernel.cu:651-867)
    normed2_bf = rms(x, post_norm_ref[0]).astype(jnp.bfloat16)
    gate_up = mm_scaled(normed2_bf, w_gate_up_ref[0], sgu_ref[0])   # [1, 2I]
    gate, up = gate_up[:, :I], gate_up[:, I:]
    mlp = (gate * jax.lax.logistic(gate)) * up      # SiLU(gate) · up, f32
    x = x + mm_scaled(mlp.astype(jnp.bfloat16), w_down_ref[0], sd_ref[0])
    x_ref[:] = x

    # Cross-step prefetch: start layer li+1's first P cache chunks now,
    # while the pipeline fetches its weight slab.
    @pl.when(li + 1 < L)
    def _():
        start_prefetch(li + 1, jax.lax.rem(li + 1, 2))

    # Final RMSNorm + fused LM head (kernel.cu:1276-1314, 1022-1185).
    # The head rides mm_scaled: bf16 (scale = ones) or int8 with one
    # per-output-channel multiply on the f32 logits. Heads too large for
    # VMEM (text-LM vocab 151936 -> 311 MB) are NOT fused: fuse_head=False
    # makes the caller compute logits as an XLA matvec in the same jit
    # (lm_head_ref/logits_ref are tiny dummies then).
    @pl.when(li == L - 1)
    def _():
        nrm = rms(x, final_norm_ref[0][None, :])     # [1, H] f32
        normed_ref[:] = nrm
        if fuse_head:
            logits_ref[:] = mm_scaled(nrm.astype(jnp.bfloat16),
                                      lm_head_ref[:], lms_ref[:])


def _const_spec(shape):
    """A weight fetched once (same block every grid step)."""
    return pl.BlockSpec(shape, lambda l: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _layer_spec(shape):
    """Per-layer slab: block l of the leading axis, streamed per grid step."""
    return pl.BlockSpec((1,) + shape[1:],
                        lambda l: (l,) + tuple(0 for _ in shape[1:]),
                        memory_space=pltpu.VMEM)


def check_attn_chunk(S: int, C: int) -> None:
    """Cache DMAs are issued in whole chunks: the seq dim must tile exactly,
    and the chunk must respect the 8-sublane tiling (both `max_seq_len` and
    QWEN_TTS_TPU_ATTN_CHUNK are user-settable; an unaligned pair would issue
    out-of-bounds HBM DMAs once the position crosses the last full chunk)."""
    if C % 8 != 0:
        raise ValueError(f"attention chunk ({C}) must be a multiple of 8")
    if S % C != 0:
        raise ValueError(
            f"max_seq_len ({S}) must be a multiple of the attention chunk "
            f"({C}); set QWEN_TTS_TPU_ATTN_CHUNK or pad max_seq_len")


@functools.partial(jax.jit, static_argnames=("cfg", "chunk", "prefetch_chunks",
                                             "interpret", "fuse_head"))
def megakernel_forward(
    cfg: DecoderConfig,
    w: DecoderWeights,
    state: DecodeState,
    embed: jax.Array,        # [H] any float dtype
    chunk: int = ATTN_CHUNK,
    prefetch_chunks: int = PREFETCH_CHUNKS,
    mrope_pos: jax.Array | None = None,   # [3] int32 (M-RoPE)
    interpret: bool = False,              # Pallas interpret mode (CPU tests)
    fuse_head: bool | None = None,        # None: auto by head size
):
    """One fused decode step. Returns (new_state, logits [V] f32, normed [H] f32).

    An int8 KV cache (`init_state(cfg, jnp.int8)`) halves the
    position-proportional cache read traffic; new columns are quantized
    in-kernel (absmax/127 per head row) and landed — with their [L,KVH,1]
    f32 scales — by XLA-side updates after the call (the single-step kernel
    needs no tail ring: every prior position is already in HBM)."""
    L, H, Q, KV = cfg.num_layers, cfg.hidden_size, cfg.q_size, cfg.kv_size
    KVH, D, I, V = cfg.num_kv_heads, cfg.head_dim, cfg.intermediate_size, cfg.vocab_size
    S = cfg.max_seq_len
    C = min(chunk, S)
    check_attn_chunk(S, C)
    kv8 = state.k_cache.dtype == jnp.int8
    if kv8:
        if C % 128 != 0 and not interpret:
            raise ValueError(
                f"int8 KV mode needs the attention chunk ({C}) to be a "
                f"multiple of 128 (scale slices are lane-dim)")
        if state.k_scale is None or state.v_scale is None:
            raise ValueError("int8 KV state must carry k_scale/v_scale "
                             "(build it with init_state(cfg, jnp.int8))")
    pos = state.position

    if cfg.mrope_section is not None and mrope_pos is not None:
        # M-RoPE rows are composed OUTSIDE the kernel (XLA-side, free) —
        # the kernel body is RoPE-scheme-agnostic for single steps.
        from ..models.decoder import mrope_rows

        cos, sin = mrope_rows(cfg, w.rope, mrope_pos, 1)
    else:
        cos = jax.lax.dynamic_slice_in_dim(w.rope.cos, pos, 1, axis=0)  # [1, D//2]
        sin = jax.lax.dynamic_slice_in_dim(w.rope.sin, pos, 1, axis=0)

    P = max(1, min(prefetch_chunks, -(-S // C)))
    # Heads beyond the VMEM comfort budget are computed by XLA after the
    # pallas_call (same jit, one dispatch) instead of being const-fetched.
    if fuse_head is None:
        head_bytes = H * V * jnp.dtype(w.lm_head.dtype).itemsize
        fuse_head = head_bytes <= HEAD_FUSE_LIMIT_MB * 1024 * 1024
    VD = V if fuse_head else 128     # dummy width when the head is outside
    kernel = functools.partial(_megakernel, cfg=cfg, chunk=C,
                               prefetch_chunks=P, kv8=kv8,
                               fuse_head=fuse_head)
    lw = w.layers
    if hasattr(lw, "wqkv_q"):   # int8 / packed-int4 weight-only mode
        wqkv, wo_m, wgu, wd = lw.wqkv_q, lw.wo_q, lw.w_gate_up_q, lw.w_down_q
        sqkv, so_s, sgu, sd = lw.wqkv_s, lw.wo_s, lw.w_gate_up_s, lw.w_down_s
    else:
        wqkv, wo_m, wgu, wd = lw.wqkv, lw.wo, lw.w_gate_up, lw.w_down
        ones = lambda out: jnp.ones((L, 1, out), jnp.float32)
        sqkv, so_s = ones(wqkv.shape[2]), ones(H)
        sgu, sd = ones(wgu.shape[2]), ones(H)
    lms = getattr(w, "lm_head_s", None)   # real head scale (int8 head)
    if fuse_head:
        head_op = w.lm_head
        lms_op = jnp.ones((1, V), jnp.float32) if lms is None else lms
    else:                                 # tiny dummies; head runs in XLA
        head_op = jnp.zeros((H, VD), jnp.bfloat16)
        lms_op = jnp.ones((1, VD), jnp.float32)

    cdt = state.k_cache.dtype
    outs_def = [
        (_layer_spec((L, KVH, 1, D)),
         jax.ShapeDtypeStruct((L, KVH, 1, D), cdt)),           # k_new
        (_layer_spec((L, KVH, 1, D)),
         jax.ShapeDtypeStruct((L, KVH, 1, D), cdt)),           # v_new
    ]
    if kv8:
        outs_def += [
            (_layer_spec((L, KVH, 1)),
             jax.ShapeDtypeStruct((L, KVH, 1), jnp.float32)),  # k scale
            (_layer_spec((L, KVH, 1)),
             jax.ShapeDtypeStruct((L, KVH, 1), jnp.float32)),  # v scale
        ]
    outs_def += [
        (_const_spec((1, H)), jax.ShapeDtypeStruct((1, H), jnp.float32)),
        (_const_spec((1, VD)), jax.ShapeDtypeStruct((1, VD), jnp.float32)),
    ]

    in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),   # position
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
            _const_spec((1, H)),            # final_norm
            _const_spec((H, VD)),           # lm_head (dummy if not fused)
            _const_spec((1, VD)),           # lm_head scale
            _const_spec((1, H)),            # embed
            _const_spec((1, D // 2)),       # cos
            _const_spec((1, D // 2)),       # sin
            pl.BlockSpec(memory_space=pl.ANY),   # k cache
            pl.BlockSpec(memory_space=pl.ANY),   # v cache
        ]
    operands = [
        jnp.asarray(pos, jnp.int32).reshape(1),
        lw.input_norm[:, None, :], wqkv,
        lw.q_norm[:, None, :], lw.k_norm[:, None, :],
        wo_m, lw.post_norm[:, None, :], wgu, wd,
        sqkv, so_s, sgu, sd,
        w.final_norm[None, :], head_op, lms_op,
        embed.astype(jnp.float32)[None, :], cos, sin,
        state.k_cache, state.v_cache,
    ]
    if kv8:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),   # k scales
                     pl.BlockSpec(memory_space=pl.ANY)]   # v scales
        operands += [state.k_scale, state.v_scale]

    scratch_shapes = [
        pltpu.VMEM((1, H), jnp.float32),
        pltpu.VMEM((2, P, KVH, C, D), cdt),
        pltpu.VMEM((2, P, KVH, C, D), cdt),
    ]
    if kv8:
        scratch_shapes += [
            pltpu.VMEM((2, P, KVH, C), jnp.float32),
            pltpu.VMEM((2, P, KVH, C), jnp.float32),
        ]
    scratch_shapes += [pltpu.SemaphoreType.DMA((2, P, 2))]
    if kv8:
        scratch_shapes += [pltpu.SemaphoreType.DMA((2, P, 2))]
    scratch_shapes += [
        pltpu.VMEM((2, KVH, C, D), cdt),
        pltpu.VMEM((2, KVH, C, D), cdt),
    ]
    if kv8:
        scratch_shapes += [
            pltpu.VMEM((2, KVH, C), jnp.float32),
            pltpu.VMEM((2, KVH, C), jnp.float32),
        ]
    scratch_shapes += [pltpu.SemaphoreType.DMA((2, 2))]
    if kv8:
        scratch_shapes += [pltpu.SemaphoreType.DMA((2, 2))]

    outs = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(L,),
        in_specs=in_specs,
        out_specs=tuple(s for s, _ in outs_def),
        out_shape=tuple(sh for _, sh in outs_def),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_MB * 1024 * 1024,
        ),
    )(*operands)

    if kv8:
        k_new, v_new, ks_new, vs_new, normed, logits = outs
    else:
        k_new, v_new, normed, logits = outs
        ks_new = vs_new = None

    if not fuse_head:
        # Large-vocab head: one XLA matvec in the same jit — identical
        # numerics to the fused path (bf16 inputs, f32 accumulation,
        # per-output-channel dequant scale for an int8 head).
        logits = jnp.dot(normed.astype(jnp.bfloat16),
                         w.lm_head.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        if lms is not None:
            logits = logits * lms

    k_cache = jax.lax.dynamic_update_slice(
        state.k_cache, k_new, (0, 0, pos, 0))
    v_cache = jax.lax.dynamic_update_slice(
        state.v_cache, v_new, (0, 0, pos, 0))
    k_scale, v_scale = state.k_scale, state.v_scale
    if kv8:
        k_scale = jax.lax.dynamic_update_slice(k_scale, ks_new, (0, 0, pos))
        v_scale = jax.lax.dynamic_update_slice(v_scale, vs_new, (0, 0, pos))
    new_state = DecodeState(k_cache=k_cache, v_cache=v_cache,
                            position=pos + 1,
                            k_scale=k_scale, v_scale=v_scale)
    return new_state, logits[0], normed[0]


def decode_step_with_embed(cfg: DecoderConfig, w: DecoderWeights,
                           state: DecodeState, embed: jax.Array):
    """Megakernel-backed step_with_embed (reference: model_tts.py:287-330)."""
    state, logits, normed = megakernel_forward(cfg, w, state, embed)
    token = jnp.argmax(logits).astype(jnp.int32)
    return state, token, normed


def decode_step(cfg: DecoderConfig, w: DecoderWeights,
                state: DecodeState, token_id: jax.Array):
    """Megakernel-backed step (reference: model_tts.py:254-285)."""
    return decode_step_with_embed(cfg, w, state, w.embed[token_id])
