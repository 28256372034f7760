"""Weight pytrees for Qwen3-TTS on TPU.

TPU-native redesign of the reference's raw-device-pointer weight packing
(reference: qwen_megakernel/model_tts.py:56-193). Instead of a blob of 11
pointers per layer, weights are JAX pytrees with the per-layer tensors
*stacked on a leading layer axis* so that `lax.scan` can loop over layers and
Pallas BlockSpec index maps can stream one layer's slab from HBM per grid
step. Projection matrices are stored transposed relative to torch
(`[in_features, out_features]`) so the hot path is a plain `x @ W`.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import (
    DecoderConfig,
    TTSModelConfig,
    TextProjectionConfig,
    NUM_CODE_GROUPS,
)


class LayerWeights(NamedTuple):
    """Per-layer decoder weights, stacked on a leading `[num_layers, ...]` axis.

    Carries the same 11 logical tensors as the reference `LDGLayerWeights`
    struct (reference: csrc/kernel.cu:78-90), transposed for `x @ W` and with
    the Q/K/V and gate/up projections CONCATENATED on the output axis — one
    `[H, Q+2KV]` and one `[H, 2I]` matmul per layer instead of five, so the
    megakernel streams fewer, larger weight slabs per grid step.
    """

    input_norm: jax.Array   # [L, H]
    wqkv: jax.Array         # [L, H, Q + 2*KV]  (q | k | v)
    q_norm: jax.Array       # [L, D]
    k_norm: jax.Array       # [L, D]
    wo: jax.Array           # [L, Q, H]
    post_norm: jax.Array    # [L, H]
    w_gate_up: jax.Array    # [L, H, 2*I]       (gate | up)
    w_down: jax.Array       # [L, I, H]


class RopeTable(NamedTuple):
    """Precomputed RoPE tables, f32 `[max_seq, head_dim//2]`.

    The reference stores bf16 `[max_seq, head_dim]` duplicated halves
    (reference: model_tts.py:89-96); we keep the non-duplicated f32 half for
    precision and recombine in the kernel.
    """

    cos: jax.Array
    sin: jax.Array


class DecoderWeights(NamedTuple):
    """Everything one decoder (talker or code predictor) needs per step."""

    layers: LayerWeights
    final_norm: jax.Array   # [H]
    embed: jax.Array        # [V, H] codec embedding (zeros for CP)
    lm_head: jax.Array      # [H, V] untied codec head (zeros for CP)
    rope: RopeTable


class CodePredictorWeights(NamedTuple):
    """5-layer code predictor plus its 15 per-group heads/embeddings
    (reference: model_tts.py:129-146)."""

    decoder: DecoderWeights
    lm_heads: jax.Array       # [15, H, 2048]
    codec_embeds: jax.Array   # [15, 2048, H]


class TextProjectionWeights(NamedTuple):
    """Text embedding + 2-layer SiLU projection (reference: model_tts.py:122-126)."""

    text_embedding: jax.Array  # [151936, 2048]
    fc1_w: jax.Array           # [2048, 2048] (transposed: in, out)
    fc1_b: jax.Array           # [2048]
    fc2_w: jax.Array           # [2048, 1024]
    fc2_b: jax.Array           # [1024]


class TTSWeights(NamedTuple):
    talker: DecoderWeights
    code_predictor: CodePredictorWeights
    text_projection: TextProjectionWeights


def load_speaker_encoder(model_path: str) -> dict[str, np.ndarray]:
    """Speaker-encoder tensors (`speaker_encoder.*`).

    Parity note: the reference loads these onto the GPU but never uses them —
    voice cloning is unimplemented there too (reference: model_tts.py:148-151,
    README.md:210). Here they are opt-in so HBM isn't wasted by default."""
    if os.path.isdir(model_path):
        st_path = os.path.join(model_path, "model.safetensors")
    else:
        from huggingface_hub import hf_hub_download

        st_path = hf_hub_download(model_path, "model.safetensors")
    state = _np_state(st_path)
    return {k: v for k, v in state.items() if k.startswith("speaker_encoder.")}


# ── RoPE tables ──────────────────────────────────────────────────────────────


MROPE_HEADROOM = 1024


def make_rope_table(cfg: DecoderConfig) -> RopeTable:
    """f32 cos/sin tables `[rows, head_dim//2]` (reference: model_tts.py:89-96).

    With `mrope_section` set, section positions run AHEAD of the cache
    position (e.g. the text index exceeds the frame index), so the table
    gets `MROPE_HEADROOM` extra rows — indexing past `max_seq_len` must hit
    real rows, not clamped/garbage ones."""
    d = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float32) / d)
    )
    rows = cfg.max_seq_len
    if cfg.mrope_section is not None:
        rows += MROPE_HEADROOM
    positions = np.arange(rows, dtype=np.float32)
    freqs = np.outer(positions, inv_freq)  # [rows, d/2]
    return RopeTable(
        cos=jnp.asarray(np.cos(freqs), dtype=jnp.float32),
        sin=jnp.asarray(np.sin(freqs), dtype=jnp.float32),
    )


# ── Random initialisation (tests / benchmarks without checkpoint access) ────


def init_decoder_weights(
    key: jax.Array,
    cfg: DecoderConfig,
    dtype=jnp.bfloat16,
    with_heads: bool = True,
) -> DecoderWeights:
    """Random decoder weights with roughly realistic scales."""
    h, q, kv, i, d = cfg.hidden_size, cfg.q_size, cfg.kv_size, cfg.intermediate_size, cfg.head_dim
    L, v = cfg.num_layers, cfg.vocab_size
    ks = jax.random.split(key, 10)

    def mat(k, shape, fan_in):
        return (jax.random.normal(k, shape, dtype=jnp.float32) / np.sqrt(fan_in)).astype(dtype)

    layers = LayerWeights(
        input_norm=jnp.ones((L, h), dtype=dtype),
        wqkv=mat(ks[0], (L, h, q + 2 * kv), h),
        q_norm=jnp.ones((L, d), dtype=dtype),
        k_norm=jnp.ones((L, d), dtype=dtype),
        wo=mat(ks[3], (L, q, h), q),
        post_norm=jnp.ones((L, h), dtype=dtype),
        w_gate_up=mat(ks[4], (L, h, 2 * i), h),
        w_down=mat(ks[6], (L, i, h), i),
    )
    if with_heads:
        embed = mat(ks[7], (v, h), h)
        lm_head = mat(ks[8], (h, v), h)
    else:
        embed = jnp.zeros((v, h), dtype=dtype)
        lm_head = jnp.zeros((h, v), dtype=dtype)
    return DecoderWeights(
        layers=layers,
        final_norm=jnp.ones((h,), dtype=dtype),
        embed=embed,
        lm_head=lm_head,
        rope=make_rope_table(cfg),
    )


def init_tts_weights(key: jax.Array, cfg: TTSModelConfig, dtype=jnp.bfloat16) -> TTSWeights:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    talker = init_decoder_weights(k1, cfg.talker, dtype=dtype)
    cp_dec = init_decoder_weights(k2, cfg.code_predictor, dtype=dtype, with_heads=False)
    h = cfg.code_predictor.hidden_size
    cpv = cfg.code_predictor.vocab_size
    ng = cfg.num_code_groups - 1
    cp = CodePredictorWeights(
        decoder=cp_dec,
        lm_heads=(jax.random.normal(k3, (ng, h, cpv), dtype=jnp.float32) / np.sqrt(h)).astype(dtype),
        codec_embeds=(jax.random.normal(k4, (ng, cpv, h), dtype=jnp.float32) / np.sqrt(h)).astype(dtype),
    )
    tp_cfg = cfg.text_projection
    kt1, kt2, kt3 = jax.random.split(k5, 3)
    tp = TextProjectionWeights(
        text_embedding=(jax.random.normal(kt1, (tp_cfg.text_vocab_size, tp_cfg.text_hidden_size), dtype=jnp.float32)
                        * 0.02).astype(dtype),
        fc1_w=(jax.random.normal(kt2, (tp_cfg.text_hidden_size, tp_cfg.text_hidden_size), dtype=jnp.float32)
               / np.sqrt(tp_cfg.text_hidden_size)).astype(dtype),
        fc1_b=jnp.zeros((tp_cfg.text_hidden_size,), dtype=dtype),
        fc2_w=(jax.random.normal(kt3, (tp_cfg.text_hidden_size, tp_cfg.hidden_size), dtype=jnp.float32)
               / np.sqrt(tp_cfg.text_hidden_size)).astype(dtype),
        fc2_b=jnp.zeros((tp_cfg.hidden_size,), dtype=dtype),
    )
    return TTSWeights(talker=talker, code_predictor=cp, text_projection=tp)


# ── Checkpoint loading (safetensors → pytree) ────────────────────────────────

_LAYER_KEYS = (
    ("input_norm", "input_layernorm.weight", False),
    ("q_norm", "self_attn.q_norm.weight", False),
    ("k_norm", "self_attn.k_norm.weight", False),
    ("wo", "self_attn.o_proj.weight", True),
    ("post_norm", "post_attention_layernorm.weight", False),
    ("w_down", "mlp.down_proj.weight", True),
)


def _stack_layers(state: dict[str, np.ndarray], prefix: str, num_layers: int,
                  dtype) -> LayerWeights:
    """Stack per-layer torch-layout tensors into `[L, ...]`, transposing
    matrices and fusing q|k|v and gate|up on the output axis."""
    out: dict[str, jax.Array] = {}
    for field, suffix, transpose in _LAYER_KEYS:
        per_layer = []
        for i in range(num_layers):
            t = state[f"{prefix}{i}.{suffix}"]
            per_layer.append(t.T if transpose else t)
        out[field] = jnp.asarray(np.stack(per_layer), dtype=dtype)
    out["wqkv"] = jnp.asarray(np.stack([
        np.concatenate([
            state[f"{prefix}{i}.self_attn.q_proj.weight"].T,
            state[f"{prefix}{i}.self_attn.k_proj.weight"].T,
            state[f"{prefix}{i}.self_attn.v_proj.weight"].T,
        ], axis=1) for i in range(num_layers)]), dtype=dtype)
    out["w_gate_up"] = jnp.asarray(np.stack([
        np.concatenate([
            state[f"{prefix}{i}.mlp.gate_proj.weight"].T,
            state[f"{prefix}{i}.mlp.up_proj.weight"].T,
        ], axis=1) for i in range(num_layers)]), dtype=dtype)
    return LayerWeights(**out)


def _np_state(path: str) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    state: dict[str, np.ndarray] = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            state[k] = f.get_tensor(k)
    return state


def load_tts_weights(model_path: str, cfg: TTSModelConfig | None = None,
                     dtype=jnp.bfloat16, verbose: bool = True) -> TTSWeights:
    """Load Qwen3-TTS weights from a local safetensors checkpoint.

    Name mapping mirrors the reference loader (reference: model_tts.py:56-179):
    talker layers under `talker.model.layers.*`, untied `talker.codec_head`,
    code predictor under `talker.code_predictor.*`, text projection under
    `talker.text_projection.*`.
    """
    cfg = cfg or TTSModelConfig()
    if os.path.isdir(model_path):
        st_path = os.path.join(model_path, "model.safetensors")
    else:
        from huggingface_hub import hf_hub_download

        st_path = hf_hub_download(model_path, "model.safetensors")
    if verbose:
        print(f"Loading TTS weights from {st_path}...")
    state = _np_state(st_path)

    tcfg = cfg.talker
    talker_layers = _stack_layers(state, "talker.model.layers.", tcfg.num_layers, dtype)
    talker = DecoderWeights(
        layers=talker_layers,
        final_norm=jnp.asarray(state["talker.model.norm.weight"], dtype=dtype),
        embed=jnp.asarray(state["talker.model.codec_embedding.weight"], dtype=dtype),
        lm_head=jnp.asarray(state["talker.codec_head.weight"].T, dtype=dtype),
        rope=make_rope_table(tcfg),
    )

    ccfg = cfg.code_predictor
    cp_layers = _stack_layers(state, "talker.code_predictor.model.layers.", ccfg.num_layers, dtype)
    h = ccfg.hidden_size
    cp_dec = DecoderWeights(
        layers=cp_layers,
        final_norm=jnp.asarray(state["talker.code_predictor.model.norm.weight"], dtype=dtype),
        embed=jnp.zeros((ccfg.vocab_size, h), dtype=dtype),
        lm_head=jnp.zeros((h, ccfg.vocab_size), dtype=dtype),
        rope=make_rope_table(ccfg),
    )
    ng = cfg.num_code_groups - 1
    lm_heads = np.stack([
        state[f"talker.code_predictor.lm_head.{g}.weight"].T for g in range(ng)
    ])
    codec_embeds = np.stack([
        state[f"talker.code_predictor.model.codec_embedding.{g}.weight"] for g in range(ng)
    ])
    cp = CodePredictorWeights(
        decoder=cp_dec,
        lm_heads=jnp.asarray(lm_heads, dtype=dtype),
        codec_embeds=jnp.asarray(codec_embeds, dtype=dtype),
    )

    tp = TextProjectionWeights(
        text_embedding=jnp.asarray(state["talker.model.text_embedding.weight"], dtype=dtype),
        fc1_w=jnp.asarray(state["talker.text_projection.linear_fc1.weight"].T, dtype=dtype),
        fc1_b=jnp.asarray(state["talker.text_projection.linear_fc1.bias"], dtype=dtype),
        fc2_w=jnp.asarray(state["talker.text_projection.linear_fc2.weight"].T, dtype=dtype),
        fc2_b=jnp.asarray(state["talker.text_projection.linear_fc2.bias"], dtype=dtype),
    )

    if verbose:
        n_params = sum(int(np.prod(v.shape)) for v in state.values()) / 1e6
        print(f"Loaded {len(state)} tensors ({n_params:.1f}M params)")
    return TTSWeights(talker=talker, code_predictor=cp, text_projection=tp)


def num_params(tree: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


# ── int8 weight-only quantization (TPU-native extension) ────────────────────


class QuantLayerWeights(NamedTuple):
    """Per-output-channel symmetric int8 weights + f32 scales.

    Weight-only: kernels cast int8→bf16 in VMEM (cheap VPU op fully
    overlapped with the halved HBM DMA) and multiply the f32 scale into the
    matmul OUTPUT, so numerics stay bf16×bf16→f32 everywhere else."""

    input_norm: jax.Array   # [L, H] bf16
    q_norm: jax.Array       # [L, D] bf16
    k_norm: jax.Array       # [L, D] bf16
    post_norm: jax.Array    # [L, H] bf16
    wqkv_q: jax.Array       # [L, H, Q+2KV] int8
    wqkv_s: jax.Array       # [L, 1, Q+2KV] f32
    wo_q: jax.Array         # [L, Q, H] int8
    wo_s: jax.Array         # [L, 1, H] f32
    w_gate_up_q: jax.Array  # [L, H, 2I] int8
    w_gate_up_s: jax.Array  # [L, 1, 2I] f32
    w_down_q: jax.Array     # [L, I, H] int8
    w_down_s: jax.Array     # [L, 1, H] f32


class QuantDecoderWeights(NamedTuple):
    layers: QuantLayerWeights
    final_norm: jax.Array
    embed: jax.Array        # bf16 (gathered rows only)
    lm_head: jax.Array      # bf16 [H, V], or int8 when lm_head_s is set
    rope: "RopeTable"
    # int8 LM head (per-output-channel scales): halves the ~6 MB/step head
    # read — the head is inside the reference's kernel too
    # (reference: csrc/kernel.cu:1022-1185). None = bf16 head.
    lm_head_s: jax.Array | None = None   # [1, V] f32


def _quant_mat(w: jax.Array, group_size: int | None = None):
    """[L, in, out] bf16 → (int8 [L, in, out], f32 scale).

    `group_size=None`: per-output-channel scales [L, 1, out] (one scale over
    the whole contraction). `group_size=G`: group-wise scales [L, in/G, out]
    along the contraction axis — slightly better fidelity at identical weight
    bytes (the kernel's `mm_scaled` handles both shapes)."""
    if group_size is None:
        wf = w.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)   # [L, 1, out]
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)
    L, n_in, n_out = w.shape
    if n_in % group_size:
        raise ValueError(f"in dim {n_in} not divisible by group {group_size}")
    ng = n_in // group_size
    wf = w.astype(jnp.float32).reshape(L, ng, group_size, n_out)
    absmax = jnp.max(jnp.abs(wf), axis=2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127)
    return (q.reshape(L, n_in, n_out).astype(jnp.int8),
            scale[:, :, 0, :].astype(jnp.float32))


def quantize_lm_head(lm_head: jax.Array):
    """[H, V] bf16 → (int8 [H, V], f32 [1, V]) per-output-channel."""
    q, s = _quant_mat(lm_head[None], None)
    return q[0], s[0]


def quantize_decoder_weights(
    w: DecoderWeights, group_size: int | None = None,
    quant_head: bool = True,
) -> QuantDecoderWeights:
    """bf16 DecoderWeights → int8 weight-only quantized form."""
    lw = w.layers
    wqkv_q, wqkv_s = _quant_mat(lw.wqkv, group_size)
    wo_q, wo_s = _quant_mat(lw.wo, group_size)
    wgu_q, wgu_s = _quant_mat(lw.w_gate_up, group_size)
    wd_q, wd_s = _quant_mat(lw.w_down, group_size)
    head, head_s = (quantize_lm_head(w.lm_head) if quant_head
                    else (w.lm_head, None))
    return QuantDecoderWeights(
        layers=QuantLayerWeights(
            input_norm=lw.input_norm, q_norm=lw.q_norm, k_norm=lw.k_norm,
            post_norm=lw.post_norm,
            wqkv_q=wqkv_q, wqkv_s=wqkv_s, wo_q=wo_q, wo_s=wo_s,
            w_gate_up_q=wgu_q, w_gate_up_s=wgu_s,
            w_down_q=wd_q, w_down_s=wd_s),
        final_norm=w.final_norm, embed=w.embed, lm_head=head,
        rope=w.rope, lm_head_s=head_s)


def dequantize_layer_weights(q: QuantLayerWeights) -> LayerWeights:
    """Reference dequantization (tests / oracle comparison); handles both
    per-channel ([L,1,out]) and group-wise ([L,ng,out]) scales."""
    return LayerWeights(
        input_norm=q.input_norm, q_norm=q.q_norm, k_norm=q.k_norm,
        post_norm=q.post_norm,
        wqkv=_dq_l_int8(q.wqkv_q, q.wqkv_s), wo=_dq_l_int8(q.wo_q, q.wo_s),
        w_gate_up=_dq_l_int8(q.w_gate_up_q, q.w_gate_up_s),
        w_down=_dq_l_int8(q.w_down_q, q.w_down_s))


def _dq_l_int8(qm: jax.Array, s: jax.Array) -> jax.Array:
    """[L, in, out] int8 + [L, ng, out] f32 → bf16 [L, in, out]."""
    L, n_in, n_out = qm.shape
    ng = s.shape[1]
    if ng == 1:
        return (qm.astype(jnp.float32) * s).astype(jnp.bfloat16)
    wf = qm.astype(jnp.float32).reshape(L, ng, n_in // ng, n_out)
    return (wf * s[:, :, None, :]).reshape(L, n_in, n_out).astype(jnp.bfloat16)


# ── int4 group-wise weight-only quantization ─────────────────────────────────
#
# Group-wise along the contraction (input) axis: every `group_size` input
# rows of each output column share one f32 scale (GPTQ-style layout), so
# scales have shape [L, in/group_size, out] — with only 15 int4 levels,
# per-output-channel scaling over 1024+ inputs is too coarse.
#
# Storage is MANUALLY nibble-packed into int8 (the native `jnp.int4` dtype
# triggers an infinite device_put recursion in this image's TPU plugin):
# packed byte row r holds original input rows r (low nibble) and
# r + in/2 (high nibble), i.e. the two HALVES of the contraction axis are
# interleaved bytewise. The halves layout means kernels unpack with two
# static slices of the activation (`a[:, :in/2]`, `a[:, in/2:]`) instead of
# a strided deinterleave. HBM traffic is half of int8's.

INT4_GROUP = 128


class Quant4LayerWeights(NamedTuple):
    """Group-wise symmetric int4 weights, nibble-packed into int8
    [L, in/2, out] (halves layout), + f32 scales [L, in/G, out]."""

    input_norm: jax.Array   # [L, H] bf16
    q_norm: jax.Array       # [L, D] bf16
    k_norm: jax.Array       # [L, D] bf16
    post_norm: jax.Array    # [L, H] bf16
    wqkv_q: jax.Array       # [L, H/2, Q+2KV] int8 (packed int4×2)
    wqkv_s: jax.Array       # [L, H/G, Q+2KV] f32
    wo_q: jax.Array         # [L, Q/2, H] int8 (packed)
    wo_s: jax.Array         # [L, Q/G, H] f32
    w_gate_up_q: jax.Array  # [L, H/2, 2I] int8 (packed)
    w_gate_up_s: jax.Array  # [L, H/G, 2I] f32
    w_down_q: jax.Array     # [L, I/2, H] int8 (packed)
    w_down_s: jax.Array     # [L, I/G, H] f32


class Quant4DecoderWeights(NamedTuple):
    layers: Quant4LayerWeights
    final_norm: jax.Array
    embed: jax.Array        # bf16 (gathered rows only)
    lm_head: jax.Array      # bf16 [H, V], or int8 when lm_head_s is set
    rope: "RopeTable"
    # int8 head (the head stays int8 even in int4 mode: argmax ties are
    # sensitive and the head is read once per step, not per layer)
    lm_head_s: jax.Array | None = None   # [1, V] f32


def pack_int4(q: jax.Array) -> jax.Array:
    """int values in [-8,7], [L, in, out] → packed int8 [L, in/2, out].

    Byte row r = (q[r] & 0xF) | (q[r + in/2] << 4)."""
    L, n_in, n_out = q.shape
    qi = q.astype(jnp.int32)
    lo = qi[:, : n_in // 2, :] & 0xF
    hi = qi[:, n_in // 2:, :] & 0xF
    return (lo | (hi << 4)).astype(jnp.uint8).view(jnp.int8)


def unpack_int4(p: jax.Array) -> tuple[jax.Array, jax.Array]:
    """packed int8 [..., in/2, out] → (lo, hi) sign-extended int32 halves.

    Same integer arithmetic the kernels use: the signed int8 widens with
    sign extension, so `>> 4` recovers the high nibble directly and the
    `^8 - 8` trick sign-extends the low one."""
    w32 = p.astype(jnp.int32)
    lo = ((w32 & 0xF) ^ 8) - 8
    hi = w32 >> 4
    return lo, hi


def _quant_mat_int4(w: jax.Array, group_size: int = INT4_GROUP):
    """[L, in, out] bf16 → (packed int8 [L, in/2, out], f32 [L, in/G, out])."""
    L, n_in, n_out = w.shape
    if n_in % group_size or n_in % 2:
        raise ValueError(f"in dim {n_in} not divisible by group {group_size}")
    ng = n_in // group_size
    # The halves-packed layout splits the scale rows into lo/hi groups
    # (kernels take s[:ng//2] / s[ng//2:]): each half must hold a whole
    # number of groups, or the split lands mid-group and silently
    # mis-scales (and ng == 1 would divide by zero in the grouped matvec).
    if ng % 2:
        raise ValueError(
            f"group {group_size} gives {ng} group(s) over in dim {n_in}; "
            f"the int4 halves packing needs an even group count "
            f"(group_size <= {n_in // 2} and (in/2) % group == 0)")
    wf = w.astype(jnp.float32).reshape(L, ng, group_size, n_out)
    absmax = jnp.max(jnp.abs(wf), axis=2, keepdims=True)   # [L, ng, 1, out]
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).reshape(L, n_in, n_out)
    return pack_int4(q), scale[:, :, 0, :].astype(jnp.float32)


def quantize_decoder_weights_int4(
    w: DecoderWeights, group_size: int = INT4_GROUP,
    quant_head: bool = True,
) -> Quant4DecoderWeights:
    """bf16 DecoderWeights → int4 group-wise weight-only quantized form."""
    lw = w.layers
    wqkv_q, wqkv_s = _quant_mat_int4(lw.wqkv, group_size)
    wo_q, wo_s = _quant_mat_int4(lw.wo, group_size)
    wgu_q, wgu_s = _quant_mat_int4(lw.w_gate_up, group_size)
    wd_q, wd_s = _quant_mat_int4(lw.w_down, group_size)
    head, head_s = (quantize_lm_head(w.lm_head) if quant_head
                    else (w.lm_head, None))
    return Quant4DecoderWeights(
        layers=Quant4LayerWeights(
            input_norm=lw.input_norm, q_norm=lw.q_norm, k_norm=lw.k_norm,
            post_norm=lw.post_norm,
            wqkv_q=wqkv_q, wqkv_s=wqkv_s, wo_q=wo_q, wo_s=wo_s,
            w_gate_up_q=wgu_q, w_gate_up_s=wgu_s,
            w_down_q=wd_q, w_down_s=wd_s),
        final_norm=w.final_norm, embed=w.embed, lm_head=head,
        rope=w.rope, lm_head_s=head_s)


def dequant_mat_slice(qm: jax.Array, s: jax.Array) -> jax.Array:
    """ONE layer's int8 weight [in, out] + scales [ng, out] → bf16 [in, out].

    The per-layer form of `dequantize_layer_weights`, shaped for use inside
    a `lax.scan` body: the quant-aware T>1 prefill streams one layer's int8
    slab from HBM and dequantizes on the fly, so quantize mode needs NO
    resident bf16 weight copy (reference keeps a single weight copy total,
    model_tts.py:56-179)."""
    n_in, n_out = qm.shape
    ng = s.shape[0]
    if ng == 1:
        return (qm.astype(jnp.float32) * s).astype(jnp.bfloat16)
    wf = qm.astype(jnp.float32).reshape(ng, n_in // ng, n_out)
    return (wf * s[:, None, :]).reshape(n_in, n_out).astype(jnp.bfloat16)


def dequant_mat_slice_int4(qm: jax.Array, s: jax.Array) -> jax.Array:
    """ONE layer's nibble-packed int4 weight [in/2, out] + group scales
    [ng, out] → bf16 [in, out] (halves layout, see pack_int4)."""
    n_half, n_out = qm.shape
    n_in = n_half * 2
    ng = s.shape[0]
    lo, hi = unpack_int4(qm)
    wf = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    wf = wf.reshape(ng, n_in // ng, n_out) * s[:, None, :]
    return wf.reshape(n_in, n_out).astype(jnp.bfloat16)


def _dq_l_int4(qm: jax.Array, s: jax.Array) -> jax.Array:
    """[L, in/2, out] packed int4 + [L, ng, out] f32 → bf16 [L, in, out]."""
    L, n_half, n_out = qm.shape
    n_in = n_half * 2
    ng = s.shape[1]
    lo, hi = unpack_int4(qm)
    wf = jnp.concatenate([lo, hi], axis=1).astype(jnp.float32)
    wf = wf.reshape(L, ng, n_in // ng, n_out) * s[:, :, None, :]
    return wf.reshape(L, n_in, n_out).astype(jnp.bfloat16)


def dequantize_layer_weights_int4(q: Quant4LayerWeights) -> LayerWeights:
    """Reference dequantization (tests / oracle comparison)."""
    return LayerWeights(
        input_norm=q.input_norm, q_norm=q.q_norm, k_norm=q.k_norm,
        post_norm=q.post_norm,
        wqkv=_dq_l_int4(q.wqkv_q, q.wqkv_s), wo=_dq_l_int4(q.wo_q, q.wo_s),
        w_gate_up=_dq_l_int4(q.w_gate_up_q, q.w_gate_up_s),
        w_down=_dq_l_int4(q.w_down_q, q.w_down_s))


# ── mixed-precision weight-only quantization (int8 attention + int4 MLP) ─────
#
# The MLP matrices (w_gate_up + w_down) are 60% of the layer weight bytes
# (H·2I + I·H = 9.44M params/layer vs attention's H·(Q+2KV) + Q·H = 6.29M at
# the talker shape), but the quality-critical path — attention scores and
# the K/V columns persisted in the cache — runs through the attention
# matrices. Quantizing ONLY the MLP to int4-g128 and keeping attention at
# per-channel int8 gives ~72% of int8's weight bytes with hidden-state
# fidelity strictly between the pure tiers (cos ~0.94 vs int8's ~0.999 and
# int4's ~0.83 on random weights — benchmarks/exp_mixed_numerics.py), and
# it is FASTER than all-int4 on hardware (2034.5 vs 1942 tok/s @1024):
# int8 attention skips the nibble-unpack VPU work on the critical path, so
# mixed is exactly bytes-proportional to int8 (1466/0.72) while all-int4
# is unpack-bound below its bandwidth prediction. Gates:
# validate_kernel.py --backend megagen-mixed; CPU parity:
# tests/test_megakernel.py.
#
# No new container or kernel code: `mm_scaled` (ops/decode_step.py:76)
# dispatches per-MATRIX by shape (packed int4 when w rows == in/2, int8
# per-channel when the scale has one group row), and the quant-aware prefill
# (models/decoder.py) picks the dequant form per matrix the same way. The
# mixed form therefore reuses Quant4DecoderWeights with int8-shaped
# attention fields: wqkv_q [L,H,Q+2KV] int8 + wqkv_s [L,1,Q+2KV], ditto wo;
# w_gate_up/w_down stay nibble-packed [L,in/2,out] + [L,in/G,out] scales.


def quantize_decoder_weights_mixed(
    w: DecoderWeights, group_size: int = INT4_GROUP,
    quant_head: bool = True,
) -> Quant4DecoderWeights:
    """bf16 DecoderWeights → int8-attention + int4-g128-MLP mixed form."""
    lw = w.layers
    wqkv_q, wqkv_s = _quant_mat(lw.wqkv)          # int8 per-channel
    wo_q, wo_s = _quant_mat(lw.wo)                # int8 per-channel
    wgu_q, wgu_s = _quant_mat_int4(lw.w_gate_up, group_size)
    wd_q, wd_s = _quant_mat_int4(lw.w_down, group_size)
    head, head_s = (quantize_lm_head(w.lm_head) if quant_head
                    else (w.lm_head, None))
    return Quant4DecoderWeights(
        layers=Quant4LayerWeights(
            input_norm=lw.input_norm, q_norm=lw.q_norm, k_norm=lw.k_norm,
            post_norm=lw.post_norm,
            wqkv_q=wqkv_q, wqkv_s=wqkv_s, wo_q=wo_q, wo_s=wo_s,
            w_gate_up_q=wgu_q, w_gate_up_s=wgu_s,
            w_down_q=wd_q, w_down_s=wd_s),
        final_norm=w.final_norm, embed=w.embed, lm_head=head,
        rope=w.rope, lm_head_s=head_s)


def dequantize_layer_weights_mixed(q: Quant4LayerWeights) -> LayerWeights:
    """Reference dequantization of the mixed form (tests / oracle)."""
    return LayerWeights(
        input_norm=q.input_norm, q_norm=q.q_norm, k_norm=q.k_norm,
        post_norm=q.post_norm,
        wqkv=_dq_l_int8(q.wqkv_q, q.wqkv_s), wo=_dq_l_int8(q.wo_q, q.wo_s),
        w_gate_up=_dq_l_int4(q.w_gate_up_q, q.w_gate_up_s),
        w_down=_dq_l_int4(q.w_down_q, q.w_down_s))
