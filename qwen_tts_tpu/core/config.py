"""Model configuration and special-token constants for Qwen3-TTS on TPU.

TPU-native rebuild of the constants in the reference CUDA stack
(reference: qwen_megakernel/model_tts.py:19-53, csrc/kernel.cu:21-76).
One `DecoderConfig` serves both the 28-layer talker and the 5-layer code
predictor — the TPU analog of the reference kernel's runtime `num_layers`
argument (reference: csrc/kernel.cu:1251) is two jit specialisations of the
same code.
"""

from __future__ import annotations

import dataclasses
import os


def env_int(name: str, default: int) -> int:
    """Environment-overridable tuning knob — the TPU analog of the
    reference's `-DLDG_*` compile flags with `_env_int` overrides
    (reference: build_tts.py:17-43, build.py:12-35). All knobs use the
    `QWEN_TTS_TPU_` prefix, e.g. QWEN_TTS_TPU_ATTN_CHUNK=512."""
    try:
        return int(os.environ.get(f"QWEN_TTS_TPU_{name}", default))
    except ValueError:
        return default


# Kernel tuning knobs (read once at import, like the reference's -D flags)
ATTN_CHUNK = env_int("ATTN_CHUNK", 256)          # cache-chunk DMA size
PREFETCH_CHUNKS = env_int("PREFETCH_CHUNKS", 4)  # cross-step prefetched chunks
VMEM_LIMIT_MB = env_int("VMEM_LIMIT_MB", 116)    # Mosaic VMEM budget
# Fuse the LM head into the decode megakernel only while it fits VMEM
# comfortably (talker/CP vocab 3072 -> 6 MB: fused; text-LM vocab 151936
# -> 311 MB: computed as an XLA matvec in the same jit instead).
HEAD_FUSE_LIMIT_MB = env_int("HEAD_FUSE_LIMIT_MB", 32)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Architecture of a Qwen3-style decoder (talker or code predictor)."""

    num_layers: int = 28
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_q_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 128
    vocab_size: int = 3072          # codec vocab (talker); 2048 for CP heads
    max_seq_len: int = 8192
    rope_theta: float = 1e6
    rms_eps: float = 1e-6
    # M-RoPE (Multimodal RoPE): splits the D//2 rotary frequency indices
    # into sections with independent position counters. The real talker
    # config uses [24, 20, 20] — the reference kernel implements only
    # standard RoPE, which is why its EOS never fires and it needs a
    # word-count frame cap (reference: README.md:204-208). None = standard
    # RoPE. When set, decode paths accept an `mrope_pos [3]` of per-section
    # positions; equal components reproduce standard RoPE bit-exactly.
    mrope_section: tuple[int, ...] | None = None
    # Frequency-index → section layout. False = chunked [TT..HH..WW]
    # (Qwen2.5-Omni style: section s owns a contiguous run of sec[s]
    # indices). True = interleaved [THW THW .. TT] (Qwen3-Omni style,
    # transformers modeling_qwen3_omni_moe.py apply_interleaved_mrope:
    # index j belongs to section s∈{1,2} iff j % 3 == s and
    # j < 3*sec[s], else to section 0 — preserving frequency continuity).
    mrope_interleaved: bool = False

    @property
    def q_size(self) -> int:
        return self.num_q_heads * self.head_dim      # 2048

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim     # 1024

    @property
    def gqa_groups(self) -> int:
        return self.num_q_heads // self.num_kv_heads


# ── Canonical model configs ──────────────────────────────────────────────────

TALKER_CONFIG = DecoderConfig()

CODE_PREDICTOR_CONFIG = DecoderConfig(
    num_layers=5,
    vocab_size=2048,
    max_seq_len=64,
)


@dataclasses.dataclass(frozen=True)
class TextProjectionConfig:
    """Text embedding + projection MLP (reference: model_tts.py:348-374)."""

    text_vocab_size: int = 151936
    text_hidden_size: int = 2048
    hidden_size: int = 1024


@dataclasses.dataclass(frozen=True)
class TTSModelConfig:
    """Full Qwen3-TTS-12Hz-0.6B-Base model family bundle."""

    talker: DecoderConfig = TALKER_CONFIG
    code_predictor: DecoderConfig = CODE_PREDICTOR_CONFIG
    text_projection: TextProjectionConfig = TextProjectionConfig()
    num_code_groups: int = 16       # 1 talker codebook + 15 predicted
    frame_rate_hz: float = 12.5
    sample_rate: int = 24000


# ── Special token IDs (reference: model_tts.py:36-49) ───────────────────────

CODEC_BOS = 2149
CODEC_EOS = 2150
CODEC_PAD = 2148

CODEC_NOTHINK = 2155
CODEC_THINK_BOS = 2156
CODEC_THINK_EOS = 2157

TTS_BOS = 151672
TTS_EOS = 151673
TTS_PAD = 151671

NUM_CODE_GROUPS = 16
CODE_PREDICTOR_LAYERS = 5
CODE_PREDICTOR_VOCAB = 2048


def tiny_test_config(max_seq_len: int = 64) -> TTSModelConfig:
    """A scaled-down config for CPU tests (keeps head_dim=128 lane alignment)."""
    talker = DecoderConfig(
        num_layers=2,
        hidden_size=256,
        intermediate_size=512,
        num_q_heads=4,
        num_kv_heads=2,
        head_dim=128,
        vocab_size=3072,
        max_seq_len=max_seq_len,
    )
    cp = DecoderConfig(
        num_layers=2,
        hidden_size=256,
        intermediate_size=512,
        num_q_heads=4,
        num_kv_heads=2,
        head_dim=128,
        vocab_size=2048,
        max_seq_len=64,
    )
    tp = TextProjectionConfig(
        text_vocab_size=512,
        text_hidden_size=512,
        hidden_size=256,
    )
    return TTSModelConfig(talker=talker, code_predictor=cp, text_projection=tp)
