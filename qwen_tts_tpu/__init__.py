"""qwen_tts_tpu — TPU-native Qwen3-TTS streaming inference framework.

A from-scratch JAX/Pallas rebuild of the capabilities of
`jayanth-kumar-morem/qwen-megakernel-tts` (single-GPU CUDA megakernel TTS
stack), designed TPU-first: fused single-dispatch decode steps, `lax.scan`
decode loops with on-device token feedback, Pallas kernels for the hot path,
and `jax.sharding` meshes for multi-chip scaling.
"""

__version__ = "0.1.0"

from .core.config import (  # noqa: F401
    CODEC_BOS,
    CODEC_EOS,
    CODEC_PAD,
    CODE_PREDICTOR_CONFIG,
    DecoderConfig,
    TALKER_CONFIG,
    TTSModelConfig,
    tiny_test_config,
)
