"""Vocoder weight persistence (flat-key safetensors of the pytree).

The real Qwen3-TTS speech-tokenizer checkpoint format lives in the external
`qwen-tts` package (reference: tts_engine.py:158-209); this loader handles
this framework's own serialized format plus a best-effort mapping hook for
converted checkpoints. Missing/unloadable weights → the engine degrades to
silence, mirroring the reference (tts_engine.py:204-209).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .model import VocoderConfig, VocoderWeights, init_vocoder_weights


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, (list, tuple)) and not hasattr(tree, "_fields"):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    elif hasattr(tree, "_fields"):
        for name in tree._fields:
            out.update(_flatten(getattr(tree, name), f"{prefix}{name}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_vocoder(path: str, w: VocoderWeights):
    from safetensors.numpy import save_file

    save_file(_flatten(w), path)


def load_vocoder(path: str, cfg: VocoderConfig) -> VocoderWeights | None:
    """Load from `<path>` (file) or `<path>/vocoder.safetensors`. None on failure."""
    if os.path.isdir(path):
        path = os.path.join(path, "vocoder.safetensors")
    if not os.path.exists(path):
        return None
    try:
        from safetensors.numpy import load_file

        flat = load_file(path)
        template = init_vocoder_weights(jax.random.PRNGKey(0), cfg)
        ref = _flatten(template)
        if set(ref) != set(flat):
            return None

        def rebuild(tree, prefix=""):
            if isinstance(tree, tuple) and not hasattr(tree, "_fields"):
                return tuple(rebuild(v, f"{prefix}{i}.") for i, v in enumerate(tree))
            if hasattr(tree, "_fields"):
                return type(tree)(*(
                    rebuild(getattr(tree, n), f"{prefix}{n}.") for n in tree._fields))
            return jnp.asarray(flat[prefix[:-1]])

        return rebuild(template)
    except Exception:
        return None
