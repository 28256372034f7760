"""Vocoder weight persistence + checkpoint conversion.

The reference gets its vocoder from the external `qwen-tts` package
(reference: tts_engine.py:158-209) whose model code is not part of the
reference repo; `vocoder/model.py` here is an ORIGINAL TPU-native codec
decoder with the same I/O contract (16-group codes @12.5 Hz → 24 kHz PCM),
not a port of the closed `Qwen3TTSTokenizerV2Model` architecture.

Loading therefore supports two sources:
  1. this framework's own flat-key safetensors (exact key-set match), and
  2. `convert_vocoder_state` — a documented best-effort mapper for
     externally-converted checkpoints: keys are normalized by stripping
     known prefixes (`speech_tokenizer.`, `model.`, `decoder.`), matched
     exactly first, then by unique shape. Conversion only succeeds when
     every template leaf resolves unambiguously; anything else returns
     None and the engine degrades to random-init or silence, mirroring the
     reference's vocoder-unavailable mode (tts_engine.py:204-209).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .model import VocoderConfig, VocoderWeights, init_vocoder_weights

_STRIP_PREFIXES = ("speech_tokenizer.", "model.", "decoder.")


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


def _rebuild(template, flat: dict[str, np.ndarray]):
    def rec(tree, prefix=""):
        if isinstance(tree, tuple) and not hasattr(tree, "_fields"):
            return tuple(rec(v, f"{prefix}{i}.") for i, v in enumerate(tree))
        if hasattr(tree, "_fields"):
            return type(tree)(*(
                rec(getattr(tree, n), f"{prefix}{n}.") for n in tree._fields))
        return jnp.asarray(flat[prefix[:-1]], dtype=np.asarray(tree).dtype)

    return rec(template)


def save_vocoder(path: str, w: VocoderWeights):
    from safetensors.numpy import save_file

    save_file(_flatten(w), path)


def _normalize_keys(
    state: dict[str, np.ndarray],
) -> dict[str, np.ndarray] | None:
    """Strip at most ONE wrapper prefix per key (cumulative stripping would
    collapse 'model.decoder.x' and 'x' onto one name). Returns None when two
    distinct source keys normalize to the same name — letting the dict
    silently overwrite would drop a tensor and send its leaf into the
    shape-match fallback, which could bind a wrong tensor."""
    out = {}
    for k, v in state.items():
        for p in _STRIP_PREFIXES:
            if k.startswith(p):
                k = k[len(p):]
                break
        if k in out:
            return None
        out[k] = v
    return out


def convert_vocoder_state(
    state: dict[str, np.ndarray], cfg: VocoderConfig,
) -> VocoderWeights | None:
    """Best-effort mapping of an external flat state dict onto the vocoder
    pytree. Strategy, in order, per template leaf:

    1. exact key match after prefix normalization;
    2. unique-shape match among unclaimed tensors (safe because conversion
       aborts to None on ANY ambiguity — two unclaimed tensors of the same
       shape — rather than guessing).

    Returns None unless every leaf resolves.
    """
    template = init_vocoder_weights(jax.random.PRNGKey(0), cfg)
    ref = _flatten(template)
    src = _normalize_keys(state)
    if src is None:
        return None

    resolved: dict[str, np.ndarray] = {}
    unclaimed = dict(src)
    missing = []
    for key, proto in ref.items():
        if key in unclaimed:
            if unclaimed[key].shape != proto.shape:
                return None
            resolved[key] = unclaimed.pop(key)
        else:
            missing.append(key)
    for key in missing:
        proto = ref[key]
        candidates = [k for k, v in unclaimed.items() if v.shape == proto.shape]
        if len(candidates) != 1:
            return None
        resolved[key] = unclaimed.pop(candidates[0])
    return _rebuild(template, resolved)


def load_vocoder(path: str, cfg: VocoderConfig) -> VocoderWeights | None:
    """Load from `<path>` (file) or `<path>/vocoder.safetensors`.

    Tries the native format first, then `convert_vocoder_state`. Returns
    None on any failure (the engine then degrades, never raises)."""
    if os.path.isdir(path):
        path = os.path.join(path, "vocoder.safetensors")
    if not os.path.exists(path):
        return None
    try:
        from safetensors.numpy import load_file

        flat = load_file(path)
        template = init_vocoder_weights(jax.random.PRNGKey(0), cfg)
        ref = _flatten(template)
        if set(ref) == set(flat):
            if any(flat[k].shape != ref[k].shape for k in ref):
                return None
            return _rebuild(template, flat)
        return convert_vocoder_state(flat, cfg)
    except Exception:
        return None


def load_code2wav(path: str, cfg):
    """Load Code2Wav weights from a safetensors file holding the torch
    module's state_dict key names (modeling_qwen3_omni_moe.py:3704-3736),
    optionally prefixed (`speech_tokenizer.`, `model.`, `code2wav.`).

    Accepts `<path>` as a file or a directory containing
    `code2wav.safetensors`. Returns None on any failure — the engine then
    degrades to random-init/silence like the reference's vocoder-unavailable
    mode (reference: tts_engine.py:204-209)."""
    from .code2wav import convert_code2wav_state

    if os.path.isdir(path):
        path = os.path.join(path, "code2wav.safetensors")
    if not path or not os.path.exists(path):
        return None
    try:
        from safetensors.numpy import load_file

        flat = load_file(path)
        normalized = {}
        for k, v in flat.items():
            # NOT _STRIP_PREFIXES: 'decoder.' is a REAL top-level Code2Wav
            # key prefix (decoder.0.conv.weight, ...) — stripping it would
            # break every plain torch checkpoint
            for p in ("speech_tokenizer.", "model.", "code2wav."):
                if k.startswith(p):
                    k = k[len(p):]
            if k in normalized:
                # two distinct source keys collapsed to one name (e.g. a
                # checkpoint holding both 'model.decoder.0.conv.weight' and
                # 'decoder.0.conv.weight') — a same-shape wrong tensor would
                # silently win and pass the eval_shape check below; degrade
                # to None like every other malformed-checkpoint case
                return None
            normalized[k] = v
        w = convert_code2wav_state(normalized, cfg)
        # shape-validate against the config (eval_shape: no allocation) —
        # a right-keys/wrong-dims checkpoint must degrade to None per the
        # documented contract, not crash later at jit-trace time
        from .code2wav import init_code2wav_weights

        import jax

        spec = jax.eval_shape(
            lambda: init_code2wav_weights(jax.random.PRNGKey(0), cfg))
        ok = jax.tree.all(jax.tree.map(
            lambda a, b: a.shape == b.shape, w, spec))
        return w if ok else None
    except Exception:
        return None
