"""Numerical parity of the JAX Code2Wav port vs the torch original.

The oracle is the actual `Qwen3OmniMoeCode2Wav` module shipped in
transformers (modeling_qwen3_omni_moe.py:3704-3763), instantiated with a
tiny config and random weights, run on CPU in float32. The converter maps
its state_dict onto our pytree; outputs must agree to float tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen_tts_tpu.vocoder.code2wav import (
    Code2WavConfig,
    chunked_decode,
    code2wav_apply,
    convert_code2wav_state,
    init_code2wav_weights,
)

torch = pytest.importorskip("torch")


TINY = dict(
    codebook_size=32,
    hidden_size=64,
    num_attention_heads=4,
    num_key_value_heads=2,
    sliding_window=5,          # < T so the window actually masks
    intermediate_size=96,
    num_hidden_layers=2,
    num_quantizers=4,
    upsample_rates=(4, 3),
    upsampling_ratios=(2,),
    decoder_dim=32,
)


@pytest.fixture(scope="module")
def torch_model():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeCode2WavConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeCode2Wav,
    )

    tcfg = Qwen3OmniMoeCode2WavConfig(
        max_position_embeddings=256,
        **{k: list(v) if isinstance(v, tuple) else v for k, v in TINY.items()},
    )
    torch.manual_seed(7)
    model = Qwen3OmniMoeCode2Wav(tcfg).eval()
    # Perturb weights that post_init leaves at degenerate values (zeros/ones)
    # so parity is tested at non-trivial parameter values.
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.02 * torch.randn_like(p))
    return model


@pytest.fixture(scope="module")
def jax_setup(torch_model):
    cfg = Code2WavConfig(**TINY)
    w = convert_code2wav_state(torch_model.state_dict(), cfg)
    return cfg, w


def test_output_samples_formula(torch_model, jax_setup):
    cfg, _ = jax_setup
    assert cfg.total_upsample == int(torch_model.total_upsample)
    for t in (1, 2, 7, 13):
        codes = torch.zeros(1, cfg.num_quantizers, t, dtype=torch.long)
        with torch.no_grad():
            wav = torch_model(codes)
        assert wav.shape[-1] == cfg.output_samples(t)


def test_forward_parity(torch_model, jax_setup):
    cfg, w = jax_setup
    rng = np.random.default_rng(0)
    # T = 13 > sliding_window = 5: exercises the window mask.
    codes = rng.integers(0, cfg.codebook_size, size=(2, cfg.num_quantizers, 13))
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(codes)).numpy()[:, 0, :]
    out = np.asarray(code2wav_apply(cfg, w, jnp.asarray(codes, jnp.int32)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_chunked_decode_parity(torch_model, jax_setup):
    cfg, w = jax_setup
    rng = np.random.default_rng(1)
    codes = rng.integers(0, cfg.codebook_size, size=(1, cfg.num_quantizers, 11))
    with torch.no_grad():
        ref = torch_model.chunked_decode(
            torch.from_numpy(codes), chunk_size=4, left_context_size=2
        ).numpy()[:, 0, :]
    out = np.asarray(chunked_decode(
        cfg, w, jnp.asarray(codes, jnp.int32),
        chunk_size=4, left_context_size=2))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_random_init_shapes_match_converter(torch_model, jax_setup):
    cfg, w_conv = jax_setup
    w_rand = init_code2wav_weights(jax.random.PRNGKey(0), cfg)
    conv_shapes = jax.tree.map(lambda x: x.shape, w_conv)
    rand_shapes = jax.tree.map(lambda x: x.shape, w_rand)
    assert conv_shapes == rand_shapes


def test_load_code2wav_plain_torch_keys(tmp_path, torch_model, jax_setup):
    """load_code2wav must accept a safetensors file with the module's OWN
    key names — including the top-level 'decoder.' prefix, which the
    general vocoder prefix-stripper must NOT eat (it is a real Code2Wav
    key, not a wrapper prefix)."""
    from safetensors.numpy import save_file

    from qwen_tts_tpu.vocoder.loader import load_code2wav

    cfg, w_ref = jax_setup
    flat = {k: v.detach().cpu().numpy()
            for k, v in torch_model.state_dict().items()}
    path = tmp_path / "code2wav.safetensors"
    save_file(flat, str(path))

    for p in (str(path), str(tmp_path)):        # file AND directory forms
        w = load_code2wav(p, cfg)
        assert w is not None, f"loader returned None for {p}"
        np.testing.assert_array_equal(
            np.asarray(w.dec_pre.w), np.asarray(w_ref.dec_pre.w))
        np.testing.assert_array_equal(
            np.asarray(w.embed), np.asarray(w_ref.embed))

    # prefixed variant ('speech_tokenizer.') also loads
    pref = {f"speech_tokenizer.{k}": v for k, v in flat.items()}
    path2 = tmp_path / "prefixed.safetensors"
    save_file(pref, str(path2))
    w = load_code2wav(str(path2), cfg)
    assert w is not None
    np.testing.assert_array_equal(
        np.asarray(w.layers[0].wq), np.asarray(w_ref.layers[0].wq))

    # right keys / wrong dims must degrade to None (documented contract),
    # not crash later at jit-trace time
    wrong = dict(flat)
    wrong["code_embedding.weight"] = np.zeros(
        (3, 3), dtype=flat["code_embedding.weight"].dtype)
    path3 = tmp_path / "wrongdims.safetensors"
    save_file(wrong, str(path3))
    assert load_code2wav(str(path3), cfg) is None


def test_packed_parity_vs_torch(torch_model, jax_setup):
    """The packed (matmul-form, NHC) forward must match the torch oracle
    when packed at float32 — structural parity of the phase-matmul
    transposed convs and unfold-matmul causal convs
    (vocoder/code2wav_fast.py)."""
    from qwen_tts_tpu.vocoder.code2wav_fast import (
        code2wav_apply_packed,
        pack_code2wav_weights,
    )

    cfg, w = jax_setup
    rng = np.random.default_rng(2)
    codes = rng.integers(0, cfg.codebook_size, size=(2, cfg.num_quantizers, 13))
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(codes)).numpy()[:, 0, :]
    pw = pack_code2wav_weights(cfg, w, dtype=jnp.float32)
    out = np.asarray(code2wav_apply_packed(cfg, pw, jnp.asarray(codes, jnp.int32)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_packed_bf16_matches_reference_bf16_envelope(jax_setup):
    """bf16 packing (the production path) must introduce no error class
    beyond what the already-shipped bf16 reference path has: both compared
    to the f32 reference, cosines agree closely."""
    from qwen_tts_tpu.vocoder.code2wav_fast import (
        code2wav_apply_packed,
        pack_code2wav_weights,
    )

    cfg, w = jax_setup
    rng = np.random.default_rng(3)
    codes = jnp.asarray(
        rng.integers(0, cfg.codebook_size, size=(1, cfg.num_quantizers, 9)),
        jnp.int32)
    ref = np.asarray(code2wav_apply(cfg, w, codes)).ravel()
    wbf = jax.tree.map(lambda x: x.astype(jnp.bfloat16), w)
    ref_bf = np.asarray(code2wav_apply(cfg, wbf, codes)).astype(np.float32).ravel()
    pw = pack_code2wav_weights(cfg, w)     # bf16 default
    got = np.asarray(code2wav_apply_packed(cfg, pw, codes)).ravel()

    def cos(a, b):
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)

    assert got.shape == ref.shape
    c_ref_bf = cos(ref, ref_bf)
    c_packed = cos(ref, got)
    assert c_packed > 0.99
    # packed bf16 at least as close to f32 truth as reference bf16 (small slack)
    assert c_packed >= c_ref_bf - 0.005


@pytest.mark.slow
def test_output_bounded(jax_setup):
    cfg, _ = jax_setup
    w = init_code2wav_weights(jax.random.PRNGKey(3), cfg)
    codes = jnp.zeros((1, cfg.num_quantizers, 6), jnp.int32)
    wav = code2wav_apply(cfg, w, codes)
    assert wav.shape == (1, cfg.output_samples(6))
    assert np.all(np.abs(np.asarray(wav)) <= 1.0)
