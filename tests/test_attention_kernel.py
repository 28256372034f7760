"""Pallas decode-attention kernel vs dense masked attention (oracle).

Runs in Pallas interpret mode on CPU — the testability the reference's CUDA
kernel never had (reference tests all require real hardware, SURVEY.md §4).

The kernel attends over `position` old cache entries of layer `li` plus the
in-flight token's K/V (merged as a virtual final column).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dense_reference(q, k_new, v_new, k_cache, v_cache, li, position):
    """Attend over cache[li][:position] + the new column, f32."""
    HQ, D = q.shape
    KVH, S = k_cache.shape[1], k_cache.shape[2]
    g = HQ // KVH
    scale = 1.0 / np.sqrt(D)
    k_full = jnp.concatenate(
        [k_cache[li].astype(jnp.float32), k_new[:, None, :]], axis=1)  # [KVH,S+1,D]
    v_full = jnp.concatenate(
        [v_cache[li].astype(jnp.float32), v_new[:, None, :]], axis=1)
    qh = q.reshape(KVH, g, D).astype(jnp.float32)
    scores = jnp.einsum("hgd,hsd->hgs", qh, k_full) * scale
    ids = jnp.arange(S + 1)
    mask = (ids < position) | (ids == S)          # old prefix + new column
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hgs,hsd->hgd", probs, v_full)
    return out.reshape(HQ, D)


def _run_kernel(q, k_new, v_new, k_cache, v_cache, li, pos, chunk):
    from qwen_tts_tpu.ops import attention as A

    KVH, S, D = k_cache.shape[1], k_cache.shape[2], k_cache.shape[3]
    HQ = q.shape[0]
    C = min(chunk, S)
    kernel = functools.partial(
        A._decode_attn_kernel, chunk=C, kv_heads=KVH, gqa=HQ // KVH,
        scale=1.0 / np.sqrt(D))
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((HQ, D), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, KVH, C, D), k_cache.dtype),
            pltpu.VMEM((2, KVH, C, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=True,
    )
    idx = jnp.asarray([pos, li], dtype=jnp.int32)
    return call(idx, q, k_new, v_new, k_cache, v_cache)


@pytest.mark.parametrize("position,chunk", [
    (0, 64),      # empty cache: only the in-flight token
    (1, 64),      # single old entry
    (64, 64),     # exactly one full chunk
    (65, 64),     # one full + one single-entry chunk
    (200, 64),    # several chunks + partial tail
    (256, 64),    # cache completely full
])
def test_kernel_matches_dense(position, chunk):
    HQ, KVH, L, S, D = 16, 8, 3, 256, 128
    li = 1
    ks = jax.random.split(jax.random.PRNGKey(position), 5)
    q = jax.random.normal(ks[0], (HQ, D), dtype=jnp.float32)
    k_new = jax.random.normal(ks[1], (KVH, D), dtype=jnp.float32)
    v_new = jax.random.normal(ks[2], (KVH, D), dtype=jnp.float32)
    k_cache = jax.random.normal(ks[3], (L, KVH, S, D)).astype(jnp.bfloat16)
    v_cache = jax.random.normal(ks[4], (L, KVH, S, D)).astype(jnp.bfloat16)
    # poison invalid region and other layers to catch leaks past the mask
    k_cache = k_cache.at[:, :, position:].set(99.0)
    v_cache = v_cache.at[:, :, position:].set(99.0)
    k_cache = k_cache.at[0].set(-77.0)
    k_cache = k_cache.at[2].set(77.0)

    got = np.asarray(_run_kernel(q, k_new, v_new, k_cache, v_cache, li, position, chunk))
    want = np.asarray(_dense_reference(q, k_new, v_new, k_cache, v_cache, li, position))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    assert np.isfinite(got).all()


def test_kernel_gqa_groups_differ():
    """Different Q heads sharing a KV head must still produce distinct outputs."""
    HQ, KVH, L, S, D = 4, 2, 1, 64, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (HQ, D), dtype=jnp.float32)
    k_new = jax.random.normal(ks[1], (KVH, D), dtype=jnp.float32)
    v_new = jax.random.normal(ks[2], (KVH, D), dtype=jnp.float32)
    k_cache = jax.random.normal(ks[3], (L, KVH, S, D)).astype(jnp.bfloat16)
    v_cache = jax.random.normal(ks[4], (L, KVH, S, D)).astype(jnp.bfloat16)
    out = np.asarray(_run_kernel(q, k_new, v_new, k_cache, v_cache, 0, 33, 64))
    want = np.asarray(_dense_reference(q, k_new, v_new, k_cache, v_cache, 0, 33))
    np.testing.assert_allclose(out, want, rtol=2e-3, atol=2e-3)
    assert not np.allclose(out[0], out[1])
