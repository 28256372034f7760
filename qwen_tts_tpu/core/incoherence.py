"""Incoherence processing: fold random orthogonal rotations into the
weights so group-wise low-bit quantization sees gaussian-like matrices.

`exp_weight_stats` (round 4) established WHY int4-g128 fails on realistic
weight statistics: heavy tails and outlier channels inflate each g=128
group's absmax scale, pushing the quantization logit perturbation from
1.9σ (gaussian) to 2.8-8.9σ. QuaRot/QuIP-style incoherence processing
attacks exactly that mechanism: multiplying a weight matrix by a random
orthogonal Q mixes every heavy-tailed entry into sums of ~H random-sign
terms (CLT → gaussian), at ZERO inference cost when Q is folded offline
into adjacent parameters. This module implements the two exact folds
available in this architecture (the transformed model is mathematically
identical to the original, up to bf16 re-rounding):

1. **Residual-stream rotation** `Q` (randomized Hadamard, [H, H]):
   RMSNorm with γ=1 commutes with any orthogonal Q (the norm is
   rotation-invariant), so after folding each norm's γ into the matrix it
   feeds, the whole residual basis can be rotated:

     embed      → embed @ Q                  (inputs enter rotated)
     wqkv       → Qᵀ @ (diag(γ_in) wqkv)     (reads the rotated stream)
     wo         → wo @ Q                     (writes the rotated stream)
     w_gate_up  → Qᵀ @ (diag(γ_post) w_gate_up)
     w_down     → w_down @ Q
     lm_head    → Qᵀ @ (diag(γ_final) lm_head)
     all folded norm weights → 1

   Logits are bit-for-bit the same function of the token sequence (up to
   float rounding). The rope/q_norm/k_norm live in HEAD space and are
   untouched.

2. **V/O head-space rotation** `R` ([D, D], shared across heads): the
   value path has no rope and no norm between wqkv's V output and wo's
   input, so each head's V columns can be rotated by R and wo's
   corresponding input rows by Rᵀ (GQA: every q head in a KV group shares
   that group's V, so one shared R keeps the fold exact):

     wqkv[:, :, v_h] → wqkv[:, :, v_h] @ R      per KV head h
     wo[:, q_g, :]   → Rᵀ @ wo[:, q_g, :]       per Q head g

   This gaussianizes wo's input (contraction) axis — the axis int4's
   group scales live on — which fold 1 cannot reach.

Together the folds cover the group axes of wqkv, w_gate_up, and wo; only
w_down's input (intermediate) axis keeps its original per-channel
structure (rotating it would need an online Hadamard between the SwiGLU
elementwise product and w_down — QuaRot's R4 — which is NOT free; its
entry distribution still gaussianizes via the output-axis mixing of
fold 1). Measured results: benchmarks/exp_weight_stats.py --incoherent.

Reference for the quality-gate policy this feeds:
/root/reference/validate_kernel.py:413-435.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .weights import DecoderWeights, LayerWeights


def random_orthogonal(key: jax.Array, n: int) -> np.ndarray:
    """Randomized-Hadamard orthogonal matrix Q = H_n·D/√n (n a power of
    two), else a QR-based random orthogonal. float32, numpy."""
    rng = np.random.default_rng(
        np.asarray(jax.random.key_data(key), np.uint32).tolist())
    if n & (n - 1) == 0:
        h = np.array([[1.0]], np.float32)
        while h.shape[0] < n:
            h = np.block([[h, h], [h, -h]])
        d = rng.choice([-1.0, 1.0], size=n).astype(np.float32)
        return (h * d[None, :]) / np.sqrt(np.float32(n))
    q, r = np.linalg.qr(rng.standard_normal((n, n)).astype(np.float64))
    return (q * np.sign(np.diag(r))[None, :]).astype(np.float32)


def _fold_in(q: np.ndarray, gamma: jax.Array, w: jax.Array) -> jax.Array:
    """[L, H, out] → Qᵀ @ (diag(γ_l) @ W_l) per layer, f32 accumulate."""
    g = gamma.astype(jnp.float32)                    # [L, H]
    wf = w.astype(jnp.float32) * g[:, :, None]
    # out[l,j,o] = Σ_i Q[i,j]·(γW)[l,i,o] = (Qᵀ diag(γ) W)[j,o]
    out = jnp.einsum("ij,lio->ljo", jnp.asarray(q), wf)
    return out.astype(w.dtype)


def _fold_out(w: jax.Array, q: np.ndarray) -> jax.Array:
    """[L, in, H] → W_l @ Q per layer."""
    out = jnp.einsum("lio,oj->lij", w.astype(jnp.float32), jnp.asarray(q))
    return out.astype(w.dtype)


def incoherent_decoder_weights(
    w: DecoderWeights, key: jax.Array, cfg,
    rotate_vo: bool = True,
) -> DecoderWeights:
    """Return functionally-identical weights with the incoherence folds
    applied (module docstring). `cfg` supplies head geometry for the V/O
    fold. All norm γ folded → returned norm weights are ones."""
    kq, kr = jax.random.split(key)
    H = w.embed.shape[-1]
    Q = random_orthogonal(kq, H)
    lw = w.layers

    wqkv = lw.wqkv
    wo = lw.wo
    if rotate_vo:
        D = cfg.head_dim
        nq, nkv = cfg.num_q_heads, cfg.num_kv_heads
        R = random_orthogonal(kr, D)
        qd = nq * D
        v0 = qd + nkv * D                    # fused layout: [q | k | v]
        wqkv_f = wqkv.astype(jnp.float32)
        v = wqkv_f[:, :, v0:].reshape(wqkv.shape[0], H, nkv, D)
        v = jnp.einsum("lhnd,de->lhne", v, jnp.asarray(R))
        wqkv = jnp.concatenate(
            [wqkv_f[:, :, :v0], v.reshape(wqkv.shape[0], H, nkv * D)],
            axis=-1).astype(lw.wqkv.dtype)
        wo_f = wo.astype(jnp.float32).reshape(wo.shape[0], nq, D, H)
        wo_f = jnp.einsum("ed,lndh->lneh", jnp.asarray(R.T), wo_f)
        wo = wo_f.reshape(wo.shape[0], nq * D, H).astype(lw.wo.dtype)

    ones_h = jnp.ones_like(lw.input_norm)
    new_layers = LayerWeights(
        input_norm=ones_h,
        wqkv=_fold_in(Q, lw.input_norm, wqkv),
        q_norm=lw.q_norm, k_norm=lw.k_norm,
        wo=_fold_out(wo, Q),
        post_norm=jnp.ones_like(lw.post_norm),
        w_gate_up=_fold_in(Q, lw.post_norm, lw.w_gate_up),
        w_down=_fold_out(lw.w_down, Q),
    )
    embed = (w.embed.astype(jnp.float32)
             @ jnp.asarray(Q)).astype(w.embed.dtype)
    head = _fold_in(Q, w.final_norm[None], w.lm_head[None])[0]
    return w._replace(layers=new_layers, embed=embed,
                      final_norm=jnp.ones_like(w.final_norm),
                      lm_head=head)
