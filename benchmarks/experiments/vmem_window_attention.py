#!/usr/bin/env python3
# Experiment record: attention window as blocked VMEM input (no manual DMA)
# measured 1.276 ms/step (784 tok/s) at S=256 vs 1.46 with manual chunk DMAs,
# which motivated the cross-grid-step chunk prefetch in ops/decode_step.py.
"""Hypothesis test: does removing manual DMA (cache as blocked input) restore
grid pipelining? S=256 so the whole per-layer cache window fits VMEM."""
import time, functools, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from qwen_tts_tpu.core.config import DecoderConfig
from qwen_tts_tpu.core.weights import init_decoder_weights
from qwen_tts_tpu.models.decoder import init_state

cfg = DecoderConfig(max_seq_len=256)
L, H, Q, KV = cfg.num_layers, cfg.hidden_size, cfg.q_size, cfg.kv_size
KVH, HQ, D, G = cfg.num_kv_heads, cfg.num_q_heads, cfg.head_dim, cfg.gqa_groups
I, V, S = cfg.intermediate_size, cfg.vocab_size, cfg.max_seq_len
w = init_decoder_weights(jax.random.PRNGKey(0), cfg)

def kern(pos_ref, innorm, wqkv, qn, kn, wo, pnorm, wgu, wd, fnorm, lmh, emb,
         cos, sin, kc, vc, knew, vnew, normed, logits, x_ref):
    li = pl.program_id(0)
    @pl.when(li == 0)
    def _(): x_ref[:] = emb[:]
    def rms(v, wr):
        var = jnp.mean(v*v, -1, keepdims=True)
        return v*jax.lax.rsqrt(var+1e-6)*wr.astype(jnp.float32)
    def mm(a, ww):
        return jax.lax.dot_general(a, ww, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    x = x_ref[:]
    nb = rms(x, innorm[0]).astype(jnp.bfloat16)
    qkv = mm(nb, wqkv[0])
    q = qkv[:, :Q].reshape(HQ, D); k = qkv[:, Q:Q+KV].reshape(KVH, D); v = qkv[:, Q+KV:].reshape(KVH, D)
    q = rms(q, qn[0]); k = rms(k, kn[0])
    c, s = cos[0], sin[0]
    rope = lambda t: jnp.concatenate([t[:,:64]*c - t[:,64:]*s, t[:,64:]*c + t[:,:64]*s], -1)
    q = rope(q); k = rope(k)
    knew[0,:,0,:] = k.astype(knew.dtype); vnew[0,:,0,:] = v.astype(vnew.dtype)
    n_old = pos_ref[0]
    scale = 1.0/(D**0.5)
    # dense attention over the whole VMEM window [KVH, S, D]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    valid = col < n_old
    srs = []
    for h in range(KVH):
        kh = kc[0, h].astype(jnp.float32)  # [S, D]
        srs.append(jax.lax.dot_general(q[h*G:(h+1)*G], kh, (((1,),(1,)),((),())), preferred_element_type=jnp.float32)*scale)
    sa = jnp.where(valid, jnp.concatenate(srs,0), -jnp.inf)   # [HQ, S]
    sn = jnp.concatenate([jnp.sum(q[h*G:(h+1)*G]*k[h:h+1], -1, keepdims=True) for h in range(KVH)],0)*scale
    m = jnp.maximum(jnp.max(sa,1,keepdims=True), sn)
    p = jnp.exp(sa - m); pn_ = jnp.exp(sn - m)
    l = jnp.sum(p,1,keepdims=True) + pn_
    pvs = []
    for h in range(KVH):
        vh = vc[0, h].astype(jnp.float32)
        pvs.append(jax.lax.dot_general(p[h*G:(h+1)*G], vh, (((1,),(0,)),((),())), preferred_element_type=jnp.float32) + pn_[h*G:(h+1)*G]*v[h:h+1])
    attn = (jnp.concatenate(pvs,0)/l).reshape(1, Q)
    x = x + mm(attn.astype(jnp.bfloat16), wo[0])
    nb2 = rms(x, pnorm[0]).astype(jnp.bfloat16)
    gu = mm(nb2, wgu[0]); g, u = gu[:, :I], gu[:, I:]
    x = x + mm(((g*jax.lax.logistic(g))*u).astype(jnp.bfloat16), wd[0])
    x_ref[:] = x
    @pl.when(li == pl.num_programs(0)-1)
    def _():
        nr = rms(x, fnorm[0])
        normed[:] = nr
        logits[:] = mm(nr.astype(jnp.bfloat16), lmh[:])

def lsp(shape): return pl.BlockSpec((1,)+shape[1:], lambda l:(l,)+(0,)*(len(shape)-1), memory_space=pltpu.VMEM)
def csp(shape): return pl.BlockSpec(shape, lambda l:(0,)*len(shape), memory_space=pltpu.VMEM)

lw = w.layers
call = pl.pallas_call(
    kern, grid=(L,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              lsp((L,1,H)), lsp(lw.wqkv.shape), lsp((L,1,D)), lsp((L,1,D)),
              lsp(lw.wo.shape), lsp((L,1,H)), lsp(lw.w_gate_up.shape), lsp(lw.w_down.shape),
              csp((1,H)), csp((H,V)), csp((1,H)), csp((1,64)), csp((1,64)),
              lsp((L,KVH,S,D)), lsp((L,KVH,S,D))],
    out_specs=(lsp((L,KVH,1,D)), lsp((L,KVH,1,D)), csp((1,H)), csp((1,V))),
    out_shape=(jax.ShapeDtypeStruct((L,KVH,1,D), jnp.bfloat16),
               jax.ShapeDtypeStruct((L,KVH,1,D), jnp.bfloat16),
               jax.ShapeDtypeStruct((1,H), jnp.float32),
               jax.ShapeDtypeStruct((1,V), jnp.float32)),
    scratch_shapes=[pltpu.VMEM((1,H), jnp.float32)],
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=116*1024*1024),
)

@functools.partial(jax.jit, static_argnames=('n',), donate_argnames=('state',))
def gen(w, state, tok, n):
    lw = w.layers
    def body(c, _):
        state, tok = c
        pos = state.position
        cos = jax.lax.dynamic_slice_in_dim(w.rope.cos, pos, 1, 0)
        sin = jax.lax.dynamic_slice_in_dim(w.rope.sin, pos, 1, 0)
        knew, vnew, normed, logits = call(
            jnp.asarray(pos, jnp.int32).reshape(1),
            lw.input_norm[:,None,:], lw.wqkv, lw.q_norm[:,None,:], lw.k_norm[:,None,:],
            lw.wo, lw.post_norm[:,None,:], lw.w_gate_up, lw.w_down,
            w.final_norm[None,:], w.lm_head, w.embed[tok].astype(jnp.float32)[None,:],
            cos, sin, state.k_cache, state.v_cache)
        kc = jax.lax.dynamic_update_slice(state.k_cache, knew, (0,0,pos,0))
        vc = jax.lax.dynamic_update_slice(state.v_cache, vnew, (0,0,pos,0))
        nt = jnp.argmax(logits[0]).astype(jnp.int32)
        return (type(state)(k_cache=kc, v_cache=vc, position=pos+1), nt), nt
    (state, _), toks = jax.lax.scan(body, (state, tok), None, length=n)
    return state, toks

def run(n=200):
    st = init_state(cfg)
    st, toks = gen(w, st, jnp.int32(2149), n)
    return np.asarray(toks)
run(); run()
t0=time.perf_counter(); run(); dt=(time.perf_counter()-t0-0.026)/200
print(f'vmem-window attention: {dt*1000:.3f} ms/step ({1/dt:.0f} tok/s) [RTT-corrected]')
