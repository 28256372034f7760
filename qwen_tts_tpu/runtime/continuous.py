"""Continuous batching: dynamic request admission into fixed batch slots.

A TPU-first production-serving extension (the reference is strictly
batch-1 — SURVEY.md §2.3, reference model_tts.py:236 — and the repo's
`synthesize_batch` is static: all B utterances must arrive together and
the batch runs until the LAST one finishes). Real serving traffic is
staggered; with static batching a slot that finishes early idles until
the batch drains. Here the batch is a set of B persistent SLOTS over the
vmapped frame path (`runtime/batch.py`):

- every chunk dispatch decodes `chunk_frames` frames AND their audio for
  ALL slots in one jitted call (vmapped `frames_chunk` + vocoder, fused —
  the same closed signature every time; per-slot host vocoder calls would
  pay up to B extra round trips per chunk),
- the dispatch loop runs DEPTH-2: chunk k+1 is enqueued before chunk k's
  results are read back, so the host round trip and per-request emit are
  hidden under device compute (the batched analog of the single-stream
  engine's speculative streaming pipeline — docs/04),
- a request joins at any chunk boundary: ONE fixed-shape jitted admission
  dispatch (text projection + conditioning prefix + prefill + CODEC_BOS
  step from a `text_bucket`-padded id buffer — the same in-dispatch
  construction as the engine's fused TTFC path) plus a donated
  `dynamic_update_index_in_dim` insert of its rows (KV cache, token,
  hidden, trailing text, rng) into a free slot,
- the dispatch right after an admission uses a SMALL chunk
  (`admit_chunk_frames`, default 2) so the fresh request's first audio is
  a couple frames of compute away instead of a full steady chunk — the
  batched analog of the engine's first-chunk-at-1-frame semantics
  (reference: tts_engine.py:233-235),
- a request leaves the moment its EOS lands (or its frame cap is hit);
  the slot is immediately re-admissible while the other slots keep
  streaming.

XLA sees a fixed, warmed signature set (B=1 prefill, slot insert, chunk
fns for the two chunk sizes — ×2 ctx shapes for code2wav) regardless of
traffic, so there is never a mid-serving compile — the same
closed-signature contract the single-stream engine keeps
(docs/07-operations.md).

Static shapes make the classic continuous-batching hazards explicit:
a parked (idle) slot still rides through the vmapped dispatch, its
position advancing chunk by chunk toward `max_seq_len`; slots are
re-parked with a fresh zero state before the cache index could reach the
ring boundary (`_maybe_repark`).

Per-request audio decode reuses the engine's bucketed vocoder path
(`_decode_to_audio`), so the jitted vocoder also never sees a new shape.
"""

from __future__ import annotations

import asyncio
from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import AsyncGenerator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import init_state
from .batch import batched_frames


@partial(jax.jit, donate_argnums=(0,))
def _insert_slot(batch, one, slot: jax.Array):
    """Write one utterance's rows into slot `slot` of each batch tensor.

    `batch` and `one` are matching pytrees whose leaves carry a leading
    batch axis (B for `batch`, 1 for `one`). Donated: the KV cache is the
    dominant buffer and admission must not copy it."""
    return jax.tree.map(
        lambda b, s: jax.lax.dynamic_update_index_in_dim(
            b, s[0].astype(b.dtype), slot, 0),
        batch, one)


@dataclass
class _Request:
    text: str
    cap: int
    queue: asyncio.Queue = field(default_factory=asyncio.Queue)
    emitted: int = 0
    cancelled: bool = False
    # first chunk-dispatch sequence number that contains this request's
    # state — results from earlier (speculative) dispatches of the same
    # slot belong to its previous occupant and must be dropped
    first_seq: int = 0


class ContinuousBatcher:
    """Schedules staggered TTS requests onto B persistent batch slots.

    Usage (any number of concurrent callers)::

        batcher = ContinuousBatcher(engine, slots=4)
        async for audio, sr in batcher.submit(text):
            ...

    The dispatch loop starts lazily with the first request and parks when
    the last one drains. `chunk_frames` is the scheduling quantum: a new
    request waits at most one in-flight chunk before its prefill, and its
    first audio arrives after its first chunk of frames.
    """

    def __init__(self, engine, slots: int = 4,
                 chunk_frames: Optional[int] = None,
                 text_bucket: Optional[int] = None,
                 admit_chunk_frames: Optional[int] = 2):
        engine.initialize()
        self.eng = engine
        self.slots = slots
        self.chunk = chunk_frames or engine.config.chunk_frames
        # fast-admission quantum: the dispatch right after an admission is
        # this many frames instead of a full chunk, so a fresh request's
        # first audio waits ~n_small frames of compute, not a whole chunk —
        # the batched analog of the engine's first-chunk-at-1-frame
        # (reference: tts_engine.py:233-235). Exactly one extra closed
        # signature. 0/None disables.
        small = admit_chunk_frames or 0
        self.small = small if 0 < small < self.chunk else 0
        self.text_bucket = text_bucket or engine.config.trailing_bucket
        cfg = engine.model_config.talker
        self._cfg = cfg
        self._cp_cfg = engine.model_config.code_predictor
        B, H = slots, cfg.hidden_size

        one = init_state(cfg, engine._kv_dtype)
        self._state = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), one)
        self._tok = jnp.zeros((B,), jnp.int32)
        self._hid = jnp.zeros((B, H), jnp.float32)
        self._trail = jnp.zeros((B, self.text_bucket, H), jnp.bfloat16)
        self._tlen = jnp.zeros((B,), jnp.int32)
        self._tidx0 = jnp.zeros((B,), jnp.int32)
        self._rngs = jnp.stack([jax.random.PRNGKey(0)] * B)

        self._reqs: list[Optional[_Request]] = [None] * B
        self._pos = [0] * B          # host mirror of each slot's cache position
        self._seq = 0                # chunk-dispatch sequence number
        self._pending: deque[_Request] = deque()
        self._task: Optional[asyncio.Task] = None
        self._failure: Optional[BaseException] = None
        self._fresh = False          # an admission since the last dispatch
        # per-slot "occupant already produced ≥1 chunk" — the code2wav
        # left-context validity flag (a fresh occupant must not decode
        # against the previous occupant's codes)
        self._had_chunk = np.zeros(B, bool)
        self._prev_codes = None      # device [B, n_prev, 16] of last dispatch
        # prebuilt parked rows: fresh zero state, empty text (tlen 0 feeds
        # the pad embedding every frame), position 0
        self._parked = (
            jax.tree.map(lambda x: x[None], one),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, H), jnp.float32),
            jnp.zeros((1, self.text_bucket, H), jnp.bfloat16),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            jax.random.PRNGKey(0)[None])
        self._build_admit_fn()
        self._build_chunk_fn()

    def _build_admit_fn(self):
        """ONE fixed-shape jitted dispatch per admission: text projection +
        conditioning prefix + trailing construction + prefill + CODEC_BOS
        step, from a `text_bucket`-padded token-id buffer — the batched
        analog of the engine's fused TTFC build (`_build_fused_fns`
        first_fn), so admission never compiles on a new text length and
        pays one round trip, not one per eager op."""
        from ..core.config import CODEC_BOS
        from ..models.decoder import decode_step_with_embed, forward_chunk
        from ..models.text_projection import embed_text_ids

        eng, cfg = self.eng, self._cfg
        kv_dtype = eng._kv_dtype
        md = eng._mrope_deltas

        def admit_fn(tw, tp_w, role_embeds, fused_tags, codec_bos_embed,
                     tts_eos, content_ids, n_content):
            content_embeds = embed_text_ids(tp_w, content_ids)  # [Tpad, H]
            first_text_bos = content_embeds[:1] + codec_bos_embed[None]
            prefill_embeds = jnp.concatenate(
                [role_embeds, fused_tags, first_text_bos])      # [8, H]
            # trailing[i] = content[i+1] for i < n-6; tts_eos at i == n-6
            # (clamped to 0 for degenerate inputs) — mirrors both
            # _build_prefill and the fused first_fn
            idx = jnp.arange(content_ids.shape[0])[:, None]
            shifted = jnp.roll(content_embeds, -1, axis=0)
            eos_pos = jnp.maximum(n_content - 6, 0)
            trailing = jnp.where(
                idx < eos_pos, shifted,
                jnp.where(idx == eos_pos, tts_eos[None],
                          jnp.zeros_like(shifted)))
            t_len = jnp.maximum(n_content - 5, 1).astype(jnp.int32)

            state = init_state(cfg, kv_dtype)
            mp = None if md is None else state.position + md
            state, _ = forward_chunk(cfg, tw, state, prefill_embeds,
                                     mrope_pos=mp)
            mp = None if md is None else state.position + md
            state, tok, hid = decode_step_with_embed(
                cfg, tw, state, tw.embed[CODEC_BOS], mrope_pos=mp)
            one = (state, tok, hid, trailing.astype(jnp.bfloat16), t_len,
                   jnp.int32(0))
            return jax.tree.map(lambda x: x[None], one)

        jitted = jax.jit(admit_fn)

        def call(content_ids, n_content):
            return jitted(eng.weights.talker, eng.weights.text_projection,
                          eng._role_embeds, eng._fused_tags,
                          eng._codec_bos_embed, eng._tts_eos_embed,
                          content_ids, n_content)

        self._admit_fn = call

    def _build_chunk_fn(self):
        """ONE jitted dispatch per chunk for ALL slots: vmapped frames +
        per-slot vocoder, fused — for BOTH backends. The fast backend's
        vocoder is stateless per chunk. code2wav needs left-context decode
        (each chunk re-decodes against the previous chunk's codes for
        gaplessness — engine semantics, modeling_qwen3_omni_moe.py:3752-62);
        here the context is the previous DISPATCH's codes, device-resident,
        with a per-slot `has_ctx` flag selecting the utterance-start form
        for freshly admitted occupants (so a new occupant never decodes
        against its predecessor's codes). The earlier design read codes
        back and ran `_decode_to_audio` per active slot — up to B extra
        host round trips per chunk for the real-architecture vocoder.

        Signatures: one per chunk size n ∈ {small, chunk} for fast/none;
        code2wav additionally keys on the PREVIOUS dispatch's size (the
        ctx shape) — at most 4. All are compiled by `warm()`."""
        eng, mc = self.eng, self.eng.model_config
        cfg = eng.config
        self._fused_audio = True
        voc = eng._voc_frames_decode
        self._c2w = (eng._voc_kind == "code2wav"
                     and eng.vocoder_weights is not None)
        has_vocoder = eng.vocoder_weights is not None
        hop = eng.vocoder_config.hop_length
        md = eng._mrope_deltas
        self._groups = mc.num_code_groups

        def make(n: int, with_ctx: bool):
            def fn(tw, cw, vw, pad, state, tok, hid, trailing, tlen, tidx0,
                   rngs, ctx=None, has_ctx=None):
                state, codes, valid, tok, hid = batched_frames(
                    mc.talker, mc.code_predictor, tw, cw, state, tok, hid,
                    trailing, tlen, tidx0, pad, rngs, num_frames=n,
                    do_sample=cfg.subtalker_do_sample,
                    temperature=cfg.subtalker_temperature,
                    top_k=cfg.subtalker_top_k, mrope_deltas=md)
                if with_ctx:
                    # both forms are computed and selected per slot: the
                    # utterance-start form only matters on a request's
                    # first chunk, and the vocoder is a tiny fraction of
                    # the chunk's compute at these shapes (docs/05 #15)
                    wav_ctx = jax.vmap(
                        lambda c, x: voc(vw, c, ctx=x))(codes, ctx)
                    wav_first = jax.vmap(lambda c: voc(vw, c))(codes)
                    audio = jnp.where(has_ctx[:, None], wav_ctx, wav_first)
                elif has_vocoder and not self._c2w:
                    audio = jax.vmap(lambda c: voc(vw, c))(codes)
                else:
                    audio = jnp.zeros((codes.shape[0], n * hop),
                                      jnp.float32)
                return state, codes, valid, tok, hid, audio

            return jax.jit(fn, donate_argnames=("state",))

        self._chunk_fns: dict = {}
        self._make_chunk_fn = make

    def _chunk_call(self, n: int):
        """Dispatch one fused n-frame chunk for all slots; jit-cached per
        (n, ctx-shape) signature."""
        eng = self.eng
        if self._c2w:
            ctx = self._prev_codes
            if ctx is None:
                ctx = jnp.zeros((self.slots, self.chunk, self._groups),
                                jnp.int32)
                has_ctx = np.zeros(self.slots, bool)
            else:
                has_ctx = self._had_chunk.copy()
            key = (n, int(ctx.shape[1]))
            fn = self._chunk_fns.get(key)
            if fn is None:
                fn = self._chunk_fns[key] = self._make_chunk_fn(n, True)
            return fn(eng.weights.talker, eng.weights.code_predictor,
                      eng.vocoder_weights, eng._tts_pad_embed,
                      self._state, self._tok, self._hid, self._trail,
                      self._tlen, self._tidx0, self._rngs, ctx, has_ctx)
        fn = self._chunk_fns.get(n)
        if fn is None:
            fn = self._chunk_fns[n] = self._make_chunk_fn(n, False)
        return fn(eng.weights.talker, eng.weights.code_predictor,
                  eng.vocoder_weights, eng._tts_pad_embed,
                  self._state, self._tok, self._hid, self._trail,
                  self._tlen, self._tidx0, self._rngs)

    def warm(self):
        """Compile + run every chunk-fn signature against parked slots,
        then re-park. Without this, live traffic would hit a mid-serving
        compile the first time each (size, prev-size) pair occurs."""
        sizes = [self.chunk] + ([self.small] if self.small else [])
        for n in sizes:
            if self._c2w:
                for prev_n in sizes:
                    self._prev_codes = jnp.zeros(
                        (self.slots, prev_n, self._groups), jnp.int32)
                    out = self._chunk_call(n)
                    self._state = out[0]
            else:
                out = self._chunk_call(n)
                self._state = out[0]
        # discard warm-run mutations: fresh parked rows everywhere
        # (_insert rewrites every batch tensor's row, including tok/hid)
        for b in range(self.slots):
            self._insert(b, self._parked)
            self._pos[b] = 0
        self._prev_codes = None
        self._had_chunk[:] = False

    # ── public API ───────────────────────────────────────────────────────

    async def submit(
        self, text: str,
    ) -> AsyncGenerator[tuple[np.ndarray, int], None]:
        """Queue a request; yield its audio chunks as they are produced."""
        req = _Request(text=text, cap=self._frame_cap(text))
        self._pending.append(req)
        if self._task is None or self._task.done():
            self._failure = None   # a fresh loop clears a stale failure
            self._task = asyncio.get_running_loop().create_task(self._run())
        try:
            while True:
                audio = await req.queue.get()
                if audio is None:
                    if self._failure is not None and req.emitted == 0:
                        raise RuntimeError(
                            "batch dispatch loop failed") from self._failure
                    return
                yield audio, self.eng.sample_rate
        finally:
            req.cancelled = True   # early aclose: free the slot next chunk

    def serve(self, texts: list[str]) -> list[tuple[np.ndarray, int]]:
        """Synchronous convenience: serve all texts (staggered admission as
        slots free up), return concatenated audio per text in order."""
        async def gather():
            async def one(text):
                parts = [a async for a, _sr in self.submit(text)]
                return (np.concatenate(parts) if parts
                        else np.array([], np.float32))
            return await asyncio.gather(*[one(t) for t in texts])

        waves = asyncio.run(gather())
        return [(w, self.eng.sample_rate) for w in waves]

    @property
    def active(self) -> int:
        return sum(r is not None for r in self._reqs)

    @property
    def pending(self) -> int:
        """Requests queued behind the slots (admission backlog)."""
        return sum(not r.cancelled for r in self._pending)

    # ── scheduling loop ──────────────────────────────────────────────────

    async def _run(self):
        """Depth-2 dispatch loop: chunk k+1 is enqueued (and admissions
        inserted into its OUTPUT state) before chunk k's results are read,
        so readback + per-request emit overlap device compute. A request
        finishing in chunk k decodes one speculative chunk before its slot
        frees — the same ≤1-chunk speculation budget as the single-stream
        engine's streaming pipeline."""
        try:
            inflight = None
            while True:
                self._admit_pending()
                # fast admission: the dispatch right after an admission is
                # the small quantum, so the fresh request's first audio is
                # ~small frames of compute away instead of a full chunk
                n = self.small if (self._fresh and self.small) else self.chunk
                self._fresh = False
                new = self._dispatch(n) if self.active else None
                if inflight is not None:
                    await self._collect(inflight)
                inflight = new
                if (inflight is None and not self._pending
                        and not self.active):
                    return
                await asyncio.sleep(0)
        except BaseException as e:
            # a dead dispatch loop must not strand consumers on their
            # queues forever: record the failure, wake every waiter
            self._failure = e
            for req in list(self._reqs) + list(self._pending):
                if req is not None:
                    req.queue.put_nowait(None)
            self._reqs = [None] * self.slots
            self._pending.clear()
            raise

    def _frame_cap(self, text: str) -> int:
        # same duration heuristic as synthesize_batch: ~2.5 words/s of
        # speech at 12.5 frames/s, 2x headroom, floor of 2 s
        words = max(len(text.split()), 1)
        return min(max(int(words / 2.5 * 12.5 * 2.0), 25),
                   self.eng.config.max_new_tokens)

    def _admit_pending(self):
        while self._pending:
            # drop requests whose consumer went away before admission
            if self._pending[0].cancelled:
                self._pending.popleft()
                continue
            try:
                slot = self._reqs.index(None)
            except ValueError:
                return
            req = self._pending.popleft()
            self._admit(req, slot)
            self._fresh = True

    def _admit(self, req: _Request, slot: int):
        eng = self.eng
        from ..engine.tokenizer import encode_tts_prompt

        # host tokenization only; ids are bucket-padded so the admission
        # dispatch has ONE signature, and uploaded in one device_put
        text_ids = encode_tts_prompt(eng.tokenizer, req.text)
        content = np.asarray(text_ids[3:], dtype=np.int32)[: self.text_bucket]
        ids = np.zeros(self.text_bucket, dtype=np.int32)
        ids[: len(content)] = content
        eng._rng, req_rng = jax.random.split(eng._rng)
        ids_dev, n_dev = jax.device_put((ids, np.int32(len(content))))
        state1, tok1, hid1, tr1, tlen1, tidx1 = self._admit_fn(ids_dev, n_dev)
        self._insert(slot, (state1, tok1, hid1, tr1, tlen1, tidx1,
                            req_rng[None]))
        self._reqs[slot] = req
        req.first_seq = self._seq + 1   # present from the NEXT dispatch on
        self._pos[slot] = 9    # 8 prefill positions + the CODEC_BOS step
        self._had_chunk[slot] = False   # no own codes yet: no vocoder ctx

    def _insert(self, slot: int, one):
        batch = (self._state, self._tok, self._hid, self._trail,
                 self._tlen, self._tidx0, self._rngs)
        (self._state, self._tok, self._hid, self._trail, self._tlen,
         self._tidx0, self._rngs) = _insert_slot(batch, one,
                                                 jnp.int32(slot))

    def _maybe_repark(self, slot: int):
        """Idle slots keep riding the vmapped dispatch and their position
        keeps advancing; refresh with a zero state before the cache index
        could reach the ring boundary."""
        if self._pos[slot] + 2 * self.chunk + 16 >= self._cfg.max_seq_len:
            self._insert(slot, self._parked)
            self._pos[slot] = 0

    def _dispatch(self, n: Optional[int] = None):
        """Enqueue one fused n-frame chunk for all slots; results are
        device futures — nothing is read back here. Host mirrors
        (positions, trailing cursor, sequence number, ctx validity)
        advance at dispatch time so admissions and repark decisions see
        the device's true state."""
        n = n or self.chunk
        (self._state, codes, valid, self._tok, self._hid,
         audio) = self._chunk_call(n)
        self._prev_codes = codes       # next dispatch's vocoder left ctx
        self._had_chunk[:] = True
        self._tidx0 = self._tidx0 + n
        for b in range(self.slots):
            self._pos[b] += n
        self._seq += 1
        return self._seq, codes, valid, audio, n

    async def _collect(self, inflight):
        """Read one dispatched chunk back and emit per-request audio.

        The blocking device readback runs in a worker thread: it waits for
        up to a full chunk of device compute, and doing that on the event
        loop starves every other task — cancels (voice-agent barge-in),
        pings, and queue consumers all stall behind it until the read
        lands."""
        eng = self.eng
        seq, codes, valid, audio, n = inflight
        hop = eng.vocoder_config.hop_length
        loop = asyncio.get_running_loop()
        valid_np, audio_np = await loop.run_in_executor(
            None, jax.device_get, (valid, audio))

        for b in range(self.slots):
            req = self._reqs[b]
            if req is None:
                self._maybe_repark(b)
                continue
            if req.first_seq > seq:
                continue   # speculative chunk of this slot's PREVIOUS owner
            n_valid = int(valid_np[b].sum())
            take = min(n_valid, req.cap - req.emitted)
            done = req.cancelled or n_valid < n \
                or req.emitted + take >= req.cap
            if take > 0 and not req.cancelled:
                wav = np.asarray(audio_np[b, : take * hop], np.float32)
                req.queue.put_nowait(wav)
                req.emitted += take
            if done:
                req.queue.put_nowait(None)
                self._reqs[b] = None
                self._maybe_repark(b)
