"""Shared lazily-built `ContinuousBatcher` for multi-client serving.

One TPU = one engine = one batcher, however many serving front-ends sit on
top (pipecat services, WebSocket connections, ...). `SharedBatcher.get()`
builds the engine + batcher exactly once — in a thread-pool executor under
an asyncio lock so the serving event loop never blocks on weight init or
TPU compilation — and every later call from any front-end returns the same
batcher instantly.

No reference counterpart (the reference serves strictly one stream per
process, pipecat_tts.py:87-132); this is the TPU-first multi-tenant layer.
"""

from __future__ import annotations

import asyncio
from typing import Optional

from ..engine.tts_engine import TTSConfig, TTSEngine


class SharedBatcher:
    """Lazily-built `ContinuousBatcher` shared by N serving front-ends.

    The first `get()` builds (and optionally signature-warms) everything in
    a thread-pool executor under an asyncio lock; every later `get()` from
    any sharing front-end returns the same batcher instantly."""

    def __init__(self, *, batcher=None, config: Optional[TTSConfig] = None,
                 slots: int = 4, chunk_frames: int = 10, model_config=None,
                 warm: bool = True):
        self.batcher = batcher
        self._config = config
        self._slots = slots
        self._chunk = chunk_frames
        self._model_config = model_config
        self._warm = warm
        self._lock: Optional[asyncio.Lock] = None

    async def get(self):
        if self.batcher is not None:
            return self.batcher
        if self._lock is None:           # created on the serving loop
            self._lock = asyncio.Lock()
        async with self._lock:
            if self.batcher is None:
                loop = asyncio.get_event_loop()
                self.batcher = await loop.run_in_executor(None, self._build)
        return self.batcher

    def _build(self):
        from ..runtime.continuous import ContinuousBatcher

        engine = TTSEngine(self._config or TTSConfig(warmup=False),
                           model_config=self._model_config)
        engine.initialize()
        batcher = ContinuousBatcher(engine, slots=self._slots,
                                    chunk_frames=self._chunk)
        if self._warm:
            # compile every closed signature (admit / insert / all chunk
            # sizes × ctx shapes / vocoder buckets) before the first real
            # caller arrives; serve() runs its own event loop — fine in an
            # executor thread
            batcher.warm()
            batcher.serve(["warm up the batch slots"] * self._slots)
        return batcher
