"""Pipecat TTSService wrapper for the TPU TTS engine.

Preserves the reference's frame protocol exactly
(reference: pipecat_tts.py:33-139): `run_tts` yields `TTSStartedFrame`,
then PCM16 `TTSAudioRawFrame` chunks at 24 kHz, then `TTSStoppedFrame`;
`ErrorFrame` on exception; TTFB/usage metric hooks; engine initialization
deferred to a thread-pool executor so the pipeline loop never blocks on
weight loading / compilation.

`pipecat-ai` is an optional dependency. With it installed, the service
subclasses the real `pipecat.services.tts_service.TTSService` and is a
drop-in pipeline element. Without it, the service binds to the
protocol-level stand-ins in `serving/_frames.py` — same constructor, same
frame sequence — so the full `run_tts` contract stays exercised by tests
(`tests/test_serving.py`) even though the live pipeline can't run here.
Check `PIPECAT_AVAILABLE` to know which mode is active.
"""

from __future__ import annotations

import asyncio
import logging
from typing import AsyncGenerator, Optional

import numpy as np

from ..engine.tts_engine import TTSConfig, TTSEngine

logger = logging.getLogger(__name__)

try:
    from pipecat.frames.frames import (
        ErrorFrame,
        Frame,
        TTSAudioRawFrame,
        TTSStartedFrame,
        TTSStoppedFrame,
    )
    from pipecat.services.tts_service import TTSService

    PIPECAT_AVAILABLE = True
except Exception:  # pragma: no cover - exercised only without pipecat
    from ._frames import (  # noqa: F401 (re-exported protocol stand-ins)
        ErrorFrame,
        Frame,
        TTSAudioRawFrame,
        TTSService,
        TTSStartedFrame,
        TTSStoppedFrame,
    )

    PIPECAT_AVAILABLE = False

# Back-compat alias (pre-round-3 name)
_PIPECAT_AVAILABLE = PIPECAT_AVAILABLE


def float32_to_pcm16(audio: np.ndarray) -> bytes:
    """Clip + scale f32 [-1,1] → int16 bytes (reference: pipecat_tts.py:135-139).

    Uses the native C fast path (csrc/audio_runtime.c) when available."""
    from ..runtime.native import f32_to_pcm16

    return f32_to_pcm16(np.asarray(audio))


class TPUMegakernelTTSService(TTSService):
    """Drop-in replacement for the reference MegakernelTTSService
    (reference: pipecat_tts.py:33-132)."""

    def __init__(
        self,
        *,
        config: Optional[TTSConfig] = None,
        sample_rate: int = 24000,
        chunk_frames: int = 10,
        model_config=None,        # TTSModelConfig override (tests/tuning)
        **kwargs,
    ):
        super().__init__(sample_rate=sample_rate, **kwargs)
        if not PIPECAT_AVAILABLE:
            logger.warning(
                "pipecat-ai is not installed: %s is running against the "
                "protocol stand-ins in serving/_frames.py. The run_tts frame "
                "sequence is identical, but real pipecat pipeline elements "
                "will reject these frame types — `pip install pipecat-ai` "
                "for live pipeline use.", type(self).__name__)
        cfg = config or TTSConfig()
        cfg.sample_rate = sample_rate
        cfg.chunk_frames = chunk_frames
        self._engine = TTSEngine(cfg, model_config=model_config)
        self._engine_ready = False

    def can_generate_metrics(self) -> bool:
        return True

    async def _ensure_engine(self):
        if not self._engine_ready:
            loop = asyncio.get_event_loop()
            await loop.run_in_executor(None, self._engine.initialize)
            self._engine_ready = True

    async def run_tts(self, text: str, context_id: Optional[str] = None
                      ) -> AsyncGenerator[Frame, None]:
        logger.debug(f"Generating TTS: [{text}]")
        closing = False
        try:
            await self.start_ttfb_metrics()
            await self.start_tts_usage_metrics(text)
            yield TTSStartedFrame()

            await self._ensure_engine()
            first = True
            async for audio, sr in self._engine.synthesize_streaming(text):
                if first:
                    await self.stop_ttfb_metrics()
                    first = False
                yield TTSAudioRawFrame(
                    audio=float32_to_pcm16(audio),
                    sample_rate=sr,
                    num_channels=1,
                )
        except GeneratorExit:
            # Client hung up mid-stream (transport aclose()d us). A yield
            # inside `finally` here would raise "async generator ignored
            # GeneratorExit" — the reference's bare finally-yield
            # (reference: pipecat_tts.py:129-132) has this hazard; we run
            # the metric cleanup and re-raise WITHOUT emitting Stopped.
            closing = True
            raise
        except Exception as e:  # noqa: BLE001
            logger.exception("TTS generation failed")
            yield ErrorFrame(error=f"TTS error: {e}")
        finally:
            await self.stop_ttfb_metrics()
            if not closing:
                yield TTSStoppedFrame()


from .shared import SharedBatcher as _SharedBatcher  # noqa: E402


class TPUContinuousTTSService(TTSService):
    """Multi-client TTS: N pipecat pipelines share ONE TPU via the
    continuous batcher (`runtime/continuous.py`).

    The single-stream `TPUMegakernelTTSService` owns its engine, so two
    live pipelines on one chip would contend (the TPU is single-tenant —
    concurrent dispatch streams serialize). This service instead submits
    every `run_tts` to a shared `ContinuousBatcher`: concurrent clients
    are admitted into fixed batch slots at chunk boundaries and decoded
    by one fused dispatch per chunk, so K clients cost one batched stream,
    not K serialized ones. Frame protocol is identical to the
    single-stream service (reference: pipecat_tts.py:87-132).

    Sharing: construct the first instance with `config=`/`slots=`, then
    pass `share=first_service` (or the same `batcher=`) to siblings. All
    sharing instances must run on the same asyncio event loop — the
    batcher's dispatch task lives on the loop of the first `run_tts`.

    No reference counterpart (the reference is strictly one stream per
    service) — a TPU-first serving extension.
    """

    def __init__(
        self,
        *,
        batcher=None,             # prebuilt ContinuousBatcher (engine ready)
        share: "Optional[TPUContinuousTTSService]" = None,  # sibling service
        config: Optional[TTSConfig] = None,
        slots: int = 4,
        sample_rate: int = 24000,
        chunk_frames: int = 10,
        model_config=None,
        warm: bool = True,
        **kwargs,
    ):
        super().__init__(sample_rate=sample_rate, **kwargs)
        if not PIPECAT_AVAILABLE:
            logger.warning(
                "pipecat-ai is not installed: %s is running against the "
                "protocol stand-ins in serving/_frames.py — `pip install "
                "pipecat-ai` for live pipeline use.", type(self).__name__)
        if share is not None:
            self._shared = share._shared
        elif batcher is not None:
            self._shared = _SharedBatcher(batcher=batcher)
        else:
            cfg = config or TTSConfig()
            cfg.sample_rate = sample_rate
            cfg.chunk_frames = chunk_frames
            cfg.warmup = False   # the batcher warms its own signatures
            self._shared = _SharedBatcher(
                config=cfg, slots=slots, chunk_frames=chunk_frames,
                model_config=model_config, warm=warm)

    def can_generate_metrics(self) -> bool:
        return True

    async def run_tts(self, text: str, context_id: Optional[str] = None
                      ) -> AsyncGenerator[Frame, None]:
        logger.debug(f"Generating TTS (continuous): [{text}]")
        closing = False
        try:
            await self.start_ttfb_metrics()
            await self.start_tts_usage_metrics(text)
            yield TTSStartedFrame()

            batcher = await self._shared.get()
            first = True
            async for audio, sr in batcher.submit(text):
                if first:
                    await self.stop_ttfb_metrics()
                    first = False
                yield TTSAudioRawFrame(
                    audio=float32_to_pcm16(audio),
                    sample_rate=sr,
                    num_channels=1,
                )
        except GeneratorExit:
            # client hang-up mid-stream: submit()'s finally marks the
            # request cancelled and its slot frees at the next chunk
            # boundary; no Stopped frame (see single-stream note above)
            closing = True
            raise
        except Exception as e:  # noqa: BLE001
            logger.exception("TTS generation failed")
            yield ErrorFrame(error=f"TTS error: {e}")
        finally:
            await self.stop_ttfb_metrics()
            if not closing:
                yield TTSStoppedFrame()


# Reference-name alias
MegakernelTTSService = TPUMegakernelTTSService
