#!/usr/bin/env python3
"""Voice-agent pipeline demo: STT → LLM → TPU TTS, wired through Pipecat.

TPU port of the reference voice agent (reference: demo_voice_agent.py:38-257)
at full pipeline depth: Silero VAD on the user aggregator, an LLM context
aggregator pair tracking both sides of the conversation, client
connect/disconnect event handlers (greeting via LLMRunFrame, cancel on
disconnect), and websocket/daily transport selection.

The full pipeline needs `pipecat-ai[deepgram,openai,silero]` plus STT/LLM
API keys; `--text-only` mode exercises the same TTS engine without any of
them (reference: demo_voice_agent.py:159-212). Every import is guarded — in
hermetic environments the demo degrades to text-only instead of crashing.
"""

import argparse
import asyncio
import logging
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logger = logging.getLogger(__name__)

SYSTEM_PROMPT = (
    "You are a helpful voice assistant powered by a TPU-native JAX/Pallas "
    "TTS engine running on a TPU v5e. Keep your responses concise and "
    "conversational since they will be spoken aloud. Avoid bullet points, "
    "emojis, or special characters that cannot be easily spoken."
)


async def run_text_only(args):
    """REPL: type text, hear (count) synthesized audio chunks."""
    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine
    from qwen_tts_tpu.runtime.native import f32_to_pcm16 as float32_to_pcm16

    engine = TTSEngine(TTSConfig(model_path=args.model_path,
                                 max_seq_len=args.max_seq))
    engine.initialize()
    print("Ready. Type text (empty line to exit).")
    while True:
        try:
            text = input("> ").strip()
        except EOFError:
            break
        if not text:
            break
        total = 0
        chunks = 0
        async for audio, sr in engine.synthesize_streaming(text):
            pcm = float32_to_pcm16(audio)
            total += len(pcm)
            chunks += 1
        print(f"  → {chunks} chunks, {total} PCM16 bytes @ {engine.sample_rate} Hz")


def build_transport(args):
    """Websocket or Daily transport with 24 kHz audio out
    (reference: demo_voice_agent.py:90-117)."""
    if args.transport == "websocket":
        from pipecat.transports.websocket.fastapi import (
            FastAPIWebsocketParams,
            FastAPIWebsocketTransport,
        )

        return FastAPIWebsocketTransport(
            params=FastAPIWebsocketParams(
                audio_in_enabled=True,
                audio_out_enabled=True,
                audio_out_sample_rate=24000,
            ),
            host=args.host,
            port=args.port,
        )
    if args.transport == "daily":
        from pipecat.transports.daily.transport import DailyParams, DailyTransport

        return DailyTransport(
            room_url=os.getenv("DAILY_ROOM_URL", ""),
            token=os.getenv("DAILY_TOKEN", ""),
            bot_name="TPU TTS Bot",
            params=DailyParams(
                audio_in_enabled=True,
                audio_out_enabled=True,
                audio_out_sample_rate=24000,
            ),
        )
    raise ValueError(f"unknown transport: {args.transport}")


async def run_pipeline(args):
    """Full Pipecat pipeline (requires pipecat-ai + service API keys):
    transport.input → STT → user aggregator (Silero VAD) → LLM → TTS →
    transport.output → assistant aggregator
    (reference: demo_voice_agent.py:120-157)."""
    missing = [k for k in ("DEEPGRAM_API_KEY", "OPENAI_API_KEY")
               if not os.environ.get(k)]
    if missing:
        print(f"Missing API keys: {missing}; falling back to --text-only mode.")
        return await run_text_only(args)

    try:
        from pipecat.audio.vad.silero import SileroVADAnalyzer
        from pipecat.frames.frames import LLMRunFrame
        from pipecat.pipeline.pipeline import Pipeline
        from pipecat.pipeline.runner import PipelineRunner
        from pipecat.pipeline.task import PipelineParams, PipelineTask
        from pipecat.processors.aggregators.llm_context import LLMContext
        from pipecat.processors.aggregators.llm_response_universal import (
            LLMContextAggregatorPair,
            LLMUserAggregatorParams,
        )
        from pipecat.services.deepgram.stt import DeepgramSTTService
        from pipecat.services.openai.llm import OpenAILLMService
    except ImportError:
        print("pipecat-ai not installed; falling back to --text-only mode.")
        return await run_text_only(args)

    from qwen_tts_tpu.engine.tts_engine import TTSConfig
    from qwen_tts_tpu.serving.pipecat_tts import TPUMegakernelTTSService

    # --- services ---
    stt = DeepgramSTTService(api_key=os.environ["DEEPGRAM_API_KEY"])
    llm = OpenAILLMService(api_key=os.environ["OPENAI_API_KEY"],
                           model=args.llm_model)
    tts = TPUMegakernelTTSService(
        config=TTSConfig(model_path=args.model_path,
                         max_seq_len=args.max_seq),
        sample_rate=24000,
        chunk_frames=args.chunk_frames)

    # --- LLM context: shared message list, aggregated on both sides, with
    # Silero VAD gating user turn ends (reference: demo_voice_agent.py:69-88)
    messages = [{"role": "system", "content": SYSTEM_PROMPT}]
    context = LLMContext(messages)
    user_aggregator, assistant_aggregator = LLMContextAggregatorPair(
        context,
        user_params=LLMUserAggregatorParams(vad_analyzer=SileroVADAnalyzer()),
    )

    transport = build_transport(args)

    pipeline = Pipeline([
        transport.input(),       # receive user audio
        stt,                     # speech-to-text
        user_aggregator,         # aggregate user turns (VAD end-of-turn)
        llm,                     # generate response
        tts,                     # TPU TTS (streaming audio)
        transport.output(),      # stream audio back
        assistant_aggregator,    # track assistant responses in context
    ])

    task = PipelineTask(
        pipeline,
        params=PipelineParams(enable_metrics=True, enable_usage_metrics=True),
    )

    @transport.event_handler("on_client_connected")
    async def on_client_connected(transport, client):
        logger.info("Client connected — starting conversation")
        messages.append({
            "role": "system",
            "content": "Greet the user briefly and tell them you are ready "
                       "to chat.",
        })
        await task.queue_frames([LLMRunFrame()])

    @transport.event_handler("on_client_disconnected")
    async def on_client_disconnected(transport, client):
        logger.info("Client disconnected")
        await task.cancel()

    runner = PipelineRunner()
    logger.info("Voice agent running (%s transport)", args.transport)
    await runner.run(task)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text-only", action="store_true")
    p.add_argument("--model-path", default=None)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--transport", default="websocket",
                   choices=["websocket", "daily"])
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--llm-model", default="gpt-4o-mini")
    p.add_argument("--chunk-frames", type=int, default=10)
    args = p.parse_args()
    asyncio.run(run_text_only(args) if args.text_only else run_pipeline(args))


if __name__ == "__main__":
    main()
