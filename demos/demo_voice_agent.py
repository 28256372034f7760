#!/usr/bin/env python3
"""Voice-agent pipeline demo: STT → LLM → TPU TTS, wired through Pipecat.

TPU port of the reference voice agent (reference: demo_voice_agent.py:38-257).
The full pipeline needs `pipecat-ai` plus STT/LLM API keys; `--text-only`
mode exercises the same TTS service without any of them
(reference: demo_voice_agent.py:159-212).
"""

import argparse
import asyncio
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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


async def run_pipeline(args):
    """Full Pipecat pipeline (requires pipecat-ai + service API keys)."""
    missing = [k for k in ("DEEPGRAM_API_KEY", "OPENAI_API_KEY") if not os.environ.get(k)]
    if missing:
        print(f"Missing API keys: {missing}; falling back to --text-only mode.")
        return await run_text_only(args)

    try:
        from pipecat.pipeline.pipeline import Pipeline
        from pipecat.pipeline.runner import PipelineRunner
        from pipecat.pipeline.task import PipelineParams, PipelineTask
        from pipecat.services.deepgram.stt import DeepgramSTTService
        from pipecat.services.openai.llm import OpenAILLMService
        from pipecat.transports.network.websocket_server import (
            WebsocketServerParams,
            WebsocketServerTransport,
        )
    except ImportError:
        print("pipecat-ai not installed; falling back to --text-only mode.")
        return await run_text_only(args)

    from qwen_tts_tpu.serving.pipecat_tts import TPUMegakernelTTSService

    transport = WebsocketServerTransport(
        params=WebsocketServerParams(host=args.host, port=args.port,
                                     audio_out_enabled=True))
    stt = DeepgramSTTService(api_key=os.environ["DEEPGRAM_API_KEY"])
    llm = OpenAILLMService(api_key=os.environ["OPENAI_API_KEY"], model=args.llm_model)
    tts = TPUMegakernelTTSService(sample_rate=24000)

    pipeline = Pipeline([
        transport.input(), stt, llm, tts, transport.output(),
    ])
    task = PipelineTask(pipeline, params=PipelineParams(
        enable_metrics=True, enable_usage_metrics=True))
    runner = PipelineRunner()
    print(f"Voice agent listening on ws://{args.host}:{args.port}")
    await runner.run(task)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text-only", action="store_true")
    p.add_argument("--model-path", default=None)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--llm-model", default="gpt-4o-mini")
    args = p.parse_args()
    asyncio.run(run_text_only(args) if args.text_only else run_pipeline(args))


if __name__ == "__main__":
    main()
