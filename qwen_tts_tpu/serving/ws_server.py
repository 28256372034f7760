"""Live WebSocket TTS server over the continuous batcher.

The reference's only live serving surface is a Pipecat `TTSService`
(reference: pipecat_tts.py:33-139) — one stream per process, and the
pipecat-ai package is not installable in this image. This module is the
TPU-first equivalent that CAN run live here: a `websockets`-based server
where every connection submits into ONE shared `ContinuousBatcher`
(runtime/continuous.py), so K concurrent clients cost one batched stream
on the single-tenant TPU instead of K serialized engines.

Wire protocol (one in-flight request per connection; control frames are
read CONCURRENTLY with streaming, so cancel/ping work mid-utterance):

  client → server (text frame, JSON):
    {"type": "synthesize", "text": "...", "id": "optional-id"}
    {"type": "cancel"}           barge-in: stop the in-flight request
    {"type": "ping"}

  server → client:
    {"type": "started", "id": ..., "sample_rate": 24000}    (text/JSON)
    <binary frames>  PCM16 little-endian mono audio chunks
    {"type": "stopped", "id": ..., "chunks": N, "samples": M}
    {"type": "cancelled", "id": ..., "chunks": N, "samples": M}
    {"type": "error", "id": ..., "message": "..."}
    {"type": "pong", "active": N, "pending": M, "slots": B}

`cancel` is the voice-agent barge-in path: the synthesis task is cancelled,
the `cancelled` terminal is sent IMMEDIATELY from the reader loop, and any
late speculative chunks are discarded (flag-gated under the send lock)
rather than drained — no audio frame for a stream ever follows its
terminal. The batch slot frees at the next chunk boundary (the reference
gets barge-in from pipecat's InterruptionFrame around its TTSService; here
it is native to the live protocol). A client disconnect mid-stream takes
the same cancellation path. `--max-pending N` bounds the
admission backlog: when all slots are busy and N requests are already
queued, new requests are refused with an error instead of growing the
queue (backpressure for overload).

CLI:  python -m qwen_tts_tpu.serving.ws_server --port 8766 --slots 4 \
          [--quantize int8|int4|mixed] [--kv-cache int8] [--max-seq 2048] \
          [--max-pending 8]
Client helper: `synthesize_ws(uri, text)` (used by tests and the demo).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
from typing import Optional

import numpy as np

from .shared import SharedBatcher

logger = logging.getLogger(__name__)


def _pcm16(audio: np.ndarray) -> bytes:
    from ..runtime.native import f32_to_pcm16

    return f32_to_pcm16(np.asarray(audio))


class _Stream:
    """Per-request wire state shared between the synthesis task and the
    reader loop's barge-in path. `terminal_sent` is the single-writer gate
    (always checked/set under the connection's send lock): after the
    terminal frame goes out, no audio frame of this stream may follow —
    late speculative chunks from the batcher are discarded, not sent."""

    __slots__ = ("rid", "chunks", "samples", "terminal_sent")

    def __init__(self, rid: str):
        self.rid = rid
        self.chunks = 0
        self.samples = 0
        self.terminal_sent = False


class TTSWebSocketServer:
    """Serve TTS over WebSocket; all connections share one batcher."""

    def __init__(self, shared: SharedBatcher, host: str = "127.0.0.1",
                 port: int = 8766, max_pending: Optional[int] = None):
        self.shared = shared
        self.host = host
        self.port = port
        self.max_pending = max_pending
        self._server = None

    def _at_capacity(self) -> bool:
        b = self.shared.batcher
        return (self.max_pending is not None and b is not None
                and b.active >= b.slots and b.pending >= self.max_pending)

    async def _synthesize(self, ws, send_lock, stream: "_Stream",
                          text: str) -> None:
        """Stream one utterance; runs as a task so the reader loop keeps
        servicing cancel/ping. Terminal frame is `stopped`, or `cancelled`
        on barge-in / disconnect. Every send is gated on
        `stream.terminal_sent` under the send lock: once ANY party (this
        task or the reader's barge-in path) has sent the terminal, no
        further frame of this stream reaches the wire — late speculative
        chunks are discarded, not drained."""
        rid = stream.rid
        try:
            batcher = await self.shared.get()
            async with send_lock:
                if stream.terminal_sent:
                    return
                await ws.send(json.dumps(
                    {"type": "started", "id": rid,
                     "sample_rate": batcher.eng.sample_rate}))
            async for audio, _sr in batcher.submit(text):
                pcm = _pcm16(audio)
                async with send_lock:
                    if stream.terminal_sent:
                        return
                    await ws.send(pcm)
                stream.chunks += 1
                stream.samples += int(audio.shape[0])
            await self._send_terminal(ws, send_lock, stream, "stopped")
        except asyncio.CancelledError:
            # barge-in or disconnect: submit()'s finally marks the request
            # cancelled and the slot frees at the next chunk boundary. The
            # reader's cancel path has usually already sent the terminal;
            # _send_terminal dedups via the flag (disconnects land here).
            try:
                await self._send_terminal(ws, send_lock, stream, "cancelled")
            except Exception:       # connection already gone
                pass
            raise
        except Exception as e:  # noqa: BLE001 — keep the conn alive
            logger.exception("synthesis failed for %s", rid)
            try:
                async with send_lock:
                    if not stream.terminal_sent:
                        stream.terminal_sent = True
                        await ws.send(json.dumps(
                            {"type": "error", "id": rid,
                             "message": f"{type(e).__name__}: {e}"}))
            except Exception:       # send itself failed: connection gone
                pass

    @staticmethod
    async def _send_terminal(ws, send_lock, stream: "_Stream",
                             kind: str) -> None:
        """Send the stream's terminal frame exactly once (flag-guarded)."""
        async with send_lock:
            if stream.terminal_sent:
                return
            stream.terminal_sent = True
            await ws.send(json.dumps(
                {"type": kind, "id": stream.rid,
                 "chunks": stream.chunks, "samples": stream.samples}))

    async def handle(self, ws) -> None:
        """One connection: a reader loop plus at most one in-flight
        synthesis task, so control frames work mid-stream."""
        counter = 0
        send_lock = asyncio.Lock()
        current: Optional[tuple[asyncio.Task, _Stream]] = None

        async def error(rid, message):
            async with send_lock:
                await ws.send(json.dumps(
                    {"type": "error", "id": rid, "message": message}))

        try:
            async for message in ws:
                if isinstance(message, bytes):
                    await error(None, "binary frames are not valid requests")
                    continue
                try:
                    req = json.loads(message)
                except json.JSONDecodeError:
                    await error(None, "request is not valid JSON")
                    continue
                kind = req.get("type")

                if kind == "ping":
                    b = self.shared.batcher
                    async with send_lock:
                        await ws.send(json.dumps(
                            {"type": "pong",
                             "active": b.active if b else 0,
                             "pending": b.pending if b else 0,
                             "slots": b.slots if b else 0}))
                elif kind == "cancel":
                    if current is not None and not current[0].done():
                        task, stream = current
                        task.cancel()
                        # Barge-in latency IS the product metric for a
                        # voice agent: send the terminal NOW and let the
                        # flag discard late speculative chunks, instead of
                        # awaiting the task (which drained in-flight
                        # chunks — 273.5 ms live in round-5 session 4).
                        await self._send_terminal(
                            ws, send_lock, stream, "cancelled")
                    current = None
                elif kind == "synthesize" and req.get("text"):
                    if current is not None and not current[0].done():
                        await error(req.get("id"),
                                    "one in-flight request per connection "
                                    '(send {"type": "cancel"} to barge in)')
                        continue
                    if self._at_capacity():
                        await error(req.get("id"),
                                    f"server at capacity (pending >= "
                                    f"{self.max_pending}); retry later")
                        continue
                    counter += 1
                    rid = req.get("id", f"req-{counter}")
                    stream = _Stream(rid)
                    current = (asyncio.create_task(
                        self._synthesize(ws, send_lock, stream,
                                         req["text"])), stream)
                else:
                    await error(req.get("id"),
                                'expected {"type": "synthesize", "text": ...}'
                                ' | "cancel" | "ping"')
        finally:
            if current is not None and not current[0].done():
                current[0].cancel()    # disconnect mid-stream: free the slot
                try:
                    await current[0]
                except asyncio.CancelledError:
                    pass

    async def start(self) -> None:
        from websockets.asyncio.server import serve

        self._server = await serve(self.handle, self.host, self.port,
                                   max_size=None)
        if self.port == 0:   # ephemeral: publish the bound port (tests)
            self.port = self._server.sockets[0].getsockname()[1]
        logger.info("TTS WebSocket server on ws://%s:%d", self.host,
                    self.port)

    async def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
            self._server = None

    async def serve_forever(self) -> None:
        await self.start()
        try:
            await asyncio.get_running_loop().create_future()  # run until ^C
        finally:
            await self.stop()


async def synthesize_ws(
    uri: str, text: str, rid: Optional[str] = None,
) -> tuple[np.ndarray, int, dict]:
    """Client helper: one synthesize round-trip → (f32 audio, sr, stopped)."""
    from websockets.asyncio.client import connect

    async with connect(uri, max_size=None) as ws:
        payload = {"type": "synthesize", "text": text}
        if rid is not None:
            payload["id"] = rid
        await ws.send(json.dumps(payload))

        started = json.loads(await ws.recv())
        if started.get("type") == "error":
            raise RuntimeError(started["message"])
        assert started["type"] == "started", started
        sr = started["sample_rate"]

        pcm = bytearray()
        while True:
            msg = await ws.recv()
            if isinstance(msg, bytes):
                pcm.extend(msg)
                continue
            final = json.loads(msg)
            if final.get("type") == "error":
                raise RuntimeError(final["message"])
            assert final["type"] == "stopped", final
            break
    audio = np.frombuffer(bytes(pcm), np.int16).astype(np.float32) / 32767.0
    return audio, sr, final


def main(argv: Optional[list[str]] = None) -> None:
    from ..engine.tts_engine import TTSConfig

    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8766)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--chunk-frames", type=int, default=10)
    ap.add_argument("--max-seq", type=int, default=2048)
    ap.add_argument("--quantize", default=None,
                    choices=["int8", "int4", "mixed"])
    ap.add_argument("--kv-cache", default=None, choices=["int8"])
    ap.add_argument("--cp-quantize", default=None,
                    choices=["int8", "int4", "mixed"])
    ap.add_argument("--no-warm", action="store_true",
                    help="skip the slot-warming pass (first request "
                         "then pays the compiles)")
    ap.add_argument("--max-pending", type=int, default=None,
                    help="refuse new requests when all slots are busy and "
                         "this many are already queued (default: unbounded)")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    cfg = TTSConfig(max_seq_len=args.max_seq, warmup=False)
    if args.quantize:
        cfg.quantize = args.quantize
    if args.kv_cache:
        cfg.kv_cache = args.kv_cache
    if args.cp_quantize:
        cfg.cp_quantize = args.cp_quantize
    shared = SharedBatcher(config=cfg, slots=args.slots,
                           chunk_frames=args.chunk_frames,
                           warm=not args.no_warm)
    server = TTSWebSocketServer(shared, host=args.host, port=args.port,
                                max_pending=args.max_pending)

    import time
    t0 = time.perf_counter()

    async def run():
        # build + warm BEFORE accepting connections so the first client
        # never eats a multi-minute compile
        await shared.get()
        # cold→ready is THE operational number for a serving restart
        # (quantized tiers compile for minutes; docs/07 cold-start table)
        logger.info("cold->ready %.1f s (quantize=%s kv=%s slots=%d)",
                    time.perf_counter() - t0, args.quantize, args.kv_cache,
                    args.slots)
        await server.serve_forever()

    asyncio.run(run())


if __name__ == "__main__":
    main()
