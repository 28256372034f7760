"""Live WebSocket serving tests (serving/ws_server.py).

Unlike the pipecat service (protocol stand-ins — pipecat-ai absent), this
surface runs for REAL here: an actual `websockets` server on localhost,
actual network clients, all sharing one `ContinuousBatcher`. Covers the
wire protocol, concurrent clients batched onto slots, malformed requests,
mid-stream disconnect (slot must free), and ping health checks.
"""

import asyncio
import json

import numpy as np
import pytest


def _tiny_shared(slots: int = 2):
    from qwen_tts_tpu.core.config import tiny_test_config
    from qwen_tts_tpu.engine.tts_engine import TTSConfig
    from qwen_tts_tpu.serving.shared import SharedBatcher

    cfg = TTSConfig(max_seq_len=256, vocoder_mode="random", seed=0,
                    trailing_bucket=16, chunk_frames=4, warmup=False)
    return SharedBatcher(config=cfg, slots=slots, chunk_frames=4,
                         model_config=tiny_test_config(max_seq_len=256),
                         warm=False)


def _server(shared=None, slots: int = 2):
    from qwen_tts_tpu.serving.ws_server import TTSWebSocketServer

    return TTSWebSocketServer(shared or _tiny_shared(slots), port=0)


def test_protocol_errors_and_ping_without_engine():
    """Malformed requests and pings are answered without ever building the
    engine — the server is healthy before (and without) TPU init."""
    from websockets.asyncio.client import connect

    server = _server()

    async def drive():
        await server.start()
        try:
            uri = f"ws://{server.host}:{server.port}"
            async with connect(uri) as ws:
                await ws.send("this is not json")
                err = json.loads(await ws.recv())
                assert err["type"] == "error" and "JSON" in err["message"]

                await ws.send(json.dumps({"type": "synthesize"}))  # no text
                err = json.loads(await ws.recv())
                assert err["type"] == "error"

                await ws.send(b"\x00\x01")                 # binary request
                err = json.loads(await ws.recv())
                assert err["type"] == "error"

                await ws.send(json.dumps({"type": "ping"}))
                pong = json.loads(await ws.recv())
                assert pong == {"type": "pong", "active": 0,
                                "pending": 0, "slots": 0}

                await ws.send(json.dumps({"type": "cancel"}))  # no-op
                await ws.send(json.dumps({"type": "ping"}))
                pong = json.loads(await ws.recv())
                assert pong["type"] == "pong"
        finally:
            await server.stop()
        assert server.shared.batcher is None   # never built

    asyncio.run(drive())


@pytest.mark.slow
def test_concurrent_clients_share_one_batcher():
    """Two real network clients synthesize concurrently; both complete the
    full protocol and audio matches the stopped-frame accounting."""
    from qwen_tts_tpu.serving.ws_server import synthesize_ws

    server = _server(slots=2)

    async def drive():
        await server.start()
        try:
            uri = f"ws://{server.host}:{server.port}"
            return await asyncio.gather(
                synthesize_ws(uri, "first websocket client", rid="a"),
                synthesize_ws(uri, "the second client at the same time",
                              rid="b"))
        finally:
            await server.stop()

    (a_audio, a_sr, a_fin), (b_audio, b_sr, b_fin) = asyncio.run(drive())
    assert server.shared.batcher is not None           # built exactly once
    for audio, sr, fin in ((a_audio, a_sr, a_fin), (b_audio, b_sr, b_fin)):
        assert sr == 24000
        assert fin["type"] == "stopped" and fin["chunks"] >= 1
        assert audio.shape[0] == fin["samples"]
        assert audio.dtype == np.float32 and audio.shape[0] > 0
    assert a_fin["id"] == "a" and b_fin["id"] == "b"


@pytest.mark.slow
def test_midstream_disconnect_frees_slot_and_server_survives():
    """A client that hangs up after the first audio chunk must not wedge
    the server: its slot frees at the next chunk boundary and a subsequent
    request on a fresh connection completes normally."""
    from websockets.asyncio.client import connect
    from qwen_tts_tpu.serving.ws_server import synthesize_ws

    server = _server(slots=2)

    async def drive():
        await server.start()
        try:
            uri = f"ws://{server.host}:{server.port}"
            async with connect(uri, max_size=None) as ws:
                await ws.send(json.dumps(
                    {"type": "synthesize", "id": "gone",
                     "text": "a long utterance that the client abandons "
                             "after hearing the very first audio chunk "
                             "arrive over the websocket"}))
                started = json.loads(await ws.recv())
                assert started["type"] == "started"
                msg = await ws.recv()
                assert isinstance(msg, bytes) and len(msg) > 0
                # hang up mid-stream (context exit closes the socket)

            # a fresh connection must still be served to completion
            audio, sr, fin = await synthesize_ws(
                uri, "a fresh client after the disconnect", rid="after")
            assert fin["chunks"] >= 1 and audio.shape[0] > 0

            # the abandoned request's slot drains (cancel lands at the
            # next chunk boundary; poll briefly for the loop to park)
            batcher = server.shared.batcher
            for _ in range(100):
                if batcher.active == 0:
                    break
                await asyncio.sleep(0.05)
            assert batcher.active == 0
        finally:
            await server.stop()

    asyncio.run(drive())


@pytest.mark.slow
def test_cancel_barges_in_and_connection_stays_usable():
    """Mid-stream {"type": "cancel"} (voice-agent barge-in) terminates the
    stream with a `cancelled` frame, frees the slot, and the SAME
    connection can immediately synthesize again."""
    from websockets.asyncio.client import connect

    server = _server(slots=2)

    async def drive():
        await server.start()
        try:
            uri = f"ws://{server.host}:{server.port}"
            async with connect(uri, max_size=None) as ws:
                await ws.send(json.dumps(
                    {"type": "synthesize", "id": "barged",
                     "text": "a long utterance that the user talks over "
                             "after the very first chunk of audio so the "
                             "agent must stop speaking immediately"}))
                started = json.loads(await ws.recv())
                assert started["type"] == "started"
                first = await ws.recv()
                assert isinstance(first, bytes) and len(first) > 0
                import time
                t_cancel = time.perf_counter()
                await ws.send(json.dumps({"type": "cancel"}))
                # the terminal is sent IMMEDIATELY by the reader loop —
                # at most frames already on the wire precede it, and
                # NOTHING of the barged stream may follow it
                seen_audio = 0
                while True:
                    msg = await ws.recv()
                    if isinstance(msg, bytes):
                        seen_audio += 1
                        continue
                    fin = json.loads(msg)
                    break
                cancel_to_terminal = time.perf_counter() - t_cancel
                assert fin["type"] == "cancelled" and fin["id"] == "barged"
                # server-side accounting can trail the wire by at most the
                # one send a cancellation interrupted
                assert fin["chunks"] >= seen_audio
                # immediate-terminal contract: no in-flight-chunk drain
                # (tiny CPU model: a drain regression shows up as multiple
                # chunk walls; generous bound for CI jitter)
                assert cancel_to_terminal < 2.0

                # same connection, next utterance completes normally; the
                # FIRST frame after the terminal must be its `started`
                # JSON — any binary frame here would be a late speculative
                # chunk of the cancelled stream leaking past its terminal
                await ws.send(json.dumps(
                    {"type": "synthesize", "id": "next",
                     "text": "the reply after the interruption"}))
                nxt = await ws.recv()
                assert not isinstance(nxt, bytes), \
                    "audio frame leaked after the cancelled terminal"
                started = json.loads(nxt)
                assert started == {"type": "started", "id": "next",
                                   "sample_rate": 24000}
                samples = 0
                while True:
                    msg = await ws.recv()
                    if isinstance(msg, bytes):
                        samples += len(msg) // 2
                        continue
                    fin = json.loads(msg)
                    break
                assert fin["type"] == "stopped" and fin["id"] == "next"
                assert fin["samples"] == samples > 0

            # cancelled slot drains at the next chunk boundary
            batcher = server.shared.batcher
            for _ in range(100):
                if batcher.active == 0:
                    break
                await asyncio.sleep(0.05)
            assert batcher.active == 0
        finally:
            await server.stop()

    asyncio.run(drive())


@pytest.mark.slow
def test_second_synthesize_while_streaming_is_refused():
    """One in-flight request per connection: a second synthesize during a
    stream gets an error naming the cancel escape hatch, and the original
    stream still completes."""
    from websockets.asyncio.client import connect

    server = _server(slots=2)

    async def drive():
        await server.start()
        try:
            uri = f"ws://{server.host}:{server.port}"
            async with connect(uri, max_size=None) as ws:
                await ws.send(json.dumps(
                    {"type": "synthesize", "id": "one",
                     "text": "the first utterance is still streaming"}))
                started = json.loads(await ws.recv())
                assert started["type"] == "started"
                await ws.send(json.dumps(
                    {"type": "synthesize", "id": "two", "text": "too soon"}))
                got_err = fin = None
                while fin is None:
                    msg = await ws.recv()
                    if isinstance(msg, bytes):
                        continue
                    frame = json.loads(msg)
                    if frame["type"] == "error":
                        got_err = frame
                    elif frame["type"] == "stopped":
                        fin = frame
                assert got_err is not None and got_err["id"] == "two"
                assert "cancel" in got_err["message"]
                assert fin["id"] == "one" and fin["chunks"] >= 1
        finally:
            await server.stop()

    asyncio.run(drive())


@pytest.mark.slow
def test_backpressure_refuses_when_queue_full():
    """With --max-pending 0 and every slot busy, a new request is refused
    with a capacity error instead of queueing unboundedly."""
    from websockets.asyncio.client import connect

    shared = _tiny_shared(slots=1)
    server = _server(shared=shared)
    server.max_pending = 0

    async def drive():
        await server.start()
        try:
            uri = f"ws://{server.host}:{server.port}"
            async with connect(uri, max_size=None) as w1, \
                    connect(uri, max_size=None) as w2:
                await w1.send(json.dumps(
                    {"type": "synthesize", "id": "hog",
                     "text": "a long enough utterance to hold the single "
                             "batch slot while the second client arrives"}))
                started = json.loads(await w1.recv())
                assert started["type"] == "started"
                first = await w1.recv()        # slot is definitely occupied
                assert isinstance(first, bytes)

                await w2.send(json.dumps(
                    {"type": "synthesize", "id": "late", "text": "hello"}))
                err = json.loads(await w2.recv())
                assert err["type"] == "error" and err["id"] == "late"
                assert "capacity" in err["message"]

                # the hog still completes
                while True:
                    msg = await w1.recv()
                    if isinstance(msg, bytes):
                        continue
                    fin = json.loads(msg)
                    break
                assert fin["type"] == "stopped" and fin["chunks"] >= 1

                # capacity freed: the late client can now be served
                await w2.send(json.dumps(
                    {"type": "synthesize", "id": "retry", "text": "hello"}))
                started = json.loads(await w2.recv())
                assert started["type"] == "started"
                while True:
                    msg = await w2.recv()
                    if isinstance(msg, bytes):
                        continue
                    assert json.loads(msg)["type"] == "stopped"
                    break
        finally:
            await server.stop()

    asyncio.run(drive())


@pytest.mark.slow
def test_sequential_requests_reuse_connection():
    """One connection, two sequential synthesize requests — ids echo back
    and audio accounting holds for both."""
    from websockets.asyncio.client import connect

    server = _server(slots=2)

    async def one(ws, text, rid):
        await ws.send(json.dumps(
            {"type": "synthesize", "text": text, "id": rid}))
        started = json.loads(await ws.recv())
        assert started == {"type": "started", "id": rid,
                           "sample_rate": 24000}
        samples = 0
        while True:
            msg = await ws.recv()
            if isinstance(msg, bytes):
                samples += len(msg) // 2
                continue
            fin = json.loads(msg)
            assert fin["type"] == "stopped" and fin["id"] == rid
            assert fin["samples"] == samples
            return samples

    async def drive():
        await server.start()
        try:
            uri = f"ws://{server.host}:{server.port}"
            async with connect(uri, max_size=None) as ws:
                s1 = await one(ws, "request number one", "r1")
                s2 = await one(ws, "and request number two", "r2")
                assert s1 > 0 and s2 > 0
        finally:
            await server.stop()

    asyncio.run(drive())
