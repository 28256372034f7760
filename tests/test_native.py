"""Native C audio runtime: builds, converts, rings, writes WAV."""

import os
import wave

import numpy as np

from qwen_tts_tpu.runtime.native import (
    PCMRing,
    f32_to_pcm16,
    native_available,
    write_wav,
)


def test_native_builds():
    # the image ships cc/g++; the native path must be live there
    assert native_available()


def test_f32_to_pcm16_matches_numpy():
    x = np.linspace(-2, 2, 1001).astype(np.float32)
    got = np.frombuffer(f32_to_pcm16(x), dtype=np.int16)
    want = (np.clip(x, -1, 1) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(got, want)


def test_ring_roundtrip_and_wrap():
    r = PCMRing(capacity=256)
    payload = bytes(range(200))
    assert r.write(payload) == 200
    assert r.size == 200
    assert r.read(100) == payload[:100]
    # wraps around the 256-byte buffer
    p2 = bytes(reversed(range(120)))
    assert r.write(p2) == 120
    assert r.read(1000) == payload[100:] + p2
    assert r.size == 0
    assert r.read(10) == b""


def test_ring_all_or_nothing_on_overflow():
    r = PCMRing(capacity=64)
    assert r.write(b"a" * 60) == 60
    if native_available():
        assert r.write(b"b" * 10) == 0          # insufficient space
    assert r.read(60) == b"a" * 60


def test_write_wav(tmp_path):
    path = os.path.join(tmp_path, "t.wav")
    audio = np.sin(np.linspace(0, 40, 2400)).astype(np.float32)
    write_wav(path, audio, 24000)
    with wave.open(path, "rb") as f:
        assert f.getframerate() == 24000
        assert f.getnchannels() == 1
        assert f.getsampwidth() == 2
        assert f.getnframes() == 2400
        data = np.frombuffer(f.readframes(2400), dtype=np.int16)
    want = np.frombuffer(f32_to_pcm16(audio), dtype=np.int16)
    np.testing.assert_array_equal(data, want)
