#!/usr/bin/env python3
"""Non-streaming TTS demo: text → wav file + RTF report.

TPU port of the reference demo (reference: demo_tts.py:17-61).
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def write_wav(path: str, audio: np.ndarray, sr: int):
    from qwen_tts_tpu.runtime.native import write_wav as _ww
    _ww(path, audio, sr)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text", default="Hello! This is the TPU native Qwen text to speech engine.")
    p.add_argument("--output", default="output.wav")
    p.add_argument("--model-path", default=None)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--no-sample", action="store_true")
    args = p.parse_args()

    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine

    cfg = TTSConfig(model_path=args.model_path, max_seq_len=args.max_seq,
                    subtalker_do_sample=not args.no_sample)
    engine = TTSEngine(cfg)

    t0 = time.perf_counter()
    engine.initialize()
    print(f"Initialized in {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    audio, sr = engine.synthesize(args.text)
    dt = time.perf_counter() - t0
    dur = len(audio) / sr if len(audio) else 0.0
    rtf = dt / dur if dur else float("inf")

    write_wav(args.output, audio, sr)
    print(f"Text: {args.text!r}")
    print(f"Audio: {dur:.2f}s @ {sr} Hz → {args.output}")
    print(f"Generation: {dt * 1000:.1f} ms, RTF {rtf:.3f} "
          f"({'PASS' if rtf < 0.3 else 'FAIL'} vs 0.3 target)")


if __name__ == "__main__":
    main()
