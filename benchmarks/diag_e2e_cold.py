#!/usr/bin/env python3
"""Diagnose cold-vs-warm TTFC per text length (run-twice probe).

If run 2 is fast, run 1 hit a compile / lazy finalize (a warmup hole);
if both are slow, the latency is real steady-state cost.
"""

import argparse
import asyncio
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.measure_e2e import TEXTS, run_one  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-seq", type=int, default=1024)
    args = p.parse_args()

    from qwen_tts_tpu.engine.tts_engine import TTSConfig, TTSEngine
    from qwen_tts_tpu.utils.timing import drain_device

    eng = TTSEngine(TTSConfig(max_seq_len=args.max_seq))
    eng.initialize()

    for name, text in TEXTS.items():
        from qwen_tts_tpu.engine.tokenizer import encode_tts_prompt
        toks = encode_tts_prompt(eng.tokenizer, text)
        for attempt in (1, 2):
            drain_device()
            t0 = time.perf_counter()
            ttfc, gaps, samples, wall = asyncio.run(run_one(eng, text))
            print(f"{name:7s} run{attempt}  TTFC {ttfc * 1000:8.1f} ms  "
                  f"wall {wall * 1000:7.0f} ms  samples {samples}  "
                  f"tokens {len(toks)}", flush=True)


if __name__ == "__main__":
    main()
