#!/usr/bin/env bash
# Full (--runslow) test profile, sharded across three pytest processes.
#
# Why not one process: the XLA CPU compiler segfaults non-deterministically
# after ~45-60 min inside a single long-lived pytest process that has
# performed hundreds of compilations (observed twice, different crash
# sites, both inside backend_compile_and_load on a trivial jit — the
# running test is a victim, not a cause; 120 GB RAM free at crash time).
# Short-lived processes never hit it. Each shard is grouped to balance
# the compile-heavy files (engine / kernels / vocoder+io).
#
# Run from the repo root:  bash tests/run_full.sh
set -u
cd "$(dirname "$0")/.."

SHARD_KERNELS="tests/test_oracle.py tests/test_megakernel.py \
  tests/test_attention_kernel.py tests/test_generate_kernel.py \
  tests/test_mrope.py"
SHARD_ENGINE="tests/test_engine.py tests/test_code_predictor.py \
  tests/test_text_lm.py tests/test_batch.py tests/test_sharding.py"
SHARD_VOCODER_IO="tests/test_code2wav.py tests/test_vocoder.py \
  tests/test_checkpoint_loading.py tests/test_tokenizer.py \
  tests/test_serving.py tests/test_native.py"

rc=0
for shard in "$SHARD_KERNELS" "$SHARD_ENGINE" "$SHARD_VOCODER_IO"; do
    echo "=== shard: $shard"
    # shellcheck disable=SC2086  # word-splitting the file list is intended
    python -m pytest $shard -q --runslow || rc=$?
done

if [ "$rc" -eq 0 ]; then
    echo "FULL PROFILE GREEN (3 shards)"
else
    echo "FULL PROFILE FAILED (rc=$rc)"
fi
exit "$rc"
