#!/bin/bash
# Round-5 TPU queue, stage D — serving at the 4b scale (VERDICT item 6)
# + prefill attribution (item 10, via decode_profile's prefill terms).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=${1:-/tmp/tpu_round5d}
STAGES=${STAGES:-}
mkdir -p "$OUT"

stage() {
  local name=$1 tmo=$2; shift 2
  if [ -n "$STAGES" ] && ! [[ " $STAGES " == *" $name "* ]]; then
    echo "=== $name SKIPPED ==="; return 0
  fi
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  echo "--- rc=$? tail:"; tail -2 "$OUT/$name.json" 2>/dev/null
}

# (6) wave-batched serving engine at 4b int8 — the scale the reference
# actually serves (model_worker.py loads a 7B-class Otter)
BENCH_VARIANT=4b BENCH_QUANT=int8 BENCH_CONCURRENCY=8 BENCH_REQUESTS=16 \
  BENCH_MAX_NEW=32 stage serve_4b_int8 3600 python benchmarks/serve_bench.py
# per-request baseline at the same scale (speedup denominator)
BENCH_VARIANT=4b BENCH_QUANT=int8 BENCH_CONCURRENCY=8 BENCH_REQUESTS=8 \
  BENCH_MAX_NEW=32 BENCH_UNBATCHED=1 stage serve_4b_int8_unbatched 3600 python benchmarks/serve_bench.py

# (10) prefill/vision/loop attribution at 4b (decode_profile prints the
# prefill decomposition alongside the loop terms)
BENCH_VARIANT=4b stage profile_4b_prefill 3600 python benchmarks/decode_profile.py

echo "=== stage D done ==="
