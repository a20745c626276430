#!/bin/bash
# Round-4 TPU measurement queue — run serially, ONE TPU job at a time.
# Usage: bash benchmarks/run_tpu_round4.sh [outdir]
# Each stage logs to $OUT/<stage>.{json,log}; a stage failure does not
# stop later stages (tunnel flakes cost a stage, not the run).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=${1:-/tmp/tpu_round4}
STAGES=${STAGES:-}  # space-separated allowlist; empty = run all
mkdir -p "$OUT"

stage() {  # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  if [ -n "$STAGES" ] && ! [[ " $STAGES " == *" $name "* ]]; then
    echo "=== $name SKIPPED (not in STAGES) ==="; return 0
  fi
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  echo "--- rc=$? tail:"; tail -3 "$OUT/$name.json" "$OUT/$name.log" 2>/dev/null
}

# 1. fused-kernel v3 compiled validation + us/call vs XLA (VERDICT item 6)
stage kernel_bf16 1800 python benchmarks/decode_kernel_check.py
CHECK_INT8=1 stage kernel_int8 1800 python benchmarks/decode_kernel_check.py

# 2. flagship eval: int8 weights + int8 KV under the (auto-pinned) fused
#    Pallas kernels — the round-4 attempt at the >=14 items/s target
BENCH_VARIANT=4b BENCH_BATCH=16 BENCH_USERS=64 BENCH_BASELINE_USERS=4 \
  BENCH_QUANT=int8 BENCH_KV_INT8=1 stage eval_4b_pallas_int8 3600 python bench.py

# 3. fresh re-measure of the current record config (int8 weights, bf16 KV,
#    default XLA decode) — re-baselines the round-2 10.36 number
BENCH_VARIANT=4b BENCH_BATCH=16 BENCH_USERS=64 BENCH_BASELINE_USERS=4 \
  BENCH_QUANT=int8 stage eval_4b_xla_int8w 3600 python bench.py

# 4. small-variant driver bench, two independent invocations (each takes
#    best-of-2 internally) — explains/repros the round-3 12% drop
stage bench_small_a 1800 python bench.py
stage bench_small_b 1800 python bench.py

# 5. decode-step attribution at 4b with the current defaults
stage profile_4b 3600 python benchmarks/decode_profile.py

echo "=== done; artifacts in $OUT ==="
