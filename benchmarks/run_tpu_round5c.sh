#!/bin/bash
# Round-5 TPU queue, stage C — run serially, ONE TPU job at a time.
#  (a) train refshape + frozen-vision latent cache (VERDICT item 1a)
#  (b) 4b decode re-sweep on the SPLIT gen-KV layout: kv_int8 under the
#      auto-pinned Pallas impl, and batch 24/32 scaling — the prior
#      rejections were measured on the merged layout (VERDICT item 2)
#  (c) small-variant merged-vs-split A/B, N=2 each (VERDICT item 3)
# Usage: bash benchmarks/run_tpu_round5c.sh [outdir]; STAGES allowlist.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=${1:-/tmp/tpu_round5c}
STAGES=${STAGES:-}
mkdir -p "$OUT"

stage() {  # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  if [ -n "$STAGES" ] && ! [[ " $STAGES " == *" $name "* ]]; then
    echo "=== $name SKIPPED ==="; return 0
  fi
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  echo "--- rc=$? tail:"; tail -2 "$OUT/$name.json" 2>/dev/null
}

# reference train shape vars (exported; train stages inherit them, the
# bench.py stages read none of the train-only vars and pin BENCH_VARIANT
# explicitly)
export BENCH_BATCH=3 BENCH_ACCUM=2 BENCH_HISTORY=10 BENCH_MEDIA=6 \
  BENCH_IMAGE_SIZE=224 BENCH_BF16_STATE=1 BENCH_FROZEN_INT8=1 BENCH_STEPS=20

# (a) vision latent cache at refshape, dots remat
BENCH_VARIANT=3b-mpt BENCH_REMAT=1 BENCH_REMAT_POLICY=dots BENCH_VISION_CACHE=1 \
  stage train_viscache_dots 2400 python benchmarks/train_bench.py
# ... and with remat fully OFF (the cache frees the tower's activations;
# remat-off missed fitting by only 1.11G)
BENCH_VARIANT=3b-mpt BENCH_REMAT=0 BENCH_VISION_CACHE=1 \
  stage train_viscache_noremat 2400 python benchmarks/train_bench.py

# (a2) per-term attribution at the refshape: vision tower + real step +
# host data time (the step program shares the compile cache with the
# stage-A dots run); then the frozen-storage A/B (bf16 vs int8 dequant
# cost in the train forward)
BENCH_FROZEN=int8 BENCH_REMAT_POLICY=dots BENCH_PROGRAMS=vision,step,data   stage train_profile_int8_dots 3000 python benchmarks/train_profile.py
BENCH_VARIANT=3b-mpt BENCH_REMAT=1 BENCH_REMAT_POLICY=dots BENCH_FROZEN_INT8=0 BENCH_FROZEN_BF16=1 \
  stage train_refshape_bf16frozen_dots 2400 python benchmarks/train_bench.py

# (b) 4b decode: kv_int8 on the split layout (auto-pins Pallas on TPU)
BENCH_VARIANT=4b BENCH_BATCH=16 BENCH_USERS=64 BENCH_BASELINE_USERS=0 \
  BENCH_QUANT=int8 BENCH_KV_INT8=1 stage eval_4b_kvint8_split 3600 python bench.py
# batch scaling on the split layout
BENCH_VARIANT=4b BENCH_BATCH=24 BENCH_USERS=72 BENCH_BASELINE_USERS=0 \
  BENCH_QUANT=int8 stage eval_4b_b24_split 3600 python bench.py
BENCH_VARIANT=4b BENCH_BATCH=32 BENCH_USERS=64 BENCH_BASELINE_USERS=0 \
  BENCH_QUANT=int8 stage eval_4b_b32_split 3600 python bench.py

# (c) small variant: re-baseline the shipped number (N=2) + raw
# merged-vs-split layout probe AT SMALL SHAPES (the production merged
# layout was removed in r4; the probe measures the layout delta the
# small variant would see)
BENCH_VARIANT=small BENCH_BATCH=32 stage bench_small_a 1800 python bench.py
BENCH_VARIANT=small BENCH_BATCH=32 stage bench_small_b 1800 python bench.py
PROBE_VARIANT=small stage cache_layout_small 1800 python benchmarks/cache_layout_probe.py

echo "=== stage C done; artifacts in $OUT ==="
