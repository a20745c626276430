#!/bin/bash
# Round-3 TPU measurement queue — run serially, ONE TPU job at a time.
# Usage: bash benchmarks/run_tpu_round3.sh [outdir]
# Each stage logs to $OUT/<stage>.{json,log}; a stage failure does not
# stop later stages (tunnel flakes cost a stage, not the run).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=${1:-/tmp/tpu_round3}
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

# 1. fused-kernel compiled validation + timing (bf16, then int8)
stage kernel_bf16 1800 python benchmarks/decode_kernel_check.py
CHECK_INT8=1 stage kernel_int8 1800 python benchmarks/decode_kernel_check.py

# 2. CLI smoke on hardware (verify recipe, debug model)
python - <<'EOF'
from unimp_tpu.tools import synth_data
synth_data.generate("/tmp/verify/data", n_items=32, n_users=16, image_size=28)
EOF
stage cli_smoke 1800 python mmrec.py --pretrained_model_name_or_path=debug \
  --mmrec_path=/tmp/verify/data --external_save_dir=/tmp/verify/runs \
  --subset=beauty --task=rec --single_task --n_items=32 --history_len=5 \
  --patch-image-size=28 --batch_size=8 --eval_batch_size=4 \
  --num_epochs=1 --logging_steps=1 --warmup_steps=0 --workers=0 \
  --num_beams=3 --max_records=8 --precision=fp32 \
  --run_name=smoke --do_eval --do_test --use_reweight

# 3. decode-step attribution at 4b with the fused kernels
stage profile_4b 3600 python benchmarks/decode_profile.py

# 4. flagship eval re-measure (fused kernels; VERDICT target >=14 items/s)
BENCH_VARIANT=4b BENCH_BATCH=16 BENCH_USERS=64 BENCH_BASELINE_USERS=4 \
  stage eval_4b 3600 python bench.py
# 4b. with int8 weights + int8 KV (in-kernel dequant)
BENCH_VARIANT=4b BENCH_BATCH=16 BENCH_USERS=64 BENCH_BASELINE_USERS=4 \
  BENCH_QUANT=int8 BENCH_KV_INT8=1 stage eval_4b_int8 3600 python bench.py

# 5. default driver bench (small) to refresh the headline artifact
stage bench_small 1800 python bench.py

echo "=== done; artifacts in $OUT ==="
