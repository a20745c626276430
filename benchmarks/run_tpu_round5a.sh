#!/bin/bash
# Round-5 train-MFU campaign, stage A: remat policy A/B at the reference
# training shape (unimp_task.sh: bsz 3 x accum 2, ~256-token prompts,
# 6 images). The round-3 refshape record (29.4% MFU) ran remat=1 with
# full recompute — MFU does not credit recomputation, so the first
# question is whether remat is needed at all at this shape.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
R=benchmarks/records
REF="BENCH_VARIANT=3b-mpt BENCH_BATCH=3 BENCH_ACCUM=2 BENCH_HISTORY=10 BENCH_MEDIA=6 BENCH_IMAGE_SIZE=224 BENCH_BF16_STATE=1 BENCH_FROZEN_INT8=1 BENCH_STEPS=20"

echo "=== run A: remat OFF ==="
env $REF BENCH_REMAT=0 timeout 1800 python benchmarks/train_bench.py 2>&1 \
  | tee /tmp/r5_trainA.log | tail -1 > "$R/train_3b-mpt_refshape_noremat_v5e.json" || echo "run A failed"
cat "$R/train_3b-mpt_refshape_noremat_v5e.json"

echo "=== run B: remat policy dots ==="
env $REF BENCH_REMAT=1 BENCH_REMAT_POLICY=dots timeout 1800 python benchmarks/train_bench.py 2>&1 \
  | tee /tmp/r5_trainB.log | tail -1 > "$R/train_3b-mpt_refshape_dots_v5e.json" || echo "run B failed"
cat "$R/train_3b-mpt_refshape_dots_v5e.json"

echo "=== stage A done ==="
