#!/bin/bash
# Round-5 train-MFU campaign, stage B: per-term attribution + frozen-dtype
# and attention-impl A/Bs at the reference training shape.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
R=benchmarks/records

echo "=== profile: int8 frozen, dots remat ==="
BENCH_FROZEN=int8 BENCH_REMAT_POLICY=dots timeout 1800 python benchmarks/train_profile.py 2>/tmp/r5_prof1.err \
  | tail -1 | tee "$R/train_profile_int8_dots_v5e.json"

echo "=== profile: bf16 frozen, dots remat ==="
BENCH_FROZEN=bfloat16 BENCH_REMAT_POLICY=dots timeout 1800 python benchmarks/train_profile.py 2>/tmp/r5_prof2.err \
  | tail -1 | tee "$R/train_profile_bf16_dots_v5e.json"

echo "=== profile: int8 frozen, dots remat, pallas attention pinned ==="
BENCH_FROZEN=int8 BENCH_REMAT_POLICY=dots BENCH_ATTN=pallas timeout 1800 python benchmarks/train_profile.py 2>/tmp/r5_prof3.err \
  | tail -1 | tee "$R/train_profile_int8_dots_pallas_v5e.json"

echo "=== stage B done ==="
