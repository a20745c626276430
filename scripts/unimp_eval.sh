#!/bin/bash
# Eval-only (reference: UniMP/unimp_eval.sh): loads saved weights.
MODEL=${1:-4b-instruct}; SUBSET=${2:-all}; TASK=${3:-rec}
WEIGHTS=${4:-final_weights}
python -m unimp_tpu.cli.mmrec_eval \
  --pretrained_model_name_or_path=$MODEL \
  --mmrec_path=${MMREC_PATH:-./data} --subset=$SUBSET --task=$TASK \
  --single_task --do_test --load_weights_name=$WEIGHTS \
  --run_name=unimp_${SUBSET}_${TASK} "${@:5}"
