#!/bin/bash
# Single-task training (reference: UniMP/unimp_task.sh).
# usage: ./unimp_task.sh <lr> <bsz> <model> <subset> <task> <gamma> <accum>
LR=${1:-2e-4}; BSZ=${2:-3}; MODEL=${3:-4b-instruct}; SUBSET=${4:-all}
TASK=${5:-rec}; GAMMA=${6:-2}; ACCUM=${7:-2}
python -m unimp_tpu.cli.mmrec \
  --pretrained_model_name_or_path=$MODEL \
  --mmrec_path=${MMREC_PATH:-./data} --subset=$SUBSET --task=$TASK \
  --single_task --use_reweight --gamma=$GAMMA \
  --learning_rate=$LR --batch_size=$BSZ \
  --gradient_accumulation_steps=$ACCUM \
  --num_epochs=10 --lr_scheduler=cosine --warmup_steps_ratio=0.01 \
  --run_name=unimp_${SUBSET}_${TASK} --do_test "${@:8}"
