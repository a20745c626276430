#!/bin/bash
# Multi-task training (reference: UniMP/unimp_all_tasks.sh):
# img_sel+search+rec+exp mixture with 25% subsampling of non-final tasks.
LR=${1:-2e-4}; BSZ=${2:-3}; MODEL=${3:-4b-instruct}; SUBSET=${4:-all}
GAMMA=${5:-2}; ACCUM=${6:-2}
python -m unimp_tpu.cli.mmrec \
  --pretrained_model_name_or_path=$MODEL \
  --mmrec_path=${MMREC_PATH:-./data} --subset=$SUBSET --task=exp \
  --use_reweight --gamma=$GAMMA \
  --learning_rate=$LR --batch_size=$BSZ \
  --gradient_accumulation_steps=$ACCUM \
  --num_epochs=10 --lr_scheduler=cosine --warmup_steps_ratio=0.01 \
  --run_name=unimp_${SUBSET}_all --do_test "${@:7}"
