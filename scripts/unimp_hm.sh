#!/bin/bash
# H&M fine-tune (reference: UniMP/unimp_hm.sh): 50 epochs, constant lr.
LR=${1:-1e-4}; BSZ=${2:-3}; MODEL=${3:-4b-instruct}
python -m unimp_tpu.cli.mmrec \
  --pretrained_model_name_or_path=$MODEL \
  --mmrec_path=${MMREC_PATH:-./data} --subset=hm --task=rec \
  --single_task --use_reweight --learning_rate=$LR --batch_size=$BSZ \
  --num_epochs=50 --lr_scheduler=constant \
  --run_name=unimp_hm_rec --do_test "${@:4}"
