#!/bin/bash
# Netflix fine-tune (reference: UniMP/unimp_netflix.sh): 10 epochs, cosine.
LR=${1:-1e-4}; BSZ=${2:-3}; MODEL=${3:-4b-instruct}
python -m unimp_tpu.cli.mmrec \
  --pretrained_model_name_or_path=$MODEL \
  --mmrec_path=${MMREC_PATH:-./data} --subset=netflix --task=rec \
  --single_task --use_reweight --learning_rate=$LR --batch_size=$BSZ \
  --num_epochs=10 --lr_scheduler=cosine \
  --run_name=unimp_netflix_rec --do_test "${@:4}"
