#!/bin/bash
# New-domain transfer (reference: UniMP/unimp_task_finetune.sh):
# freeze perceiver/xattn/embeddings, train on office or tool.
LR=${1:-1e-4}; BSZ=${2:-3}; MODEL=${3:-4b-instruct}; DOMAIN=${4:-office}
WEIGHTS=${5:-final_weights}
python -m unimp_tpu.cli.mmrec_prefix \
  --pretrained_model_name_or_path=$MODEL \
  --mmrec_path=${MMREC_PATH:-./data} --subset=$DOMAIN --task=rec \
  --single_task --transfer_domain=$DOMAIN \
  --load_weights_name=$WEIGHTS \
  --learning_rate=$LR --batch_size=$BSZ --num_epochs=10 \
  --lr_scheduler=constant --run_name=unimp_transfer --do_test "${@:6}"
