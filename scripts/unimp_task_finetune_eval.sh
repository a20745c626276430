#!/bin/bash
# New-domain transfer eval (reference: UniMP/unimp_task_finetune_eval.sh):
# load a transfer-finetuned checkpoint (item_domain_{i} vocab) and run
# --only_test on the target domain.
MODEL=${1:-4b-instruct}; DOMAIN=${2:-office}; TASK=${3:-rec}; EPOCH=${4:-0}
python -m unimp_tpu.cli.mmrec_prefix \
  --pretrained_model_name_or_path=$MODEL \
  --mmrec_path=${MMREC_PATH:-./data} --subset=beauty --task=$TASK \
  --transfer_domain=$DOMAIN \
  --single_task --do_test --only_test \
  --load_run_name=unimp_transfer_${DOMAIN} \
  --load_weights_name=weights_epoch_${EPOCH} \
  --run_name=unimp_transfer_eval_${DOMAIN} "${@:5}"
