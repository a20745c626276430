#!/bin/bash
# H&M eval (reference: UniMP/unimp_hm_eval.sh): eval a per-epoch H&M
# checkpoint on the rec test split (14901 items, history_len 8).
MODEL=${1:-4b-instruct}; EPOCH=${2:-0}
python -m unimp_tpu.cli.mmrec_eval \
  --pretrained_model_name_or_path=$MODEL \
  --mmrec_path=${MMREC_PATH:-./data} --subset=hm --task=rec \
  --single_task --do_test \
  --load_weights_name=weights_epoch_${EPOCH} \
  --run_name=unimp_hm "${@:3}"
