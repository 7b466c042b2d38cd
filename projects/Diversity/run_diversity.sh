#!/bin/bash
# Generate + evaluate sample_n captions per image with a given method.
# Args: <model id> <split> <sample_n> <method: sp|topk|topp|dbst|bs> <param>
set -e
ID=$1; SPLIT=${2:-test}; N=${3:-5}; METHOD=${4:-sp}; PARAM=${5:-1.0}

case $METHOD in
  sp)   SN_ARGS="--sample_n_method sample --temperature $PARAM" ;;
  topk) SN_ARGS="--sample_n_method top$PARAM" ;;
  topp) SN_ARGS="--sample_n_method top$PARAM" ;;
  dbst) SN_ARGS="--sample_n_method dbs --temperature $PARAM" ;;
  bs)   SN_ARGS="--sample_n_method bs" ;;
  *) echo "unknown method $METHOD"; exit 1 ;;
esac

python tools/eval.py \
  --model log_$ID/model-best.npz \
  --infos_path log_$ID/infos_$ID-best.pkl \
  --split $SPLIT --language_eval 1 --beam_size 1 \
  --sample_n $N $SN_ARGS --eval_oracle 1 \
  --id ${ID}_${METHOD}${PARAM} --force 1 --dump_images 0
