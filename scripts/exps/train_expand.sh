#!/bin/bash
# 3-seed downstream evaluation on original + expanded data
# (reference scripts/exps/train_expand.sh semantics and checkpoint paths).

DATASET=$1
MODEL=$2
LR=$3
EXP=$4
Pretrained=$5
GPU=${6:-0}  # ignored on TPU

for SEED in 1 2 3
do
    if [ "${Pretrained}" = "True" ]; then
      DIR=checkpoint/${DATASET}/${MODEL}_pretrained_${EXP//\//_}_lr${LR}/seed${SEED}
      PRETRAIN_FLAG=--pretrained
    else
      DIR=checkpoint/${DATASET}/${MODEL}_unpretrained_${EXP//\//_}_lr${LR}/seed${SEED}
      PRETRAIN_FLAG=
    fi
    if [ -d "$DIR" ]; then
        echo "Oops! The results exist at ${DIR} (so skip this job)"
    else
        python -m distdiff_tpu.cli.train_expanded \
          -d ${DATASET} --checkpoint ${DIR} -a ${MODEL} \
          --manualSeed ${SEED} \
          --data_expanded_dir data/${DATASET}_expansion/${EXP} \
          ${PRETRAIN_FLAG} --train-batch 64 --lr ${LR} --epochs 100
    fi
done
