#!/bin/bash
# 3-seed baseline training on the ORIGINAL dataset (also produces the guide
# model consumed by expand_diff.sh) — reference scripts/exps/train_original.sh.

DATASET=${1:-caltech-101}
MODEL=${2:-resnet50}
LR=${3:-0.1}

for SEED in 1 2 3
do
    DIR=checkpoint/${DATASET}/${MODEL}_unpretrained_lr${LR}/seed${SEED}
    if [ -d "$DIR" ]; then
        echo "Oops! The results exist at ${DIR} (so skip this job)"
    else
        python -m distdiff_tpu.cli.train \
          -d ${DATASET} --checkpoint ${DIR} -a ${MODEL} \
          --manualSeed ${SEED} --train-batch 64 --lr ${LR} --epochs 100
    fi
done
