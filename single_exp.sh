#!/bin/bash
# End-to-end: 5x expansion then 3-seed evaluation (reference single_exp.sh).
# One process drives the whole TPU mesh — no per-GPU fan-out needed.

sh scripts/exps/expand_diff.sh 5 0 0 1

EXP=save/distdiff_batch_5x
sh scripts/exps/train_expand.sh caltech-101 resnet50 0.1 ${EXP} False 0
python -m distdiff_tpu.cli.parse_logs checkpoint/caltech-101/resnet50_unpretrained_save_distdiff_batch_5x_lr0.1 --multi
