#!/bin/bash
# VERDICT r4 #2: quality-validate every fast mode at the cal14 recipe
# (docs/quality_loop_v5e_r4.md). Runs the four modes SEQUENTIALLY (one TPU
# chip; jobs contend for the remote compile service). Each run: 2
# expansions + 15 classifier trainings, ~19 min warm on the v5e.
#
# Usage: bash scripts/run_quality_modes.sh /tmp/qmodes
set -u
ROOT="${1:-/tmp/qmodes}"
mkdir -p "$ROOT"
CAL14="--seeds 1 2 3 4 5 \
  --epochs 12 --train_batch 16 --input_size 16 \
  --num_images_per_prompt 5 --n_classes 4 --n_train 5 --n_test 50 \
  --toy_noise 30 --toy_jitter 55 \
  --strength 0.45 --guidance_scale 1.0 --steps 20 \
  --train_guide --guide_epochs 40 --train_vae --train_unet"

run() {
  name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] quality mode: $name ==="
  python scripts/quality_loop.py --workdir "$ROOT/$name" $CAL14 "$@" \
    > "$ROOT/$name.log" 2>&1
  echo "--- $name done rc=$? ---"
  tail -n 12 "$ROOT/$name.log"
}

run deep_cache --deep_cache
run dpmpp --scheduler dpmpp
run direct --guided_mode direct_guidance
run int8 --int8
echo "ALL QUALITY MODES DONE"
