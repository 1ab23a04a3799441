#!/usr/bin/env bash
# Super-resolution refinement model (reference scripts/burgers/train_super_sim.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli train-burgers --data data/1d --exp super_sim \
    --super_model True --dim 64 --steps 250000 --n_downsample 3 \
    --condition_u0 True --condition_f True
