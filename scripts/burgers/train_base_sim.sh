#!/usr/bin/env bash
# Base-resolution simulation model (reference scripts/burgers/train_base_sim.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli train-burgers --data data/1d --exp base_sim \
    --condition_u0 True --condition_f True
