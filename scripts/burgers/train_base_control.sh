#!/usr/bin/env bash
# Base-resolution control model (reference scripts/burgers/train_base_control.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli train-burgers --data data/1d --exp base_control \
    --condition_u0 True --condition_uT True --condition_f False
