#!/usr/bin/env bash
# 20k training sims, 33 frames @64^2 (reference data_generation/generate_data_train.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli datagen-smoke --n 20000 --split train --out data/2d
python -m wdno_tpu.cli prep-smoke --data data/2d --split train
