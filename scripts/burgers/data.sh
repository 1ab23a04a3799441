#!/usr/bin/env bash
# Generate the Burgers datasets (reference scripts/burgers/burgers_data.sh):
# 40k train + 8k test at base resolution, plus a high-resolution test set for
# the zero-shot super-resolution evaluation.
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli datagen-burgers --n_train 40000 --n_test 8000 --out data/1d
python -m wdno_tpu.cli datagen-burgers --n_train 0 --n_test 200 --nt 640 --nx 960 --out data/1d_super
python -m wdno_tpu.cli prep-burgers --data data/1d
