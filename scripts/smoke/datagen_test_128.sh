#!/usr/bin/env bash
# 32-frame @128^2 simulation test set (reference generate_data_test_128.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli datagen-smoke --n 100 --split test128 --record_stride 8 --record_res 128 --out data/2d
