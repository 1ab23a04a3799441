#!/usr/bin/env bash
# 256-frame @64^2 control test set (reference generate_data_test_64.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli datagen-smoke --n 50 --split test --record_stride 1 --record_res 64 --out data/2d
