#!/usr/bin/env bash
# S3: wavelet coefficient prep for train + test splits.
. "$(dirname "$0")/../r3_lib.sh"
wait_for_tpu
python -m wdno_tpu.cli prep-smoke --data data/2d --split train
python -m wdno_tpu.cli prep-smoke --data data/2d --split test
