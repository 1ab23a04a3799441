#!/usr/bin/env bash
# Base control model (reference train_base_control.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli train-smoke --data data/2d --exp base_control
