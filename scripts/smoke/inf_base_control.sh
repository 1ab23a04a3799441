#!/usr/bin/env bash
# Control inference + on-device re-simulation (reference inf_base_control.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli eval-smoke --data data/2d --exp base_control --task control \
    --split test --ntest 50 --batch_eval 10 --ddim_steps 100 --ddim_eta 1 \
    --standard_fixed_ratio 100 --w_init 0.1
