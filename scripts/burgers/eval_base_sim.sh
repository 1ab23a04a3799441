#!/usr/bin/env bash
# Base simulation eval: DDIM 50 eta 1, Ntest 8000 (reference eval_base_sim.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli eval-burgers --data data/1d --exp base_sim --task sim \
    --ntest 8000 --batch_eval 200 --ddim_steps 50 --ddim_eta 1
