#!/usr/bin/env bash
# Simulation inference: DDIM 100 eta 1 (reference inf_base_sim.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli eval-smoke --data data/2d --exp base_sim --task sim \
    --split test128 --ntest 100 --batch_eval 25 --ddim_steps 100 --ddim_eta 1
