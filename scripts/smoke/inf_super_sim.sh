#!/usr/bin/env bash
# Zero-shot spatial super-resolution inference (reference inf_super_sim.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli eval-smoke --data data/2d --exp base_sim --task sim \
    --split test128 --super_exp super_sim --upsample 1 \
    --ntest 100 --batch_eval 25 --ddim_steps 100 --ddim_eta 1
