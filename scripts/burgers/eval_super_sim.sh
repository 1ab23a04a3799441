#!/usr/bin/env bash
# Zero-shot super-resolution eval: 3 doublings (reference eval_super_sim.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli eval-burgers --data data/1d --exp base_sim --task sim \
    --super_exp super_sim --super_data data/1d_super/test.npz --upsample 3 \
    --ntest 200 --batch_eval 5 --ddim_steps 50 --ddim_eta 1
