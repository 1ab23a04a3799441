#!/usr/bin/env bash
# Stage 2 of the full-budget Burgers campaign: reference-protocol evals on
# the 100k-step base model, then super-model training + zero-shot SR chain.
set -e
cd "$(dirname "$0")/.."
echo "[stage2] eval base sim (DDIM-50, Ntest=8000) $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli eval-burgers --data data/1d --exp base_sim_full --task sim \
    --ntest 8000 --batch_eval 200 --ddim_steps 50 --ddim_eta 1
echo "[stage2] train super (60k of reference 250k) $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli train-burgers --data data/1d --exp super_sim_full \
    --super_model True --dim 64 --steps 60000 --overwrite
echo "[stage2] eval SR chain (3 doublings, Ntest=200) $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli eval-burgers --data data/1d --exp base_sim_full --task sim \
    --ntest 200 --batch_eval 50 --ddim_steps 50 --ddim_eta 1 \
    --super_exp super_sim_full --upsample 3
echo "[stage2] done $(date -u +%H:%M:%S)"
