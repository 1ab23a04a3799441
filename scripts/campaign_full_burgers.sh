#!/usr/bin/env bash
# Full reference-budget Burgers base-sim campaign on one chip:
# 40k train + 8k test trajectories, wavelet prep, 100k-step training
# (reference scripts/burgers/burgers_data.sh + train_base_sim.sh budgets).
set -e
cd "$(dirname "$0")/.."
mkdir -p results
echo "[campaign] datagen base $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli datagen-burgers --out data/1d
echo "[campaign] datagen super-res test set $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli datagen-burgers --n_train 0 --n_test 200 --nt 640 --nx 960 --out data/1d_super
echo "[campaign] prep $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli prep-burgers --data data/1d
echo "[campaign] train base_sim 100k $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli train-burgers --data data/1d --exp base_sim_full --overwrite
echo "[campaign] done $(date -u +%H:%M:%S)"
