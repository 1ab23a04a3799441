#!/usr/bin/env bash
# R4-S6: train the smoke SUPER model (82-channel refinement, space
# downsample; /root/reference/scripts/smoke/train_super_sim.sh budget is
# 300k steps — this stage takes whatever window remains and exports at the
# boundary so later rounds resume).  Trains levels 0..1, each conditioned
# on the next coarser level (needs coef levels 0..2: level 0 from the
# streaming blob + supplemental _lvl1-2 npz from stage 35).
# max_train_samples=2000 caps the materialized per-level states caches at
# ~33 GB disk (20% of the split; recorded honestly in RESULTS.md).
. "$(dirname "$0")/../r3_lib.sh"
SUP=data/2d/coef_bior1.3_zero_space_lvl1-2_train.npz
[ -e "$SUP" ] || { echo "[r4] no supplemental super levels; skipping"; exit 0; }
re=$(round_end_epoch)
if [ -n "$re" ]; then
  DEADLINE_EPOCH=$(( re - 3300 ))
else
  DEADLINE_EPOCH=$(( $(date +%s) + 4200 ))
fi
if [ "$(( DEADLINE_EPOCH - $(date +%s) ))" -lt 1500 ]; then
  echo "[r4] <25 min left for smoke super; skipping"; exit 0
fi
free_gb=$(df --output=avail -BG data | tail -1 | tr -dc 0-9)
if [ "$free_gb" -lt 36 ]; then
  echo "[r4] only ${free_gb} GB free; smoke super states need ~33 GB"; exit 1
fi
export WDNO_REFRESH_GB=${WDNO_REFRESH_GB:-20}
# Build the per-level states caches in a throwaway process first: the
# chunked build moves ~25 GB through the tunnel client, ~95% of which
# leaks into that process's RSS for its lifetime — the trainer must not
# inherit it.
if [ ! -e data/2d/states_bior1.3_zero_space_super_n2000_lvl0.npy ]; then
  wait_for_tpu
  timeout 3600 python -m wdno_tpu.cli train-smoke --data data/2d \
      --exp super_smoke_states --super_model True --condition_control True \
      --n_downsample 2 --max_train_samples 2000 --states_only --overwrite \
      || exit 1
  rm -rf results/super_smoke_states
fi
train_to super_smoke train-smoke --ema_only 300000 --data data/2d \
    --super_model True --condition_control True --n_downsample 2 \
    --max_train_samples 2000
