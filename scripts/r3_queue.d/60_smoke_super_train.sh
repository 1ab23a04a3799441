#!/usr/bin/env bash
# R4-S6: train the smoke SUPER model (82-channel refinement, space
# downsample; /root/reference/scripts/smoke/train_super_sim.sh budget is
# 300k steps — this stage takes whatever window remains and exports at the
# boundary so later rounds resume).  Trains levels 0..1, each conditioned
# on the next coarser level (coef level 0 from the streaming blob +
# supplemental _lvl1-2 npz from stage 35).
#
# Input: the r4 STREAMING aligned-slab reservoirs (level-l target +
# level-l+1 condition gathered per scene, 82-channel states built in the
# jitted gather) — the FULL 10k-scene split with zero states-cache disk;
# parity with the materialized path is pinned by
# tests/test_streaming_loader.py and the slow CLI pipeline test.
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
# two reservoirs share HBM/refresh budgets, split ~4:1 by row bytes
export WDNO_RESERVOIR_GB=${WDNO_RESERVOIR_GB:-6}
export WDNO_REFRESH_GB=${WDNO_REFRESH_GB:-18}
train_to super_smoke train-smoke --ema_only 300000 --data data/2d \
    --super_model True --condition_control True --n_downsample 2
