#!/usr/bin/env bash
# R4-S7 (time-permitting tail): resume the Burgers super model (40k of the
# 250k reference budget, /root/reference/scripts/burgers/train_super_sim.sh)
# with whatever chip time remains; exports + commits at the boundary so the
# next round resumes instead of restarting.
. "$(dirname "$0")/../r3_lib.sh"
re=$(round_end_epoch)
if [ -n "$re" ]; then
  DEADLINE_EPOCH=$(( re - 1500 ))
else
  DEADLINE_EPOCH=$(( $(date +%s) + 1800 ))
fi
if [ "$(( DEADLINE_EPOCH - $(date +%s) ))" -lt 900 ]; then
  echo "[r4] <15 min left; not worth a super resume"; exit 0
fi
train_to super_sim_full train-burgers --ema_only 250000 --data data/1d \
    --super_model True --dim 64
