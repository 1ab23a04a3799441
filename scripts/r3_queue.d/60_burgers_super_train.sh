#!/usr/bin/env bash
# B3: Burgers super-resolution model toward 250k steps
# (/root/reference/scripts/burgers/train_super_sim.sh:1-11).  Deadline-bounded
# so B4 (the SR-chain eval) always runs before round end; the periodic
# export persists every ~30 min (this model has been lost twice — VERDICT #3).
. "$(dirname "$0")/../r3_lib.sh"
STEPS_SUPER=${STEPS_SUPER:-250000}
re=$(round_end_epoch)
if [ -n "$re" ]; then
  # leave 50 min for the SR-chain eval
  DEADLINE_EPOCH=$(( re - 3000 ))
else
  DEADLINE_EPOCH=$(( $(date +%s) + 7200 ))
fi
train_to super_sim_full train-burgers --ema_only "$STEPS_SUPER" --data data/1d \
    --super_model True --dim 64
