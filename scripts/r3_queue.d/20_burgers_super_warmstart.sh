#!/usr/bin/env bash
# B2: Burgers super-resolution model toward 250k steps
# (/root/reference/scripts/burgers/train_super_sim.sh:1-11) — time-boxed to
# ~65 min: it soaks the chip while the smoke streaming loader lands, then
# yields to the smoke campaign (the round's priority per VERDICT #2).  The
# model exports+commits at the boundary, so a later soak stage (or the next
# round) resumes it instead of restarting (this model has been lost twice).
. "$(dirname "$0")/../r3_lib.sh"
STEPS_SUPER=${STEPS_SUPER:-250000}
DEADLINE_EPOCH=$(( $(date +%s) + ${SUPER_WARM_BUDGET_S:-3900} ))
re=$(round_end_epoch)
if [ -n "$re" ]; then
  cap=$(( re - 16200 ))   # never eat into the >=4.5 h smoke window
  [ "$cap" -lt "$DEADLINE_EPOCH" ] && DEADLINE_EPOCH=$cap
fi
if [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; then
  echo "[r3] no warm-start window for burgers super; skipping"; exit 0
fi
train_to super_sim_full train-burgers --ema_only "$STEPS_SUPER" --data data/1d \
    --super_model True --dim 64
