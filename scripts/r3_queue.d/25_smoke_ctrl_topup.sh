#!/usr/bin/env bash
# R4-S1b: top-up window for the control model — round-4's bench A/B runs and
# compile-warm contention cost stage 20 ~55 min of its window; this stage
# buys the difference back so the eval'd model crosses ~100k steps (50% of
# the 200k reference budget), with a hard stop at round_end-7h to protect
# the remaining stages.
. "$(dirname "$0")/../r3_lib.sh"
re=$(round_end_epoch)
if [ -n "$re" ]; then
  DEADLINE_EPOCH=$(( re - 25200 ))
else
  DEADLINE_EPOCH=$(( $(date +%s) + 2400 ))
fi
if [ "$(( DEADLINE_EPOCH - $(date +%s) ))" -lt 600 ]; then
  echo "[r4] no top-up window; skipping"; exit 0
fi
export WDNO_REFRESH_GB=${WDNO_REFRESH_GB:-15}
train_to base_control_smoke train-smoke --ema_only 200000 --data data/2d
