#!/usr/bin/env bash
# R4-S4: smoke base-SIM model — conditioned on control, "space" downsample
# (/root/reference/smoke/train_2d.py:60) — on the same streaming reservoir
# (level-0 train coefficients are downsample-invariant; the conditioning
# difference lives in smoke_spec).  Wall-capped at round_end-3h so its
# eval + the smoke super train always fit before round end.
. "$(dirname "$0")/../r3_lib.sh"
re=$(round_end_epoch)
if [ -n "$re" ]; then
  DEADLINE_EPOCH=$(( re - 10800 ))
else
  DEADLINE_EPOCH=$(( $(date +%s) + 5400 ))
fi
if [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; then
  echo "[r4] no time left for the smoke sim model this round"; exit 0
fi
export WDNO_REFRESH_GB=${WDNO_REFRESH_GB:-40}
train_to base_sim_smoke train-smoke --ema_only 200000 --data data/2d \
    --condition_control True
