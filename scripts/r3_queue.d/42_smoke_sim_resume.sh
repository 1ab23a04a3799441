#!/usr/bin/env bash
# R5-S1: resume the smoke base-SIM model toward the FULL 200k reference
# budget (/root/reference/scripts/smoke/train_base_sim.sh).  Stage 40's
# DEADLINE_EPOCH was baked from the r4 round_end at stage start, so it
# stops the trainer hours before the r5 round end; this stage recomputes
# the deadline from the extended logs/round_end and simply resumes.
# Reserve 4.5 h for the downstream stages: sim split (~10 min), 200-scene
# sim eval (~1.5 h), smoke super train (>=1.5 h for a first SR-capable
# model), SR-chain eval (~40 min), slack.
. "$(dirname "$0")/../r3_lib.sh"
re=$(round_end_epoch)
if [ -n "$re" ]; then
  DEADLINE_EPOCH=$(( re - 16200 ))
else
  DEADLINE_EPOCH=$(( $(date +%s) + 5400 ))
fi
if [ "$(( DEADLINE_EPOCH - $(date +%s) ))" -lt 600 ]; then
  echo "[r5] <10 min left in the sim-train window; moving on"; exit 0
fi
export WDNO_REFRESH_GB=${WDNO_REFRESH_GB:-40}
train_to base_sim_smoke train-smoke --ema_only 200000 --data data/2d \
    --condition_control True
