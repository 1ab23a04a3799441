#!/usr/bin/env bash
# S4: smoke base-control training (wavelet, time-downsample) toward
# STEPS_SMOKE — 100k = 50% of the reference's 200k budget
# (/root/reference/smoke/train_2d.py:37-39).  Bounded by a stage deadline so
# the eval + Burgers stages behind it always get chip time; the periodic
# export in watched_attempt persists every ~30 min of progress.
. "$(dirname "$0")/../r3_lib.sh"
STEPS_SMOKE=${STEPS_SMOKE:-100000}
DEADLINE_EPOCH=$(( $(date +%s) + ${SMOKE_TRAIN_BUDGET_S:-16200} ))
train_to base_control_smoke train-smoke --ema_only "$STEPS_SMOKE" --data data/2d
