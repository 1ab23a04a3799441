#!/usr/bin/env bash
# S4: smoke base-control training (wavelet, time-downsample) toward
# STEPS_SMOKE — 100k = 50% of the reference's 200k budget
# (/root/reference/smoke/train_2d.py:37-39).  Bounded by a stage deadline so
# the eval + Burgers stages behind it always get chip time; the periodic
# export in watched_attempt persists every ~30 min of progress.
. "$(dirname "$0")/../r3_lib.sh"
STEPS_SMOKE=${STEPS_SMOKE:-100000}
# 3.5 h budget: at the measured ~7 steps/s this is ~85-100k steps; the
# deadline guarantees the guided eval + Burgers super stages behind it get
# chip time before round end (the r2 failure mode was a starved queue tail).
# Also capped at round_end - 80 min so the 50-scene guided eval (S5) always
# fits even when datagen ate more of the round than planned.
DEADLINE_EPOCH=$(( $(date +%s) + ${SMOKE_TRAIN_BUDGET_S:-12600} ))
re=$(round_end_epoch)
if [ -n "$re" ]; then
  cap=$(( re - 4800 ))
  [ "$cap" -lt "$DEADLINE_EPOCH" ] && DEADLINE_EPOCH=$cap
fi
# the r3 failure mode: without this cache the trainer rebuilds it through
# the TPU tunnel and burns the whole stage window before step 1 — insist
# that stage 27 (CPU states prep) ran first
if [ ! -e data/2d/states_bior1.3_zero_time_base_lvl0.npy ]; then
  echo "[r3] states cache missing — run stage 27 (CPU prep) first"; exit 1
fi
train_to base_control_smoke train-smoke --ema_only "$STEPS_SMOKE" --data data/2d
