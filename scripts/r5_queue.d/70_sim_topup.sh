#!/usr/bin/env bash
# R5-S7: soak any remaining chip time into the base-SIM model's reference
# budget (step ~52.5k of 200k, /root/reference/scripts/smoke/
# train_base_sim.sh) on the level-0 streaming reservoir.  Resumes from the
# imported r4 export; periodic exports mean a round-end kill loses <30 min.
. "$(dirname "$0")/../r3_lib.sh"
SRC=data/2d/coef_bior1.3_zero_space_train.npz
[ -e "$SRC" ] || { echo "[r5] no level-0 coef blob; skipping"; exit 0; }
gate_model base_sim_smoke || exit 0
re=$(round_end_epoch)
if [ -n "$re" ]; then
  DEADLINE_EPOCH=$(( re - 900 ))
else
  DEADLINE_EPOCH=$(( $(date +%s) + 3600 ))
fi
if [ "$(( DEADLINE_EPOCH - $(date +%s) ))" -lt 900 ]; then
  echo "[r5] <15 min left; skipping sim top-up"; exit 0
fi
export WDNO_REFRESH_GB=${WDNO_REFRESH_GB:-40}
train_to base_sim_smoke train-smoke --ema_only 200000 --data data/2d \
    --condition_control True
