#!/usr/bin/env bash
# R4-S1: resume smoke base-control training (unconditioned, "time"
# downsample) toward the full reference schedule of 200k steps
# (/root/reference/smoke/train_2d.py:37-39).  Resumes from step ~22k
# (round-3 continuation).  Wall-capped at round_end-8h so the control
# eval, the sim model+eval, and the smoke super family all get chip time
# (VERDICT r3 #1).  Input: streaming device-resident reservoir over the
# level-0 coef npz; refresh traffic byte-budgeted (the tunnel client leaks
# ~95% of h2d bytes into host RSS for the process lifetime).
. "$(dirname "$0")/../r3_lib.sh"
re=$(round_end_epoch)
if [ -n "$re" ]; then
  DEADLINE_EPOCH=$(( re - 28800 ))
else
  DEADLINE_EPOCH=$(( $(date +%s) + 10800 ))
fi
if [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; then
  echo "[r4] control-train window already past; skipping"; exit 0
fi
export WDNO_REFRESH_GB=${WDNO_REFRESH_GB:-55}
train_to base_control_smoke train-smoke --ema_only 200000 --data data/2d
