#!/usr/bin/env bash
# S4: smoke base-control training (unconditioned, "time" downsample) toward
# the full reference schedule of 200k steps
# (/root/reference/smoke/train_2d.py:37-39) — wall-clock-capped so the
# 50-scene guided eval + the sim model always get chip time.  Input is the
# streaming device-resident reservoir over the level-0 coef npz (no 64 GB
# states cache, no per-step tunnel transfers — the tunnel client leaks ~95%
# of every h2d byte into host RSS, so the refresh traffic is budgeted).
. "$(dirname "$0")/../r3_lib.sh"
re=$(round_end_epoch)
if [ -n "$re" ]; then
  DEADLINE_EPOCH=$(( re - 10200 ))   # leave eval (~25 min) + sim train+eval
else
  DEADLINE_EPOCH=$(( $(date +%s) + 10800 ))
fi
# ~3 h window: 55 GB of refresh traffic (leaked into RSS by the tunnel
# client; the 125 GB host absorbs it for one process lifetime) cycles the
# full 10k-scene split >2x through the reservoir
export WDNO_REFRESH_GB=${WDNO_REFRESH_GB:-55}
train_to base_control_smoke train-smoke --ema_only 200000 --data data/2d
