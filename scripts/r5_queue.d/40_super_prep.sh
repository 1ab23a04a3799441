#!/usr/bin/env bash
# R5-S4: DWT prep of the 2500-scene split, SPACE family, all three levels
# (reference wave_trans_2d.py:61-189 preps 3 space downsamplings).  At
# this scale all levels fit in one standard blob (~11 GB) — no
# supplemental _lvlA-B file needed (that machinery existed because the
# 10k level-0 blob alone was 33 GB).  Serves both the super train stage
# (levels 0..2) and the base-sim streaming top-up (level 0).
. "$(dirname "$0")/../r3_lib.sh"
OUT=data/2d/coef_bior1.3_zero_space_train.npz
[ -e "$OUT" ] && exit 0
wait_for_tpu
timeout 7200 python -m wdno_tpu.cli prep-smoke --data data/2d \
    --split train --types space --n_downsample 3
[ -e "$OUT" ] || { echo "[r5] super prep produced no npz"; exit 1; }
