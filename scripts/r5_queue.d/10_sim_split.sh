#!/usr/bin/env bash
# R5-S1: regenerate the dedicated SIM test split (reference inf_base_sim.sh
# scores sims drawn from the test stream, /root/reference/smoke/ddpm/
# data_2d.py:43-52).  200 scenes at the TRAINING record stride (8 -> 33
# frames @ 64^2), test seed stream indices 50.. (disjoint from train and
# from the 50 control test scenes; scenes are pure functions of
# (seed, index), so this reproduces the r4 split bit-for-bit).
. "$(dirname "$0")/../r3_lib.sh"
[ -e data/2d/test_sim.npz ] && exit 0
wait_for_tpu
timeout 3600 python -m wdno_tpu.cli datagen-smoke --out data/2d \
    --split test_sim --n 200 --start 50 --record_stride 8 --record_res 64
[ -e data/2d/test_sim.npz ] || { echo "[r5] sim split datagen failed"; exit 1; }
