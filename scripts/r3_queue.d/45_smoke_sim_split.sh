#!/usr/bin/env bash
# R4-S4b: generate a dedicated SIM test split (reference inf_base_sim.sh
# scores 2000 sims from the test stream, /root/reference/smoke/ddpm/
# data_2d.py:43-52).  test.npz holds only the 50 stride-1 control scenes,
# so the sim metric would otherwise run on 50 scenes.  200 scenes at the
# TRAINING record stride (8 -> 33 frames @ 64^2, ~105 MB), drawn from the
# test seed stream at indices 50.. (disjoint from both train and the
# control test scenes; scenes are pure functions of (seed, index)).
# ~4-6 min on chip at the measured ~1 s/scene.
. "$(dirname "$0")/../r3_lib.sh"
[ -e data/2d/test_sim.npz ] && exit 0
wait_for_tpu
timeout 3600 python -m wdno_tpu.cli datagen-smoke --out data/2d \
    --split test_sim --n 200 --start 50 --record_stride 8 --record_res 64
[ -e data/2d/test_sim.npz ] || { echo "[r4] sim split datagen failed"; exit 1; }
