#!/usr/bin/env bash
# R5-S2a: minimal Burgers datasets for the two protocol evals below.
# The test stream is seeded independently of n_train (cli.py:
# cmd_datagen_burgers uses seed+1 and global trajectory indices), so a
# small regen reproduces the reference-protocol test trajectories
# bit-for-bit; train.npz only feeds the coef-shape probe in eval-burgers,
# so 256 trajectories suffice.  The 641x960 hi-res test (200 trajectories,
# reference burgers_data.sh second line) is the SR-chain ground truth.
. "$(dirname "$0")/../r3_lib.sh"
set -e
if [ ! -e data/1d/test.npz ]; then
  wait_for_tpu
  timeout 1800 python -m wdno_tpu.cli datagen-burgers \
      --n_train 256 --n_test 256 --out data/1d
fi
if ! ls data/1d/coef_*.npz >/dev/null 2>&1; then
  timeout 1800 python -m wdno_tpu.cli prep-burgers --data data/1d
fi
if [ ! -e data/1d_super/test.npz ]; then
  wait_for_tpu
  timeout 3600 python -m wdno_tpu.cli datagen-burgers \
      --n_train 0 --n_test 200 --nt 640 --nx 960 --out data/1d_super
fi
