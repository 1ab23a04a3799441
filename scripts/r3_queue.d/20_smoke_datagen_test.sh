#!/usr/bin/env bash
# S2: 50-scene control test set (256 frames, stride 1) — reference protocol
# (/root/reference/smoke/ddpm/data_2d.py:43-52, n_simu control = 50).
. "$(dirname "$0")/../r3_lib.sh"
[ -e data/2d/test.npz ] && exit 0
wait_for_tpu
timeout 5400 python -m wdno_tpu.cli datagen-smoke --n 50 --split test \
    --record_stride 1 --out data/2d
