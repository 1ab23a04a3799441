#!/usr/bin/env bash
# S3b: memory-safe train-split prep. The original stage's train prep was
# OOM-killed (build_smoke_coef materialized the full [10000,5,32,64,64]
# stack plus all three per-level coefficient arrays; ~90+ GB host RSS) and
# the stage was still stamped .done because its rc came from the test-split
# prep. This stage preps ONLY level 0 for the train split (the base models
# train on level 0 only) and hardlinks the time/space names — level 0 of
# "time" and "space" downsampling are the identical undownsampled DWT.
. "$(dirname "$0")/../r3_lib.sh"
while [ ! -e logs/prep_fix_ready ]; do
  echo "[r3] 26_smoke_prep_train waiting for prep fix"; sleep 20
done
t_out=data/2d/coef_bior1.3_zero_time_train.npz
s_out=data/2d/coef_bior1.3_zero_space_train.npz
if [ ! -e "$t_out" ]; then
  wait_for_tpu
  python -m wdno_tpu.cli prep-smoke --data data/2d --split train \
      --n_downsample 1 --types time || exit 1
fi
[ -e "$s_out" ] || ln "$t_out" "$s_out"
ls -la data/2d/
