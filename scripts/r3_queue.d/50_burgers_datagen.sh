#!/usr/bin/env bash
# B1: Burgers data regen (40k/8k, + 200-traj 16x-resolution SR test set)
# and wavelet prep (/root/reference/scripts/burgers/burgers_data.sh:1-16).
. "$(dirname "$0")/../r3_lib.sh"
SR_NTEST=${SR_NTEST:-200}
if [ ! -e data/1d/train.npz ]; then
  wait_for_tpu
  python -m wdno_tpu.cli datagen-burgers --out data/1d
fi
if [ ! -e data/1d_super/test.npz ]; then
  wait_for_tpu
  python -m wdno_tpu.cli datagen-burgers --n_train 0 --n_test "$SR_NTEST" \
      --nt 640 --nx 960 --out data/1d_super
fi
ls data/1d | grep -q coef || {
  wait_for_tpu
  python -m wdno_tpu.cli prep-burgers --data data/1d
}
# import the committed base_sim model for the SR chain (B2)
[ -d results/base_sim_full ] || \
  python -m wdno_tpu.cli import-ckpt --exp base_sim_full \
      --npz artifacts/base_sim_full.npz --milestone final
