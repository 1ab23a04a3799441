#!/usr/bin/env bash
# R5-S3: regenerate a smoke TRAINING split for the super-model round
# (the r4 10k-scene split was wiped with the sandbox).  2500 scenes at the
# training stride — a deliberate reduced-budget choice: datagen+prep+train
# must all fit in this final round, and the super model (VERDICT r4
# missing #1: ZERO quality evidence) outranks dataset scale.  Chunked
# parts of 500 for crash recovery (scenes are pure (seed, index)
# functions, identical to the first 2500 of the reference-scale split).
. "$(dirname "$0")/../r3_lib.sh"
[ -e data/2d/train.npz ] && exit 0
N=2500; PER=500
re=$(round_end_epoch)
# whole-stage gate: a training split is only useful if prep (~25 min) and a
# meaningful train window (~25 min) still fit ahead of the eval/export
# tails — otherwise skip the smoke-training block entirely
if [ -n "$re" ] && [ "$(( re - $(date +%s) ))" -lt 7000 ]; then
  echo "[r5] <117 min left: smoke train-datagen block not worth starting"
  exit 0
fi
for ((s = 0; s < N; s += PER)); do
  [ -e "data/2d/train_part${s}.npz" ] && continue
  # deadline-aware: every generated part is usable, so when the remaining
  # window no longer covers prep+train+eval tails (~95 min), stop here and
  # merge what exists rather than starving the training stages
  if [ -n "$re" ] && [ "$s" -ge "$PER" ] && \
     [ "$(( re - $(date +%s) ))" -lt 5700 ]; then
    echo "[r5] datagen cut short at $s scenes (round-end window)"
    break
  fi
  wait_for_tpu
  timeout 3600 python -m wdno_tpu.cli datagen-smoke --out data/2d \
      --split train --n $PER --start $s --part \
      --record_stride 8 --record_res 64 || exit 1
done
python -m wdno_tpu.cli merge-smoke-data --data data/2d --split train --remove_parts
[ -e data/2d/train.npz ] || { echo "[r5] train datagen failed"; exit 1; }
