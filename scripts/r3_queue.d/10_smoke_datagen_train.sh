#!/usr/bin/env bash
# S1: smoke train scenes (10k = 50% of the reference's 20k budget,
# VERDICT r2 #2) in restartable 2000-scene parts.
. "$(dirname "$0")/../r3_lib.sh"
N_TRAIN=${N_TRAIN:-10000}
PART=${PART:-2000}
[ -e data/2d/train.npz ] && exit 0
for ((s = 0; s < N_TRAIN; s += PART)); do
  if [ -e "data/2d/train_part${s}.npz" ]; then
    echo "[r3] part $s exists, skipping"; continue
  fi
  ok=0
  for attempt in 1 2 3 4; do
    wait_for_tpu
    if timeout 5400 python -m wdno_tpu.cli datagen-smoke --n "$PART" \
        --start "$s" --part --split train --out data/2d; then
      ok=1; break
    fi
    echo "[r3] part $s attempt $attempt FAILED"; sleep 30
  done
  [ "$ok" = 1 ] || { echo "[r3] S1 part $s giving up"; exit 1; }
done
python -m wdno_tpu.cli merge-smoke-data --data data/2d --split train --remove_parts
