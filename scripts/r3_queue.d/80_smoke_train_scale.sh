#!/usr/bin/env bash
# R5-ready (tail, almost certainly skipped in r4): close the data gap —
# generate the SECOND 10k train scenes (reference n_simu=20000,
# /root/reference/smoke/ddpm/data_2d.py:44; we train on 10k) as part
# files, then prep their level-0 coefficients and extend the streaming
# blob.  ~2.6 h chip for datagen alone, so this only runs when everything
# above is done and >3 h remain — in practice, round 5.
. "$(dirname "$0")/../r3_lib.sh"
re=$(round_end_epoch)
if [ -n "$re" ] && [ "$(( re - $(date +%s) ))" -lt 11000 ]; then
  echo "[r4] <3 h to round end; leaving the 20k-scene datagen for next round"
  exit 0
fi
wait_for_tpu
for s in 10000 12500 15000 17500; do
  [ -e "data/2d/train_part${s}.npz" ] && continue
  timeout 7200 python -m wdno_tpu.cli datagen-smoke --out data/2d \
      --split train --n 2500 --start "$s" --part || exit 1
done
echo "[r4] second 10k scenes generated as parts; prep + merge in r5"
