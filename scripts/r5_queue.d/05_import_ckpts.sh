#!/usr/bin/env bash
# R5-S0: the sandbox was reset between rounds — data/ and results/ are gone;
# the five trained models survive only as committed export-ckpt npz blobs
# under artifacts/ (this is exactly the persistence path import-ckpt was
# built for).  Recreate evaluable/resumable experiments on the host CPU
# before any chip stage runs.
. "$(dirname "$0")/../r3_lib.sh"
for exp in base_sim_smoke base_control_smoke super_smoke super_sim_full base_sim_full base_control_full; do
  [ -e "results/$exp/config.json" ] && continue
  [ -e "artifacts/$exp.npz" ] || { echo "[r5] no artifacts/$exp.npz; skipping"; continue; }
  WDNO_PLATFORM=cpu timeout 900 python -m wdno_tpu.cli import-ckpt \
      --npz "artifacts/$exp.npz" --exp "$exp" || echo "[r5] import $exp FAILED"
done
gate_model base_sim_smoke || exit 1
