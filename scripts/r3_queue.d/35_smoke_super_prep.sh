#!/usr/bin/env bash
# R4-S3: prep the smoke SUPER family's space-downsampled coefficient levels
# (VERDICT r3 missing #2 — the only reference config with no training data).
# The reference preps 3 space downsamplings (wave_trans_2d.py:61-189); our
# level 0 already exists as the 33 GB streaming blob, so prep-smoke --levels
# writes ONLY levels 1,2 into a supplemental npz (~11 GB) — there is not
# enough free disk to rewrite level 0.  Afterwards the raw train split is
# deleted (27 GB): prep was its last reader, datagen-smoke regenerates it in
# ~2.6 h on chip if ever needed, and the super states caches need the room.
. "$(dirname "$0")/../r3_lib.sh"
SUP=data/2d/coef_bior1.3_zero_space_lvl1-2_train.npz
if [ ! -e "$SUP" ]; then
  free_gb=$(df --output=avail -BG data | tail -1 | tr -dc 0-9)
  if [ "$free_gb" -lt 14 ]; then
    echo "[r4] only ${free_gb} GB free; not starting super prep"; exit 1
  fi
  wait_for_tpu
  timeout 7200 python -m wdno_tpu.cli prep-smoke --data data/2d \
      --types space --levels 1,2
fi
[ -e "$SUP" ] || { echo "[r4] super prep produced no npz"; exit 1; }
if [ -e data/2d/train.npz ]; then
  echo "[r4] super levels prepped; deleting raw train split (27 GB) for states room"
  rm data/2d/train.npz
fi
