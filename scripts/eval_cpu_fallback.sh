#!/usr/bin/env bash
# CPU fallback for the reference-protocol base-sim eval: while the TPU
# tunnel is down, chip away at the reserved sample range [7000, 8000) on
# the host (same checkpoint, same DDIM-50 protocol — just slower hardware).
# The TPU chunk loop owns [0, 7000); a placeholder at start 7000 keeps it
# out of this range, so aggregate-eval never double-counts a sample.
cd "$(dirname "$0")/.."
CHUNK=${CHUNK:-50}
for ((s = 7000; s < 8000; s += CHUNK)); do
  f="results/base_sim_full/eval_raw_sim_${s}.npz"
  # skip real chunks; the start-7000 placeholder is empty and gets redone
  if [ -e "$f" ] && python -c "
import numpy as np, sys
sys.exit(0 if len(np.load('$f').files) else 1)"; then
    echo "[cpu chunk $s] already done, skipping"
    continue
  fi
  echo "[cpu chunk $s] $(date -u +%H:%M:%S)"
  WDNO_PLATFORM=cpu nice -n 10 timeout 7200 python -m wdno_tpu.cli \
      eval-burgers --data data/1d --exp base_sim_full --task sim \
      --start "$s" --ntest "$CHUNK" --batch_eval 25 \
      --ddim_steps 50 --ddim_eta 1 || echo "[cpu chunk $s] FAILED"
done
echo "[cpu eval] range done $(date -u +%H:%M:%S)"
