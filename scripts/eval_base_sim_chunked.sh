#!/usr/bin/env bash
# Reference-protocol base-sim eval (Ntest=8000) in recoverable chunks:
# each chunk is bounded by a timeout and retried once, so a tunnel stall
# costs one chunk, not the whole run.
cd "$(dirname "$0")/.."
CHUNK=${CHUNK:-1000}
NTEST=${NTEST:-8000}
for ((s = 0; s < NTEST; s += CHUNK)); do
  ok=0
  for attempt in 1 2; do
    echo "[chunk $s] attempt $attempt $(date -u +%H:%M:%S)"
    if timeout 2400 python -m wdno_tpu.cli eval-burgers --data data/1d \
        --exp base_sim_full --task sim --start "$s" --ntest "$CHUNK" \
        --batch_eval 200 --ddim_steps 50 --ddim_eta 1; then
      ok=1
      break
    fi
    echo "[chunk $s] attempt $attempt FAILED"
    sleep 30
  done
  [ "$ok" = 1 ] || echo "[chunk $s] giving up"
done
echo "[eval] all chunks done $(date -u +%H:%M:%S)"
