#!/usr/bin/env bash
# Reference-protocol base-sim eval (Ntest=8000) in recoverable chunks:
# each chunk is bounded by a timeout and retried, so a tunnel stall costs
# one chunk, not the whole run.  Before every attempt we probe the TPU with
# a cheap bounded check and wait until it answers — an eval attempt spends
# ~20 min loading the coefficient blobs before its first device op, so
# starting one against a dead tunnel wastes half an hour per retry.
cd "$(dirname "$0")/.."
CHUNK=${CHUNK:-1000}
NTEST=${NTEST:-8000}
START=${START:-0}
PROBE_SLEEP=${PROBE_SLEEP:-120}

wait_for_tpu() {
  while true; do
    if timeout 90 python -c "import jax; d = jax.devices()[0]; print('tpu ok:', d)"; then
      return 0
    fi
    echo "[probe] TPU unavailable $(date -u +%H:%M:%S); retrying in ${PROBE_SLEEP}s"
    sleep "$PROBE_SLEEP"
  done
}

for ((s = START; s < NTEST; s += CHUNK)); do
  if [ -e "results/base_sim_full/eval_raw_sim_${s}.npz" ]; then
    echo "[chunk $s] already done, skipping"
    continue
  fi
  ok=0
  for attempt in 1 2 3; do
    wait_for_tpu
    echo "[chunk $s] attempt $attempt $(date -u +%H:%M:%S)"
    if timeout 3000 python -m wdno_tpu.cli eval-burgers --data data/1d \
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
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_full --task sim || true
