#!/usr/bin/env bash
# Stage 2b of the full-budget Burgers campaign: super-model training toward
# the reference's 250k-step budget with crash/tunnel-outage recovery, then
# the zero-shot SR chain eval against the separately generated high-res
# test set.  Waits for a running chunked base-sim eval (scripts/
# eval_base_sim_chunked.sh) to release the chip first.
cd "$(dirname "$0")/.."
STEPS=${STEPS:-250000}
SR_NTEST=${SR_NTEST:-200}
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

EVAL_PID=$(cat /tmp/eval_chunks.pid 2>/dev/null || true)
while [ -n "$EVAL_PID" ] && kill -0 "$EVAL_PID" 2>/dev/null; do
  echo "[stage2b] waiting for eval loop (pid $EVAL_PID) $(date -u +%H:%M:%S)"
  sleep 120
done

echo "[stage2b] train super_sim_full to $STEPS steps $(date -u +%H:%M:%S)"
first=1
while true; do
  wait_for_tpu
  flags="--resume"
  if [ "$first" = 1 ] && [ ! -d results/super_sim_full ]; then
    flags="--overwrite"
  fi
  first=0
  if timeout 21600 python -m wdno_tpu.cli train-burgers --data data/1d \
      --exp super_sim_full --super_model True --dim 64 --steps "$STEPS" \
      $flags; then
    break
  fi
  echo "[stage2b] training interrupted $(date -u +%H:%M:%S); resuming"
  sleep 30
done

echo "[stage2b] SR chain eval ($SR_NTEST samples, 3 doublings) $(date -u +%H:%M:%S)"
for ((s = 0; s < SR_NTEST; s += 50)); do
  if [ -e "results/base_sim_full/eval_raw_sim_sr_${s}.npz" ]; then
    echo "[sr chunk $s] already done, skipping"
    continue
  fi
  for attempt in 1 2 3; do
    wait_for_tpu
    if timeout 3000 python -m wdno_tpu.cli eval-burgers --data data/1d \
        --exp base_sim_full --task sim --start "$s" --ntest 50 \
        --batch_eval 50 --ddim_steps 50 --ddim_eta 1 \
        --super_exp super_sim_full --upsample 3; then
      break
    fi
    echo "[sr chunk $s] attempt $attempt FAILED"
    sleep 30
  done
done
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_full --task sim_sr || true
echo "[stage2b] done $(date -u +%H:%M:%S)"
