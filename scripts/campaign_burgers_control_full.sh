#!/usr/bin/env bash
# Final stage of the full-budget campaign: Burgers CONTROL at the reference
# protocol (train_base_control.sh: separate model conditioned on u0+uT,
# 100k steps; eval_base_control.sh: wu=120000 wf=2e-5 cosine J-scheduler,
# DDIM-50 eta 1).  Waits for the whole existing chain (eval_chunks ->
# stage2b -> stage3b -> stage_h) to release the chip, probes the TPU before
# every chip-bound step, and resumes training across tunnel outages.
# Evaluation is chunked (50-sample raws) so a crash costs one chunk;
# aggregate-eval combines them exactly.
cd "$(dirname "$0")/.."
STEPS=${STEPS:-100000}
NTEST=${NTEST:-200}
CHUNK=${CHUNK:-50}
PROBE_SLEEP=${PROBE_SLEEP:-120}
EXP=base_control_full

wait_for_tpu() {
  while true; do
    if timeout 90 python -c "import jax; d = jax.devices()[0]; print('tpu ok:', d)"; then
      return 0
    fi
    echo "[ctrl] TPU unavailable $(date -u +%H:%M:%S); retrying in ${PROBE_SLEEP}s"
    sleep "$PROBE_SLEEP"
  done
}

for pidfile in /tmp/eval_chunks.pid /tmp/stage2b.pid /tmp/stage3b.pid /tmp/stage_h_runner.pid; do
  while kill -0 "$(cat $pidfile 2>/dev/null)" 2>/dev/null; do
    echo "[ctrl] waiting on $pidfile $(date -u +%H:%M:%S)"; sleep 300
  done
done

echo "[ctrl] train $EXP to $STEPS steps $(date -u +%H:%M:%S)"
first=1
while true; do
  wait_for_tpu
  flags="--resume"
  if [ "$first" = 1 ] && [ ! -d "results/$EXP" ]; then
    flags="--overwrite"
  fi
  first=0
  if timeout 21600 python -m wdno_tpu.cli train-burgers --data data/1d \
      --exp "$EXP" --condition_u0 True --condition_uT True \
      --condition_f False --steps "$STEPS" $flags; then
    break
  fi
  echo "[ctrl] training interrupted $(date -u +%H:%M:%S); resuming"
  sleep 30
done

echo "[ctrl] chunked control eval (Ntest=$NTEST) $(date -u +%H:%M:%S)"
for ((s = 0; s < NTEST; s += CHUNK)); do
  if [ -e "results/$EXP/eval_raw_control_${s}.npz" ]; then
    echo "[ctrl chunk $s] already done, skipping"
    continue
  fi
  for attempt in 1 2 3; do
    wait_for_tpu
    if timeout 7200 python -m wdno_tpu.cli eval-burgers --data data/1d \
        --exp "$EXP" --task control --start "$s" --ntest "$CHUNK" \
        --batch_eval 25 --ddim_steps 50 --ddim_eta 1 \
        --wu 120000 --wf 0.00002 --J_scheduler cosine; then
      break
    fi
    echo "[ctrl chunk $s] attempt $attempt FAILED"
    sleep 30
  done
done
python -m wdno_tpu.cli aggregate-eval --results results --exp "$EXP" \
    --task control --expect_ntest "$NTEST" || true
echo "[ctrl] done $(date -u +%H:%M:%S)"
