#!/usr/bin/env bash
# Stage 3b: smoke workload campaign, queued behind the Burgers stage-2b
# runner.  Every chip-bound step is wrapped in a TPU-availability probe and
# retry, and the long train-set generation is chunked into index-keyed part
# files (datagen-smoke --part + merge-smoke-data) so a tunnel outage costs
# one chunk, not the whole set.
cd "$(dirname "$0")/.."
N_TRAIN=${N_TRAIN:-2048}
GEN_CHUNK=${GEN_CHUNK:-256}
STEPS=${STEPS:-40000}
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

retry() { # retry <timeout_s> <cmd...>
  local t=$1
  shift
  for attempt in 1 2 3; do
    wait_for_tpu
    if timeout "$t" "$@"; then
      return 0
    fi
    echo "[retry] attempt $attempt failed: $* $(date -u +%H:%M:%S)"
    sleep 30
  done
  return 1
}

PREV_PID=$(cat /tmp/stage2b.pid 2>/dev/null || true)
while [ -n "$PREV_PID" ] && kill -0 "$PREV_PID" 2>/dev/null; do
  echo "[stage3b] waiting for stage2b (pid $PREV_PID) $(date -u +%H:%M:%S)"
  sleep 300
done

mkdir -p data/2d
if [ ! -e data/2d/train.npz ]; then
  echo "[stage3b] datagen train ($N_TRAIN scenes, chunks of $GEN_CHUNK) $(date -u +%H:%M:%S)"
  for ((s = 0; s < N_TRAIN; s += GEN_CHUNK)); do
    [ -e "data/2d/train_part${s}.npz" ] && continue
    retry 3000 python -m wdno_tpu.cli datagen-smoke --n "$GEN_CHUNK" \
        --start "$s" --part --split train --out data/2d
  done
  python -m wdno_tpu.cli merge-smoke-data --data data/2d --split train --remove_parts
fi
if [ ! -e data/2d/test.npz ]; then
  echo "[stage3b] datagen control test (50 scenes, 256-frame) $(date -u +%H:%M:%S)"
  retry 3000 python -m wdno_tpu.cli datagen-smoke --n 50 --split test \
      --record_stride 1 --out data/2d
fi
if [ ! -e data/2d/coef_bior1.3_zero_time_train.npz ]; then
  echo "[stage3b] prep $(date -u +%H:%M:%S)"
  retry 6000 python -m wdno_tpu.cli prep-smoke --data data/2d --split train
  retry 3000 python -m wdno_tpu.cli prep-smoke --data data/2d --split test
fi

echo "[stage3b] train base_control_full ($STEPS steps) $(date -u +%H:%M:%S)"
first=1
while true; do
  wait_for_tpu
  flags="--resume"
  if [ "$first" = 1 ] && [ ! -d results/base_control_full ]; then
    flags="--overwrite"
  fi
  first=0
  if timeout 21600 python -m wdno_tpu.cli train-smoke --data data/2d \
      --exp base_control_full --steps "$STEPS" $flags; then
    break
  fi
  echo "[stage3b] training interrupted $(date -u +%H:%M:%S); resuming"
  sleep 30
done

echo "[stage3b] eval control (DDIM-100, guided, Ntest=50) $(date -u +%H:%M:%S)"
retry 6000 python -m wdno_tpu.cli eval-smoke --data data/2d \
    --exp base_control_full --task control --ntest 50 --batch_eval 10 \
    --ddim_steps 100 --standard_fixed_ratio 100 --w_init 0.1
echo "[stage3b] done $(date -u +%H:%M:%S)"
