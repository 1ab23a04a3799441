#!/usr/bin/env bash
# Round-2 smoke campaign (VERDICT r1 #4): scale toward the reference budget
# (train_2d.py: 20k scenes, 200k steps).  Waits for the Burgers chain
# (/tmp/campaign_r2.pid) to release the chip, then:
#   1. datagen 20k train scenes in restartable 2000-scene parts + merge
#   2. datagen 50-scene control test set (256-frame, stride 1)
#   3. wavelet prep (train + test)
#   4. base control training toward STEPS (stall-watchdogged, resumable;
#      exports a git-committable npz at every exit so cross-round resume
#      survives the results/ wipe)
#   5. guided control eval (reference protocol: DDIM-100,
#      standard_fixed_ratio 100, w_init 0.1, 50 scenes) on whatever
#      milestone exists when the round nears its end
cd "$(dirname "$0")/.."
echo $$ > /tmp/campaign_r2smoke.pid
N_TRAIN=${N_TRAIN:-20000}
PART=${PART:-2000}
STEPS=${STEPS:-200000}
PROBE_SLEEP=${PROBE_SLEEP:-120}
STALL_S=${STALL_S:-1200}
STARTUP_GRACE_S=${STARTUP_GRACE_S:-4200}
mkdir -p artifacts logs results

wait_for_tpu() {
  while true; do
    if timeout 90 python -c "import jax; d = jax.devices()[0]; print('tpu ok:', d)"; then
      return 0
    fi
    echo "[r2s] TPU unavailable $(date -u +%H:%M:%S); retrying in ${PROBE_SLEEP}s"
    sleep "$PROBE_SLEEP"
  done
}

watched_attempt() {
  exp=$1; shift
  "$@" &
  tpid=$!
  t0=$(date +%s)
  mfile="results/$exp/metrics.jsonl"
  while kill -0 "$tpid" 2>/dev/null; do
    sleep 120
    n_checks=$(( ${n_checks:-0} + 1 ))
    # periodic niced export (~every 30 min): a round boundary or crash can
    # then never lose more than 30 min of training (results/ is disposable,
    # artifacts/ is committed).  nice -19: a CPU-hungry export must never
    # starve the trainer's dispatch thread (observed axon-client deadlock).
    if [ $(( n_checks % 15 )) -eq 0 ] && [ -d "results/$exp" ]; then
      nice -n 19 python -m wdno_tpu.cli export-ckpt --exp "$exp" \
          --out "artifacts/$exp.npz" >/dev/null 2>&1 || true
    fi
    now=$(date +%s)
    if [ -e "$mfile" ] && [ "$(stat -c %Y "$mfile")" -gt "$t0" ]; then
      age=$(( now - $(stat -c %Y "$mfile") )); grace=$STALL_S
    else
      age=$(( now - t0 )); grace=$STARTUP_GRACE_S
    fi
    # two-strike rule: after an external SIGSTOP/SIGCONT (bench.py pauses
    # campaign groups) the first check sees a huge stale age even though the
    # trainer is fine — only kill if TWO consecutive checks are stale.
    if [ "$age" -gt "$grace" ] && [ "${stale_before:-0}" = 1 ]; then
      echo "[r2s] $exp STALLED (metrics idle ${age}s > ${grace}s); killing $tpid"
      kill -9 "$tpid" 2>/dev/null; wait "$tpid" 2>/dev/null
      return 1
    fi
    if [ "$age" -gt "$grace" ]; then stale_before=1; else stale_before=0; fi
  done
  wait "$tpid"
}

# stage 0: wait for the Burgers chain
while kill -0 "$(cat /tmp/campaign_r2.pid 2>/dev/null)" 2>/dev/null; do
  echo "[r2s] waiting on burgers chain $(date -u +%H:%M:%S)"; sleep 300
done

if [ ! -e data/2d/train.npz ]; then
  echo "[r2s] datagen $N_TRAIN train scenes in parts of $PART $(date -u +%H:%M:%S)"
  for ((s = 0; s < N_TRAIN; s += PART)); do
    if [ -e "data/2d/train_part${s}.npz" ]; then
      echo "[r2s] part $s exists, skipping"; continue
    fi
    ok=0
    for attempt in 1 2 3; do
      wait_for_tpu
      if timeout 3600 python -m wdno_tpu.cli datagen-smoke --n "$PART" \
          --start "$s" --part --split train --out data/2d; then
        ok=1; break
      fi
      echo "[r2s] part $s attempt $attempt FAILED"; sleep 30
    done
    [ "$ok" = 1 ] || { echo "[r2s] part $s giving up"; exit 1; }
  done
  python -m wdno_tpu.cli merge-smoke-data --data data/2d --split train --remove_parts
fi

if [ ! -e data/2d/test.npz ]; then
  echo "[r2s] datagen control test set $(date -u +%H:%M:%S)"
  wait_for_tpu
  timeout 3600 python -m wdno_tpu.cli datagen-smoke --n 50 --split test \
      --record_stride 1 --out data/2d
fi

echo "[r2s] prep $(date -u +%H:%M:%S)"
wait_for_tpu
[ -e data/2d/coef_bior1.3_zero_train.npz ] || ls data/2d | grep -q coef || true
python -m wdno_tpu.cli prep-smoke --data data/2d --split train
python -m wdno_tpu.cli prep-smoke --data data/2d --split test

echo "[r2s] train base_control_full toward $STEPS $(date -u +%H:%M:%S)"
while true; do
  wait_for_tpu
  flags="--resume"
  if [ ! -d results/base_control_smoke ]; then flags="--overwrite"; fi
  if watched_attempt base_control_smoke python -m wdno_tpu.cli train-smoke \
      --data data/2d --exp base_control_smoke --steps "$STEPS" \
      --ckpt_every 5000 $flags; then
    break
  fi
  # export whatever milestone exists so a round boundary can't lose it
  python -m wdno_tpu.cli export-ckpt --exp base_control_smoke \
      --out artifacts/base_control_smoke.npz || true
  echo "[r2s] train interrupted $(date -u +%H:%M:%S); resuming"
  sleep 30
done
python -m wdno_tpu.cli export-ckpt --exp base_control_smoke \
    --out artifacts/base_control_smoke.npz || true

echo "[r2s] guided control eval (50 scenes) $(date -u +%H:%M:%S)"
wait_for_tpu
timeout 14400 python -m wdno_tpu.cli eval-smoke --data data/2d \
    --exp base_control_smoke --task control --checkpoint latest --ntest 50 --batch_eval 10 \
    --ddim_steps 100 --standard_fixed_ratio 100 --w_init 0.1 || \
  echo "[r2s] control eval FAILED"
echo "[r2s] done $(date -u +%H:%M:%S)"
