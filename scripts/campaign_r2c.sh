#!/usr/bin/env bash
# Round-2 takeover coordinator: waits for the running r2 chain to finish the
# 100k-step base_sim_full training (log line "[r2] export base_sim_full"),
# then kills the chain and runs the remaining full-budget Burgers stages in a
# better order for the time left in the round:
#   1. export base_sim_full
#   2. 8000-sample sim eval in ONE process (--chunk 1000: one ~20-min data
#      load instead of 8 per-chunk subprocess loads)
#   3. base_control_full training to 100k + export + 200-sample guided eval
#   4. super_sim_full training bounded at SUPER_STAGE1 steps + export +
#      SR-chain eval at that milestone (so the round records an SR number)
#   5. super training continues toward 250k until the round ends (periodic
#      exports make the progress durable; next round resumes)
# Rationale: the original chain ran super's full 250k (~3h) before control,
# which would have pushed BOTH control rows and the SR eval past round end.
cd "$(dirname "$0")/.."
echo $$ > /tmp/campaign_r2c.pid
STEPS_CTRL=${STEPS_CTRL:-100000}
SUPER_STAGE1=${SUPER_STAGE1:-80000}
STEPS_SUPER=${STEPS_SUPER:-250000}
PROBE_SLEEP=${PROBE_SLEEP:-120}
STALL_S=${STALL_S:-1200}
STARTUP_GRACE_S=${STARTUP_GRACE_S:-4200}
mkdir -p artifacts logs results

wait_for_tpu() {
  while true; do
    if timeout 90 python -c "import jax; d = jax.devices()[0]; print('tpu ok:', d)"; then
      return 0
    fi
    echo "[r2c] TPU unavailable $(date -u +%H:%M:%S); retrying in ${PROBE_SLEEP}s"
    sleep "$PROBE_SLEEP"
  done
}

# one watched training attempt: $1=exp, $2...=full train command; kills the
# run if results/$exp/metrics.jsonl stops advancing (axon tunnel deadlock)
watched_attempt() {
  exp=$1; shift
  "$@" &
  tpid=$!
  t0=$(date +%s)
  mfile="results/$exp/metrics.jsonl"
  stale_before=0
  while kill -0 "$tpid" 2>/dev/null; do
    sleep 120
    n_checks=$(( ${n_checks:-0} + 1 ))
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
    # two-strike rule: a bench SIGSTOP/SIGCONT pause inflates one check
    if [ "$age" -gt "$grace" ] && [ "$stale_before" = 1 ]; then
      echo "[r2c] $exp STALLED (metrics idle ${age}s > ${grace}s); killing $tpid"
      kill -9 "$tpid" 2>/dev/null; wait "$tpid" 2>/dev/null
      return 1
    fi
    if [ "$age" -gt "$grace" ]; then stale_before=1; else stale_before=0; fi
  done
  wait "$tpid"
}

train_to() {
  exp=$1; steps=$2; shift 2
  while true; do
    wait_for_tpu
    flags="--resume"
    if [ ! -d "results/$exp" ]; then flags="--overwrite"; fi
    if watched_attempt "$exp" python -m wdno_tpu.cli train-burgers --data data/1d \
        --exp "$exp" --steps "$steps" --ckpt_every 5000 $flags "$@"; then
      return 0
    fi
    python -m wdno_tpu.cli export-ckpt --exp "$exp" \
        --out "artifacts/$exp.npz" >/dev/null 2>&1 || true
    echo "[r2c] train $exp interrupted $(date -u +%H:%M:%S); resuming"
    sleep 30
  done
}

# retried chunked eval: $1 = log tag, rest = command (idempotent via --chunk)
run_eval() {
  tag=$1; shift
  for attempt in 1 2 3 4; do
    wait_for_tpu
    echo "[r2c $tag] attempt $attempt $(date -u +%H:%M:%S)"
    if timeout 14400 "$@"; then return 0; fi
    echo "[r2c $tag] attempt $attempt FAILED"; sleep 60
  done
  echo "[r2c $tag] giving up"
  return 1
}

# ---- stage 0: wait for base_sim_full to hit 100k under the old chain ----
while :; do
  chain_pid=$(cat /tmp/campaign_r2.pid 2>/dev/null)
  if ! kill -0 "$chain_pid" 2>/dev/null; then
    echo "[r2c] old chain gone $(date -u +%H:%M:%S)"; break
  fi
  if grep -q "\[r2\] export base_sim_full" logs/campaign_r2_chain.log 2>/dev/null; then
    echo "[r2c] base training done; taking over from chain pgid $chain_pid"
    pgid=$(ps -o pgid= -p "$chain_pid" | tr -d ' ')
    [ -n "$pgid" ] && [ "$pgid" != "$(ps -o pgid= -p $$ | tr -d ' ')" ] && \
      kill -9 -"$pgid" 2>/dev/null
    sleep 5
    break
  fi
  sleep 60
done

echo "[r2c] export base_sim_full $(date -u +%H:%M:%S)"
wait_for_tpu
python -m wdno_tpu.cli export-ckpt --exp base_sim_full \
    --out artifacts/base_sim_full.npz || true

echo "[r2c] sim eval 8000 (single process, chunk 1000) $(date -u +%H:%M:%S)"
run_eval sim-eval python -m wdno_tpu.cli eval-burgers --data data/1d \
    --exp base_sim_full --task sim --ntest 8000 --chunk 1000 \
    --batch_eval 200 --ddim_steps 50 --ddim_eta 1
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_full \
    --task sim --expect_ntest 8000 || true

echo "[r2c] train base_control_full to $STEPS_CTRL $(date -u +%H:%M:%S)"
train_to base_control_full "$STEPS_CTRL" --condition_uT True --condition_f False
python -m wdno_tpu.cli export-ckpt --exp base_control_full \
    --out artifacts/base_control_full.npz || true

echo "[r2c] guided control eval 200 (chunk 50) $(date -u +%H:%M:%S)"
run_eval ctrl-eval python -m wdno_tpu.cli eval-burgers --data data/1d \
    --exp base_control_full --task control --ntest 200 --chunk 50 \
    --batch_eval 50 --ddim_steps 50 --ddim_eta 1 --report_all
python -m wdno_tpu.cli aggregate-eval --results results \
    --exp base_control_full --task control || true

echo "[r2c] train super_sim_full stage 1 to $SUPER_STAGE1 $(date -u +%H:%M:%S)"
train_to super_sim_full "$SUPER_STAGE1" --super_model True --dim 64
python -m wdno_tpu.cli export-ckpt --exp super_sim_full \
    --out artifacts/super_sim_full.npz || true

echo "[r2c] SR-chain eval (3 doublings) at the stage-1 milestone $(date -u +%H:%M:%S)"
run_eval sr-eval python -m wdno_tpu.cli eval-burgers --data data/1d \
    --exp base_sim_full --task sim --ntest 200 --batch_eval 50 --chunk 50 \
    --ddim_steps 50 --ddim_eta 1 --super_exp super_sim_full --upsample 3 \
    --super_data data/1d_super/test.npz
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_full \
    --task sim_sr || true

echo "[r2c] super training continues toward $STEPS_SUPER $(date -u +%H:%M:%S)"
train_to super_sim_full "$STEPS_SUPER" --super_model True --dim 64
python -m wdno_tpu.cli export-ckpt --exp super_sim_full \
    --out artifacts/super_sim_full.npz || true
echo "[r2c] chain done $(date -u +%H:%M:%S)"
