#!/usr/bin/env bash
# Round-2 orchestrator: the full-budget Burgers parity campaign, exporting
# every trained model to a git-committable npz as soon as it exists
# (results/ and data/ are wiped between rounds; artifacts/ is committed).
# Stages:
#   0. base_sim_full training to 100k (resumable, stall-watchdogged)
#   1. export base_sim_full            -> artifacts/base_sim_full.npz
#   2. chunked 8000-sample sim eval    (scripts/eval_base_sim_chunked.sh)
#   3. super_sim_full training (resumable, STEPS_SUPER) + export
#   4. zero-shot SR-chain eval (3 doublings)
#   5. base_control_full training (resumable, STEPS_CTRL) + export
#   6. chunked guided control eval (reference protocol: wu=120000 wf=2e-5)
#
# Every chip-bound step probes the TPU first.  Training runs under a stall
# watchdog: the axon tunnel client can deadlock mid-run (all threads parked
# on futexes, device answering fresh probes — observed r2 after ~2600 steps),
# so if metrics.jsonl stops advancing the run is killed and resumed from the
# last milestone.
cd "$(dirname "$0")/.."
# record OUR pid (not the setsid wrapper's, which $! captures): kill/pause
# tooling (bench.py _PauseCampaign) resolves the process group from this
echo $$ > /tmp/campaign_r2.pid
STEPS_BASE=${STEPS_BASE:-100000}
STEPS_SUPER=${STEPS_SUPER:-250000}
STEPS_CTRL=${STEPS_CTRL:-100000}
CTRL_NTEST=${CTRL_NTEST:-200}
CTRL_CHUNK=${CTRL_CHUNK:-50}
PROBE_SLEEP=${PROBE_SLEEP:-120}
STALL_S=${STALL_S:-1200}      # no metrics-file update for this long = hung
STARTUP_GRACE_S=${STARTUP_GRACE_S:-4200}  # device-resident upload ~36min
mkdir -p artifacts logs results

wait_for_tpu() {
  while true; do
    if timeout 90 python -c "import jax; d = jax.devices()[0]; print('tpu ok:', d)"; then
      return 0
    fi
    echo "[r2] TPU unavailable $(date -u +%H:%M:%S); retrying in ${PROBE_SLEEP}s"
    sleep "$PROBE_SLEEP"
  done
}

# one watched training attempt: $1=exp, $2...=full train command
# returns 0 if the trainer exited cleanly, 1 if killed for stalling/crash
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
    # a metrics file older than THIS attempt is stale (left by a previous
    # run) — judge startup by process age, not by the stale file's mtime
    if [ -e "$mfile" ] && [ "$(stat -c %Y "$mfile")" -gt "$t0" ]; then
      age=$(( now - $(stat -c %Y "$mfile") ))
      grace=$STALL_S
    else
      age=$(( now - t0 ))
      grace=$STARTUP_GRACE_S
    fi
    # two-strike rule: after an external SIGSTOP/SIGCONT (bench.py pauses
    # campaign groups) the first check sees a huge stale age even though the
    # trainer is fine — only kill if TWO consecutive checks are stale.
    if [ "$age" -gt "$grace" ] && [ "${stale_before:-0}" = 1 ]; then
      echo "[r2] $exp STALLED (metrics idle ${age}s > ${grace}s); killing $tpid"
      kill -9 "$tpid" 2>/dev/null
      wait "$tpid" 2>/dev/null
      return 1
    fi
    if [ "$age" -gt "$grace" ]; then stale_before=1; else stale_before=0; fi
  done
  wait "$tpid"
}

# resumable training loop: $1=exp, $2=steps, $3...=extra train flags
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
    echo "[r2] train $exp interrupted $(date -u +%H:%M:%S); resuming"
    sleep 30
  done
}

echo "[r2] train base_sim_full to $STEPS_BASE $(date -u +%H:%M:%S)"
train_to base_sim_full "$STEPS_BASE"

echo "[r2] export base_sim_full $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli export-ckpt --exp base_sim_full \
    --out artifacts/base_sim_full.npz || true

echo "[r2] chunked 8000-sample sim eval $(date -u +%H:%M:%S)"
bash scripts/eval_base_sim_chunked.sh

echo "[r2] train super_sim_full to $STEPS_SUPER $(date -u +%H:%M:%S)"
train_to super_sim_full "$STEPS_SUPER" --super_model True --dim 64
python -m wdno_tpu.cli export-ckpt --exp super_sim_full \
    --out artifacts/super_sim_full.npz || true

echo "[r2] SR-chain eval (3 doublings) $(date -u +%H:%M:%S)"
wait_for_tpu
timeout 7200 python -m wdno_tpu.cli eval-burgers --data data/1d \
    --exp base_sim_full --task sim --ntest 200 --batch_eval 50 \
    --ddim_steps 50 --ddim_eta 1 --super_exp super_sim_full --upsample 3 \
    --super_data data/1d_super || \
  echo "[r2] SR-chain eval FAILED (retry by hand)"

echo "[r2] train base_control_full to $STEPS_CTRL $(date -u +%H:%M:%S)"
train_to base_control_full "$STEPS_CTRL" --condition_uT True --condition_f False
python -m wdno_tpu.cli export-ckpt --exp base_control_full \
    --out artifacts/base_control_full.npz || true

echo "[r2] chunked guided control eval $(date -u +%H:%M:%S)"
for ((s = 0; s < CTRL_NTEST; s += CTRL_CHUNK)); do
  if [ -e "results/base_control_full/eval_raw_control_${s}.npz" ]; then
    echo "[r2 ctrl chunk $s] already done"; continue
  fi
  ok=0
  for attempt in 1 2 3; do
    wait_for_tpu
    echo "[r2 ctrl chunk $s] attempt $attempt $(date -u +%H:%M:%S)"
    if timeout 3600 python -m wdno_tpu.cli eval-burgers --data data/1d \
        --exp base_control_full --task control --start "$s" \
        --ntest "$CTRL_CHUNK" --batch_eval 50 --ddim_steps 50 --ddim_eta 1; then
      ok=1; break
    fi
    echo "[r2 ctrl chunk $s] attempt $attempt FAILED"; sleep 30
  done
  [ "$ok" = 1 ] || echo "[r2 ctrl chunk $s] giving up"
done
python -m wdno_tpu.cli aggregate-eval --results results --exp base_control_full --task control || true
echo "[r2] chain done $(date -u +%H:%M:%S)"
