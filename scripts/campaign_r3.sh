#!/usr/bin/env bash
# Round-3 orchestrator: ONE priority-ordered queue for the single chip
# (VERDICT r2 #7 — no cross-campaign spin-waits; the r2 smoke campaign
# starved behind the Burgers chain and ran zero chip-hours).
#
# Priority order (VERDICT r2 #2/#4):
#   S1. smoke datagen: N_TRAIN train scenes in restartable parts
#   S2. smoke datagen: 50-scene control test set (256 frames, stride 1)
#   S3. wavelet prep (train + test)
#   S4. smoke base-control training to STEPS_SMOKE (watchdogged, resumable;
#       git-committable npz exported ~every 30 min — VERDICT r2 #3)
#   S5. guided control eval, reference protocol (DDIM-100,
#       standard_fixed_ratio=100, w_init=0.1), chunked + recoverable
#   B1. Burgers data regen (40k/8k + 200-traj 16x super test) + prep
#   B2. import committed base_sim_full artifact for the SR chain
#   B3. Burgers super_sim training toward STEPS_SUPER (runs to round end;
#       every interruption exports + commits, so nothing is lost twice)
#   B4. SR-chain eval (3 doublings, ntest 200) on the newest milestone
#
# Every stage probes the TPU first; eval/train results are copied into
# artifacts/ and committed at each stage boundary.
cd "$(dirname "$0")/.."
echo $$ > /tmp/campaign_r3.pid
N_TRAIN=${N_TRAIN:-10000}
PART=${PART:-2000}
STEPS_SMOKE=${STEPS_SMOKE:-100000}
STEPS_SUPER=${STEPS_SUPER:-250000}
SR_NTEST=${SR_NTEST:-200}
PROBE_SLEEP=${PROBE_SLEEP:-120}
STALL_S=${STALL_S:-1200}
STARTUP_GRACE_S=${STARTUP_GRACE_S:-4200}
mkdir -p artifacts artifacts/eval logs results

wait_for_tpu() {
  while true; do
    if timeout 90 python -c "import jax; d = jax.devices()[0]; print('tpu ok:', d)"; then
      return 0
    fi
    echo "[r3] TPU unavailable $(date -u +%H:%M:%S); retrying in ${PROBE_SLEEP}s"
    sleep "$PROBE_SLEEP"
  done
}

# commit whatever is staged under artifacts/ — never fails the campaign
commit_artifacts() {
  git add -A artifacts 2>/dev/null
  git commit -q -m "$1" 2>/dev/null || true
}

# stash an experiment's eval/config json into artifacts/eval (results/ is
# wiped between rounds; VERDICT r2 weak #3)
save_results() {
  exp=$1
  for f in eval_results.json config.json metrics.jsonl; do
    [ -e "results/$exp/$f" ] && cp "results/$exp/$f" "artifacts/eval/${exp}_${f}"
  done
  return 0
}

# one watched training attempt: $1=exp, $2=export flags, $3...=train command
watched_attempt() {
  exp=$1; expflags=$2; shift 2
  "$@" &
  tpid=$!
  t0=$(date +%s)
  mfile="results/$exp/metrics.jsonl"
  stale_before=0; n_checks=0
  while kill -0 "$tpid" 2>/dev/null; do
    sleep 120
    n_checks=$(( n_checks + 1 ))
    # periodic niced export+commit (~every 30 min): a round boundary or
    # crash can then never lose more than 30 min of training
    if [ $(( n_checks % 15 )) -eq 0 ] && [ -d "results/$exp" ]; then
      nice -n 19 python -m wdno_tpu.cli export-ckpt --exp "$exp" $expflags \
          --out "artifacts/$exp.npz" >/dev/null 2>&1 && \
        commit_artifacts "campaign: periodic $exp export"
    fi
    now=$(date +%s)
    if [ -e "$mfile" ] && [ "$(stat -c %Y "$mfile")" -gt "$t0" ]; then
      age=$(( now - $(stat -c %Y "$mfile") )); grace=$STALL_S
    else
      age=$(( now - t0 )); grace=$STARTUP_GRACE_S
    fi
    # two-strike rule: after an external SIGSTOP/SIGCONT (bench.py pauses
    # campaign groups) the first check sees a huge stale age even though
    # the trainer is fine — only kill if TWO consecutive checks are stale
    if [ "$age" -gt "$grace" ] && [ "$stale_before" = 1 ]; then
      echo "[r3] $exp STALLED (metrics idle ${age}s > ${grace}s); killing $tpid"
      kill -9 "$tpid" 2>/dev/null; wait "$tpid" 2>/dev/null
      return 1
    fi
    if [ "$age" -gt "$grace" ]; then stale_before=1; else stale_before=0; fi
  done
  wait "$tpid"
}

# resumable training loop: $1=exp, $2=train subcmd, $3=export flags,
# $4=steps, $5...=extra train flags
train_to() {
  exp=$1; subcmd=$2; expflags=$3; steps=$4; shift 4
  while true; do
    wait_for_tpu
    flags="--resume"
    if [ ! -d "results/$exp" ]; then flags="--overwrite"; fi
    if watched_attempt "$exp" "$expflags" python -m wdno_tpu.cli "$subcmd" \
        --exp "$exp" --steps "$steps" --ckpt_every 5000 $flags "$@"; then
      break
    fi
    python -m wdno_tpu.cli export-ckpt --exp "$exp" $expflags \
        --out "artifacts/$exp.npz" 2>/dev/null && \
      commit_artifacts "campaign: $exp export after interruption"
    echo "[r3] train $exp interrupted $(date -u +%H:%M:%S); resuming"
    sleep 30
  done
  python -m wdno_tpu.cli export-ckpt --exp "$exp" $expflags \
      --out "artifacts/$exp.npz" || true
  save_results "$exp"
  commit_artifacts "campaign: $exp trained to $steps + exported"
}

# ---------- S1: smoke train datagen ----------
if [ ! -e data/2d/train.npz ]; then
  echo "[r3] S1 datagen $N_TRAIN train scenes in parts of $PART $(date -u +%H:%M:%S)"
  for ((s = 0; s < N_TRAIN; s += PART)); do
    if [ -e "data/2d/train_part${s}.npz" ]; then
      echo "[r3] part $s exists, skipping"; continue
    fi
    ok=0
    for attempt in 1 2 3 4; do
      wait_for_tpu
      if timeout 5400 python -m wdno_tpu.cli datagen-smoke --n "$PART" \
          --start "$s" --part --split train --out data/2d; then
        ok=1; break
      fi
      echo "[r3] part $s attempt $attempt FAILED"; sleep 30
    done
    [ "$ok" = 1 ] || { echo "[r3] S1 part $s giving up"; exit 1; }
  done
  python -m wdno_tpu.cli merge-smoke-data --data data/2d --split train --remove_parts
fi

# ---------- S2: smoke control test set ----------
if [ ! -e data/2d/test.npz ]; then
  echo "[r3] S2 datagen control test set $(date -u +%H:%M:%S)"
  wait_for_tpu
  timeout 5400 python -m wdno_tpu.cli datagen-smoke --n 50 --split test \
      --record_stride 1 --out data/2d
fi

# ---------- S3: wavelet prep ----------
echo "[r3] S3 prep $(date -u +%H:%M:%S)"
wait_for_tpu
python -m wdno_tpu.cli prep-smoke --data data/2d --split train
python -m wdno_tpu.cli prep-smoke --data data/2d --split test

# ---------- S4: smoke base-control training ----------
echo "[r3] S4 train base_control_smoke toward $STEPS_SMOKE $(date -u +%H:%M:%S)"
train_to base_control_smoke train-smoke --ema_only "$STEPS_SMOKE" --data data/2d

# ---------- S5: guided control eval (chunks of 10, recoverable) ----------
echo "[r3] S5 guided control eval (50 scenes) $(date -u +%H:%M:%S)"
for ((s = 0; s < 50; s += 10)); do
  if [ -e "results/base_control_smoke/eval_raw_control_${s}.npz" ]; then
    echo "[r3 smoke ctrl chunk $s] already done"; continue
  fi
  ok=0
  for attempt in 1 2 3; do
    wait_for_tpu
    echo "[r3 smoke ctrl chunk $s] attempt $attempt $(date -u +%H:%M:%S)"
    if timeout 5400 python -m wdno_tpu.cli eval-smoke --data data/2d \
        --exp base_control_smoke --task control --checkpoint latest \
        --start "$s" --ntest 10 --batch_eval 10 --ddim_steps 100 \
        --standard_fixed_ratio 100 --w_init 0.1; then
      ok=1; break
    fi
    echo "[r3 smoke ctrl chunk $s] attempt $attempt FAILED"; sleep 30
  done
  [ "$ok" = 1 ] || echo "[r3 smoke ctrl chunk $s] giving up"
done
python -m wdno_tpu.cli aggregate-eval --results results --exp base_control_smoke --task control || true
save_results base_control_smoke
commit_artifacts "campaign: smoke control eval results"

# ---------- B1: Burgers data regen + prep ----------
if [ ! -e data/1d/train.npz ]; then
  echo "[r3] B1 burgers datagen $(date -u +%H:%M:%S)"
  wait_for_tpu
  python -m wdno_tpu.cli datagen-burgers --out data/1d
fi
if [ ! -e data/1d_super/test.npz ]; then
  wait_for_tpu
  python -m wdno_tpu.cli datagen-burgers --n_train 0 --n_test "$SR_NTEST" \
      --nt 640 --nx 960 --out data/1d_super
fi
ls data/1d | grep -q coef || {
  wait_for_tpu
  python -m wdno_tpu.cli prep-burgers --data data/1d
}

# ---------- B2: import the committed base_sim model ----------
[ -d results/base_sim_full ] || \
  python -m wdno_tpu.cli import-ckpt --exp base_sim_full \
      --npz artifacts/base_sim_full.npz --milestone final

# ---------- B3: Burgers super training (runs until round end) ----------
echo "[r3] B3 train super_sim_full toward $STEPS_SUPER $(date -u +%H:%M:%S)"
train_to super_sim_full train-burgers "" "$STEPS_SUPER" --data data/1d \
    --super_model True --dim 64

# ---------- B4: SR-chain eval ----------
echo "[r3] B4 SR-chain eval $(date -u +%H:%M:%S)"
wait_for_tpu
timeout 10800 python -m wdno_tpu.cli eval-burgers --data data/1d \
    --exp base_sim_full --checkpoint latest --task sim --ntest "$SR_NTEST" \
    --batch_eval 50 --ddim_steps 50 --ddim_eta 1 \
    --super_exp super_sim_full --super_checkpoint latest --upsample 3 \
    --super_data data/1d_super/test.npz || echo "[r3] SR-chain eval FAILED"
save_results base_sim_full
save_results super_sim_full
commit_artifacts "campaign: burgers SR-chain eval results"
echo "[r3] queue done $(date -u +%H:%M:%S)"
