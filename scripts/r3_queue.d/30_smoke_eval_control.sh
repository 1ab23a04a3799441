#!/usr/bin/env bash
# R4-S2: guided control eval, reference protocol (DDIM-100,
# standard_fixed_ratio=100, w_init=0.1; /root/reference/scripts/smoke/
# inf_base_control.sh:1-10), 50 scenes in crash-recoverable chunks of 10.
# Fail-fast gated (VERDICT r3 #6): a missing model skips in one line
# instead of burning retries.
. "$(dirname "$0")/../r3_lib.sh"
gate_model base_control_smoke || exit 0
for ((s = 0; s < 50; s += 10)); do
  if [ -e "results/base_control_smoke/eval_raw_control_${s}.npz" ]; then
    echo "[r4 smoke ctrl chunk $s] already done"; continue
  fi
  ok=0
  for attempt in 1 2 3; do
    wait_for_tpu
    echo "[r4 smoke ctrl chunk $s] attempt $attempt $(date -u +%H:%M:%S)"
    if timeout 5400 python -m wdno_tpu.cli eval-smoke --data data/2d \
        --exp base_control_smoke --task control --checkpoint latest \
        --start "$s" --ntest 10 --batch_eval 10 --ddim_steps 100 \
        --standard_fixed_ratio 100 --w_init 0.1; then
      ok=1; break
    fi
    echo "[r4 smoke ctrl chunk $s] attempt $attempt FAILED"; sleep 30
  done
  [ "$ok" = 1 ] || echo "[r4 smoke ctrl chunk $s] giving up"
done
ls results/base_control_smoke/eval_raw_control_*.npz >/dev/null 2>&1 || {
  echo "[r4] smoke control eval produced NO chunks — failing the stage"
  exit 1
}
python -m wdno_tpu.cli aggregate-eval --results results --exp base_control_smoke --task control
save_results base_control_smoke
commit_artifacts "campaign: smoke control eval results (reference protocol)"
