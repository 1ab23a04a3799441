#!/usr/bin/env bash
# R5-S2: the smoke SIM eval protocol (VERDICT r4 missing #2 / next #3) —
# never executed against a trained model before this round.  200 scenes in
# crash-recoverable chunks of 50 (the reference protocol scores 2000,
# /root/reference/smoke/inference_2d.py:428-445 + scripts/smoke/
# inf_base_sim.sh — subset size recorded honestly in RESULTS.md),
# DDIM-100, vs the seed-offset test_sim split.  Model: base_sim_smoke
# imported from the r4 round-end export (step 90k of the 200k reference
# budget — the round-end periodic export caught ~37k more steps than the
# stale metrics copy in artifacts/train_metrics suggests).
. "$(dirname "$0")/../r3_lib.sh"
gate_model base_sim_smoke || exit 0
SPLIT=test_sim; NTOT=200
[ -e data/2d/test_sim.npz ] || { echo "[r5] no sim split"; exit 1; }
for ((s = 0; s < NTOT; s += 50)); do
  [ -e "results/base_sim_smoke/eval_raw_sim_${s}.npz" ] && continue
  wait_for_tpu
  timeout 5400 python -m wdno_tpu.cli eval-smoke --data data/2d \
      --exp base_sim_smoke --task sim --checkpoint latest --split "$SPLIT" \
      --start "$s" --ntest 50 --batch_eval 10 --ddim_steps 100 || true
done
ls results/base_sim_smoke/eval_raw_sim_*.npz >/dev/null 2>&1 || {
  echo "[r5] smoke sim eval produced NO chunks — failing the stage"
  exit 1
}
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_smoke --task sim
save_results base_sim_smoke
commit_artifacts "campaign: smoke sim protocol eval (200 scenes, DDIM-100)"
