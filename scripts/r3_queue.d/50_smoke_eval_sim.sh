#!/usr/bin/env bash
# R4-S5: smoke sim eval on the dedicated seed-offset sim split
# (contamination-free mse/n_l2).  200 scenes in crash-recoverable chunks
# of 50 (the reference protocol scores 2000, inf_base_sim.sh — the subset
# size is recorded honestly in RESULTS.md); falls back to the 50-scene
# control split if the sim split is missing.  Fail-fast gated on the model.
. "$(dirname "$0")/../r3_lib.sh"
gate_model base_sim_smoke || exit 0
SPLIT=test_sim; NTOT=200
[ -e data/2d/test_sim.npz ] || { SPLIT=test; NTOT=50; }
for ((s = 0; s < NTOT; s += 50)); do
  [ -e "results/base_sim_smoke/eval_raw_sim_${s}.npz" ] && continue
  wait_for_tpu
  timeout 5400 python -m wdno_tpu.cli eval-smoke --data data/2d \
      --exp base_sim_smoke --task sim --checkpoint latest --split "$SPLIT" \
      --start "$s" --ntest 50 --batch_eval 10 --ddim_steps 100 || true
done
ls results/base_sim_smoke/eval_raw_sim_*.npz >/dev/null 2>&1 || {
  echo "[r4] smoke sim eval produced NO chunks — failing the stage"
  exit 1
}
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_smoke --task sim
save_results base_sim_smoke
commit_artifacts "campaign: smoke sim model + eval"
