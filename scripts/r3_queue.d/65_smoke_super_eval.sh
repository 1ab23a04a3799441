#!/usr/bin/env bash
# R4-S6b: smoke zero-shot spatial SR chain eval (reference inf_super_sim.sh,
# inference_2d.py:155-232): base sim samples refined by the super model,
# scored on the test split.  Reduced Ntest=10 (protocol default 50) —
# whatever budget fraction runs is recorded honestly.
. "$(dirname "$0")/../r3_lib.sh"
gate_model base_sim_smoke || exit 0
gate_model super_smoke || exit 0
re=$(round_end_epoch)
if [ -n "$re" ] && [ "$(( re - $(date +%s) ))" -lt 2100 ]; then
  echo "[r4] <35 min to round end; skipping smoke SR eval"; exit 0
fi
wait_for_tpu
timeout 3600 python -m wdno_tpu.cli eval-smoke --data data/2d \
    --exp base_sim_smoke --task sim --checkpoint latest \
    --start 0 --ntest 10 --batch_eval 10 --ddim_steps 100 \
    --super_exp super_smoke --super_checkpoint latest --upsample 1
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_smoke --task sim_sr || true
save_results base_sim_smoke
save_results super_smoke
commit_artifacts "campaign: smoke SR-chain eval (reduced Ntest)"
