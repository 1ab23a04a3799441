#!/usr/bin/env bash
# R5-S6: smoke zero-shot spatial SR chain eval (reference inf_super_sim.sh,
# inference_2d.py:155-232): base sim samples refined by the super model to
# 128^2, scored against a 128^2-recorded test split (the eval's base path
# subsamples it to 64^2 for the base model — the designed protocol).
# Reduced Ntest=10 (protocol default 50) — recorded honestly.
. "$(dirname "$0")/../r3_lib.sh"
gate_model base_sim_smoke || exit 0
gate_model super_smoke || exit 0
re=$(round_end_epoch)
if [ -n "$re" ] && [ "$(( re - $(date +%s) ))" -lt 1500 ]; then
  echo "[r5] <25 min to round end; skipping smoke SR eval"; exit 0
fi
if [ ! -e data/2d/test_sr.npz ]; then
  wait_for_tpu
  timeout 2700 python -m wdno_tpu.cli datagen-smoke --out data/2d \
      --split test_sr --n 10 --start 250 --record_stride 8 --record_res 128 \
      || exit 1
fi
wait_for_tpu
timeout 3600 python -m wdno_tpu.cli eval-smoke --data data/2d \
    --exp base_sim_smoke --task sim --checkpoint latest --split test_sr \
    --start 0 --ntest 10 --batch_eval 10 --ddim_steps 100 \
    --super_exp super_smoke --super_checkpoint latest --upsample 1
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_smoke --task sim_sr || true
save_results base_sim_smoke
save_results super_smoke
commit_artifacts "campaign: smoke SR-chain eval (reduced Ntest)"
