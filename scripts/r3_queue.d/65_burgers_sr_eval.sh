#!/usr/bin/env bash
# B4: zero-shot SR-chain eval — 3 doublings to 641x960 with the warm-start
# super model (/root/reference/scripts/burgers/eval_super_sim.sh:1-21,
# eval_ddpm_burgers.py:307-338).  Ntest=50 (reference default protocol size,
# eval_ddpm_burgers.py:38) to fit the round tail; the full-budget 250k-step
# super row stays open until the model finishes training in a later round.
. "$(dirname "$0")/../r3_lib.sh"
SR_NTEST=${SR_NTEST:-50}
re=$(round_end_epoch)
if [ -n "$re" ] && [ "$(( re - $(date +%s) ))" -lt 2100 ]; then
  echo "[r3] <35 min to round end; skipping SR-chain eval"; exit 0
fi
[ -d results/super_sim_full ] || { echo "[r3] no super model"; exit 0; }
wait_for_tpu
timeout 3000 python -m wdno_tpu.cli eval-burgers --data data/1d \
    --exp base_sim_full --checkpoint final --task sim --ntest "$SR_NTEST" \
    --batch_eval 50 --ddim_steps 50 --ddim_eta 1 \
    --super_exp super_sim_full --super_checkpoint latest --upsample 3 \
    --super_data data/1d_super/test.npz
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_full --task sim_sr || true
save_results base_sim_full
save_results super_sim_full
commit_artifacts "campaign: burgers SR-chain eval (warm-start super)"
