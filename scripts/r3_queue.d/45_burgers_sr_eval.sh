#!/usr/bin/env bash
# B4: zero-shot SR-chain eval — 3 doublings to 641x960 with the warm-start
# super model (/root/reference/scripts/burgers/eval_super_sim.sh:1-21,
# eval_ddpm_burgers.py:307-338).  Runs right after the smoke control eval
# with a reduced Ntest=20 (reference protocol default is 50,
# eval_ddpm_burgers.py:38) and a hard cap, so the SR capability row lands
# this round without starving the smoke sim model's training window.
. "$(dirname "$0")/../r3_lib.sh"
SR_NTEST=${SR_NTEST:-20}
re=$(round_end_epoch)
if [ -n "$re" ] && [ "$(( re - $(date +%s) ))" -lt 2100 ]; then
  echo "[r3] <35 min to round end; skipping SR-chain eval"; exit 0
fi
[ -d results/super_sim_full ] || { echo "[r3] no super model"; exit 0; }
wait_for_tpu
timeout 1500 python -m wdno_tpu.cli eval-burgers --data data/1d \
    --exp base_sim_full --checkpoint final --task sim --ntest "$SR_NTEST" \
    --batch_eval 20 --ddim_steps 50 --ddim_eta 1 \
    --super_exp super_sim_full --super_checkpoint latest --upsample 3 \
    --super_data data/1d_super/test.npz
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_full --task sim_sr || true
save_results base_sim_full
save_results super_sim_full
commit_artifacts "campaign: burgers SR-chain eval (warm-start super)"
