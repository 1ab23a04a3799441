#!/usr/bin/env bash
# B4: zero-shot SR-chain eval — 3 doublings to 641x960, Ntest=SR_NTEST
# (/root/reference/scripts/burgers/eval_super_sim.sh:1-21,
#  /root/reference/burgers/eval_ddpm_burgers.py:307-338).
. "$(dirname "$0")/../r3_lib.sh"
SR_NTEST=${SR_NTEST:-200}
wait_for_tpu
timeout 10800 python -m wdno_tpu.cli eval-burgers --data data/1d \
    --exp base_sim_full --checkpoint latest --task sim --ntest "$SR_NTEST" \
    --batch_eval 50 --ddim_steps 50 --ddim_eta 1 \
    --super_exp super_sim_full --super_checkpoint latest --upsample 3 \
    --super_data data/1d_super/test.npz
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_full --task sim_sr || true
save_results base_sim_full
save_results super_sim_full
commit_artifacts "campaign: burgers SR-chain eval results"
