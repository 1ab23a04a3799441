#!/usr/bin/env bash
# S6 (time-permitting tail): smoke base-SIM model — conditioned on control,
# space-downsample (/root/reference/smoke/train_2d.py:60) — plus the sim
# eval on the fixed test split (contamination-free mse/n_l2, VERDICT r2 #2).
# Runs only if chip time remains after the Burgers super chain.
. "$(dirname "$0")/../r3_lib.sh"
re=$(round_end_epoch)
if [ -n "$re" ]; then
  DEADLINE_EPOCH=$(( re - 2400 ))
else
  DEADLINE_EPOCH=$(( $(date +%s) + 3600 ))
fi
if [ ! -e data/2d/states_bior1.3_zero_space_base_lvl0.npy ]; then
  echo "[r3] space states cache missing — run stage 27 (CPU prep) first"; exit 1
fi
if [ "$(date +%s)" -gt "$DEADLINE_EPOCH" ]; then
  echo "[r3] no time left for the smoke sim model this round"; exit 0
fi
train_to base_sim_smoke train-smoke --ema_only 100000 --data data/2d \
    --condition_control True
for ((s = 0; s < 50; s += 10)); do
  [ -e "results/base_sim_smoke/eval_raw_sim_${s}.npz" ] && continue
  wait_for_tpu
  timeout 5400 python -m wdno_tpu.cli eval-smoke --data data/2d \
      --exp base_sim_smoke --task sim --checkpoint latest \
      --start "$s" --ntest 10 --batch_eval 10 --ddim_steps 100 || true
done
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_smoke --task sim || true
save_results base_sim_smoke
commit_artifacts "campaign: smoke sim model + eval"
