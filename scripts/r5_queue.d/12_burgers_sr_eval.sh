#!/usr/bin/env bash
# R5-S2c: Burgers zero-shot SR chain at the protocol Ntest=200 (reference
# eval_super_sim.sh; the standing RESULTS row is Ntest=48).  Base model at
# full budget; super_sim_full at 40k of 250k steps — budget fraction is
# recorded honestly with the row.
. "$(dirname "$0")/../r3_lib.sh"
gate_model base_sim_full || exit 0
gate_model super_sim_full || exit 0
[ -e data/1d_super/test.npz ] || { echo "[r5] no hi-res test"; exit 1; }
NTEST=200; CHUNK=50
re=$(round_end_epoch)
for ((s = 0; s < NTEST; s += CHUNK)); do
  [ -e "results/base_sim_full/eval_raw_sim_sr_${s}.npz" ] && continue
  if [ -n "$re" ] && [ "$s" -gt 0 ] && \
     [ "$(( re - $(date +%s) ))" -lt 3000 ]; then
    echo "[r5] SR eval cut at $s samples (round-end window)"; break
  fi
  wait_for_tpu
  timeout 4500 python -m wdno_tpu.cli eval-burgers --data data/1d \
      --exp base_sim_full --task sim --checkpoint latest \
      --start "$s" --ntest "$CHUNK" --batch_eval 16 \
      --ddim_steps 50 --ddim_eta 1 \
      --super_exp super_sim_full --super_checkpoint latest \
      --super_data data/1d_super/test.npz --upsample 3 || true
done
ls results/base_sim_full/eval_raw_sim_sr_*.npz >/dev/null 2>&1 || {
  echo "[r5] burgers SR eval produced NO chunks"; exit 1
}
python -m wdno_tpu.cli aggregate-eval --results results \
    --exp base_sim_full --task sim_sr
save_results base_sim_full
cp results/base_sim_full/eval_results.json \
   artifacts/eval/base_sim_full_eval_results.json 2>/dev/null || true
commit_artifacts "campaign: burgers SR-chain eval (Ntest=200, super@40k)"
