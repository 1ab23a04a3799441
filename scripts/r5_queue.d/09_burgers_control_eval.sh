#!/usr/bin/env bash
# R5-S2b: Burgers guided-control eval at the FULL reference protocol
# (/root/reference/scripts/burgers/eval_base_control.sh: Ntest=200,
# DDIM-50 eta 1, wu=120000 wf=2e-5, cosine J-scheduler, report_all).
# base_control_full reached the full 100k-step budget back in r2 (the
# exported checkpoint's step field proves it) but was only ever eval'd at
# Ntest=64 on a 20k-step milestone — this banks the real full-budget row.
. "$(dirname "$0")/../r3_lib.sh"
gate_model base_control_full || exit 0
[ -e data/1d/test.npz ] || { echo "[r5] no burgers test data"; exit 1; }
NTEST=200; CHUNK=50
re=$(round_end_epoch)
for ((s = 0; s < NTEST; s += CHUNK)); do
  [ -e "results/base_control_full/eval_raw_control_${s}.npz" ] && continue
  if [ -n "$re" ] && [ "$s" -gt 0 ] && \
     [ "$(( re - $(date +%s) ))" -lt 2700 ]; then
    echo "[r5] control eval cut at $s samples (round-end window)"; break
  fi
  wait_for_tpu
  timeout 3600 python -m wdno_tpu.cli eval-burgers --data data/1d \
      --exp base_control_full --task control --checkpoint latest \
      --start "$s" --ntest "$CHUNK" --batch_eval 25 \
      --ddim_steps 50 --ddim_eta 1 \
      --wu 120000 --wf 0.00002 --J_scheduler cosine --report_all || true
done
ls results/base_control_full/eval_raw_control_*.npz >/dev/null 2>&1 || {
  echo "[r5] burgers control eval produced NO chunks"; exit 1
}
python -m wdno_tpu.cli aggregate-eval --results results \
    --exp base_control_full --task control
save_results base_control_full
commit_artifacts "campaign: burgers control eval at full 100k budget (Ntest=200, report_all)"
